"""InceptionV3 port validation: round-trip a randomly-initialized
tf.keras InceptionV3 through the weight exporter and require matching
activations — proving the architecture + creation-order weight mapping,
so a real imagenet .h5 will produce standard FID."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from sagan_tpu.train.inception import (InceptionV3Features, NUM_UNITS,
                                       export_weights_npz,
                                       inception_v3_features,
                                       load_weights_npz)


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("w") / "inception_rand.npz")
    model = tf.keras.applications.InceptionV3(
        include_top=False, weights=None, input_shape=(299, 299, 3))
    export_weights_npz(path, source=model)
    return path, model


def test_unit_count(exported):
    path, _ = exported
    assert len(load_weights_npz(path)) == NUM_UNITS


def test_activations_match_keras(exported):
    path, model = exported
    params = load_weights_npz(path)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)

    ours = np.asarray(inception_v3_features(params, x))

    theirs = model(x, training=False).numpy()          # [B, 8, 8, 2048]
    theirs = theirs.mean(axis=(1, 2))                  # global avg pool

    assert ours.shape == theirs.shape == (2, 2048)
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=2e-3)


def test_extractor_facade_resizes(exported):
    path, _ = exported
    ex = InceptionV3Features(path)
    x = np.random.default_rng(1).uniform(-1, 1, (2, 64, 64, 3)).astype(
        np.float32)
    feats = ex(x)
    assert feats.shape == (2, 2048)
    assert np.all(np.isfinite(feats))


def test_fid_get_extractor_picks_inception(exported, tmp_path):
    path, _ = exported
    from sagan_tpu.train.fid import get_extractor

    ex = get_extractor({"img_size": 64, "inception_weights": path})
    assert isinstance(ex, InceptionV3Features)

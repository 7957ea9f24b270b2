"""Inception Score tests: analytic values of the split-KL formula,
proxy-classifier determinism, and golden parity of the classifier top
against tf.keras InceptionV3(include_top=True) with random weights."""

import numpy as np
import pytest

from sagan_tpu.train.iscore import (RandomFeatureClassifier, get_classifier,
                                    inception_score,
                                    inception_score_from_probs)


def test_is_uniform_probs_is_one():
    probs = np.full((100, 10), 0.1)
    mean, std = inception_score_from_probs(probs)
    assert mean == pytest.approx(1.0, abs=1e-9)
    assert std == pytest.approx(0.0, abs=1e-9)


def test_is_confident_uniform_classes_is_num_classes():
    # perfectly confident, classes perfectly balanced within every split:
    # KL(p(y|x) || uniform) = log C  ->  IS = C
    c, reps = 8, 25
    probs = np.tile(np.eye(c), (reps, 1))
    mean, _ = inception_score_from_probs(probs, splits=5)
    assert mean == pytest.approx(c, rel=1e-6)


def test_is_confident_single_class_is_one():
    probs = np.zeros((100, 10))
    probs[:, 3] = 1.0
    mean, _ = inception_score_from_probs(probs)
    assert mean == pytest.approx(1.0, abs=1e-9)


def test_proxy_classifier_deterministic_probabilities():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)
    c1 = RandomFeatureClassifier(32, num_classes=16)
    c2 = RandomFeatureClassifier(32, num_classes=16)
    p1, p2 = c1(x), c2(x)
    np.testing.assert_array_equal(p1, p2)
    assert p1.shape == (4, 16)
    np.testing.assert_allclose(p1.sum(axis=1), 1.0, atol=1e-5)


def test_inception_score_end_to_end_proxy():
    rng = np.random.default_rng(1)

    def sample_batch(key, n):
        return rng.uniform(-1, 1, (n, 32, 32, 3)).astype(np.float32)

    mean, std = inception_score(sample_batch, {"img_size": 32},
                                num_images=64, batch_size=32, splits=4)
    assert np.isfinite(mean) and mean >= 1.0
    assert np.isfinite(std)


@pytest.mark.parametrize("has_tf", [True])
def test_classifier_top_matches_keras(tmp_path, has_tf):
    tf = pytest.importorskip("tensorflow")
    from sagan_tpu.train.inception import (InceptionV3Classifier,
                                           export_weights_npz)

    model = tf.keras.applications.InceptionV3(include_top=True, weights=None)
    path = str(tmp_path / "inception_top.npz")
    export_weights_npz(path, source=model)

    clf = InceptionV3Classifier(path)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)
    ours = clf(x)
    theirs = model(x, training=False).numpy()
    assert ours.shape == theirs.shape == (2, 1000)
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=2e-3)

    # get_classifier picks the inception top when weights provide one
    picked = get_classifier({"img_size": 64, "inception_weights": path})
    assert isinstance(picked, InceptionV3Classifier)


def test_classifier_backend_truth_on_fallback(capsys):
    """A configured-but-missing inception_weights must fall back LOUDLY
    and the returned object must say what it actually is (ADVICE r2:
    evaluate.py reported 'inception' for a silent proxy fallback)."""
    clf = get_classifier({"img_size": 32,
                          "inception_weights": "/nonexistent/w.npz"})
    assert clf.backend == "random_proxy"
    assert "WARNING" in capsys.readouterr().out

    clf = get_classifier({"img_size": 32})
    assert clf.backend == "random_proxy"


def test_inception_score_avoids_remainder_retrace():
    """num_images not divisible by batch_size must NOT call the sampler
    with a remainder-sized batch (each new shape = a full remote
    recompile on the TPU backend); mirror of fid.fake_stats."""
    from sagan_tpu.train.iscore import inception_score

    shapes = []

    def sample_batch(key, n):
        shapes.append(n)
        import jax
        return jax.random.uniform(key, (n, 8, 8, 3), minval=-1, maxval=1)

    mean, std = inception_score(sample_batch, {"img_size": 8},
                                num_images=20, batch_size=16, splits=2)
    assert shapes == [16, 16]  # never a remainder-sized (4) call
    assert np.isfinite(mean) and np.isfinite(std)

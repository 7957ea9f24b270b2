"""TB event writer (validated against TensorFlow's reader), image grids,
config loading."""

import os

import numpy as np
import pytest

from sagan_tpu.utils.config import load_config_file, resolve_config
from sagan_tpu.utils.images import denormalize, make_grid
from sagan_tpu.utils.tb_writer import SummaryWriter


def test_tb_events_readable_by_tensorflow(tmp_path):
    tf = pytest.importorskip("tensorflow")
    logdir = str(tmp_path / "logs")
    w = SummaryWriter(logdir)
    w.scalar("loss/g", 1.5, step=3)
    w.scalars({"a": 1.0, "b": 2.0}, step=4)
    img = np.zeros((8, 8, 3), np.uint8)
    img[:4] = 255
    w.image("sample", img, step=5)
    w.close()

    fname = [f for f in os.listdir(logdir) if "tfevents" in f][0]
    events = list(tf.compat.v1.train.summary_iterator(
        os.path.join(logdir, fname)))
    assert events[0].file_version == "brain.Event:2"
    scalars = {}
    image_seen = None
    for ev in events[1:]:
        for v in ev.summary.value:
            if v.HasField("simple_value"):
                scalars[(v.tag, ev.step)] = v.simple_value
            if v.HasField("image"):
                image_seen = v.image
    assert scalars[("loss/g", 3)] == pytest.approx(1.5)
    assert scalars[("a", 4)] == 1.0 and scalars[("b", 4)] == 2.0
    assert image_seen is not None
    decoded = tf.io.decode_png(image_seen.encoded_image_string).numpy()
    np.testing.assert_array_equal(decoded, img)


def test_tb_histograms_readable_by_tensorflow(tmp_path):
    tf = pytest.importorskip("tensorflow")
    logdir = str(tmp_path / "logs")
    rng = np.random.default_rng(0)
    data = rng.normal(2.0, 3.0, 1000)
    w = SummaryWriter(logdir)
    w.histogram("hist/w", data, step=7)
    w.histograms({"hist/a": np.arange(10.0)}, step=8)
    w.close()

    fname = [f for f in os.listdir(logdir) if "tfevents" in f][0]
    histos = {}
    for ev in tf.compat.v1.train.summary_iterator(
            os.path.join(logdir, fname)):
        for v in ev.summary.value:
            if v.HasField("histo"):
                histos[(v.tag, ev.step)] = v.histo
    h = histos[("hist/w", 7)]
    assert h.num == 1000
    assert h.min == pytest.approx(data.min())
    assert h.max == pytest.approx(data.max())
    assert h.sum == pytest.approx(data.sum())
    assert h.sum_squares == pytest.approx(np.square(data).sum())
    assert sum(h.bucket) == 1000 and len(h.bucket_limit) == len(h.bucket)
    a = histos[("hist/a", 8)]
    assert a.num == 10 and a.min == 0.0 and a.max == 9.0


def test_denormalize_range():
    x = np.array([-1.0, 0.0, 1.0])
    np.testing.assert_array_equal(denormalize(x), [0, 127, 255])


def test_make_grid_geometry():
    imgs = np.zeros((9, 4, 4, 3), np.float32)
    grid = make_grid(imgs, pad=1)
    assert grid.shape == (3 * 5 - 1, 3 * 5 - 1, 3)
    imgs = np.zeros((5, 4, 4, 3), np.float32)  # non-square count
    grid = make_grid(imgs, pad=0)
    assert grid.shape == (12, 12, 3)


def test_config_file_loading(tmp_path):
    p = tmp_path / "cfg.py"
    p.write_text("name='x'\nconfig = {'batch_size': 4, 'z_dim': 8,"
                 " 'gpu': [0, 1], 'data_path': '/d', 'gf_dim': 8,"
                 " 'df_dim': 8, 'lr_g': 1e-4, 'lr_d': 4e-4}\n")
    cfg = load_config_file(str(p))
    cfg = resolve_config(cfg, num_local_devices=8)
    assert cfg["num_devices"] == 2          # len(gpu)
    assert cfg["global_batch_size"] == 8    # batch * width
    assert cfg["loss"] == "hinge_loss"      # default filled


def test_config_requires_dict(tmp_path):
    p = tmp_path / "bad.py"
    p.write_text("x = 1\n")
    with pytest.raises(ValueError):
        load_config_file(str(p))


def test_config_num_devices_clamped():
    base = {"batch_size": 2, "gpu": [0, 1, 2, 3], "data_path": "/d",
            "z_dim": 8, "gf_dim": 8, "df_dim": 8, "lr_g": 1e-4,
            "lr_d": 4e-4}
    cfg = resolve_config(base, num_local_devices=2)
    assert cfg["num_devices"] == 2
    assert cfg["global_batch_size"] == 4


def test_wait_for_devices_returns_devices():
    """On an already-initialized (CPU) backend the grant is immediate —
    the helper must return the device list without printing heartbeats."""
    from sagan_tpu.utils.device import wait_for_devices

    devs = wait_for_devices(log_every=30.0)
    import jax
    assert list(devs) == list(jax.devices())


def test_wait_for_devices_timeout(monkeypatch, capsys):
    """A wedged pool (jax.devices() blocking in the claim-retry loop)
    must surface as TimeoutError after `timeout`, with heartbeats
    printed while waiting — not an unbounded silent hang."""
    import time

    import jax
    import pytest

    from sagan_tpu.utils import device as device_mod

    monkeypatch.setattr(jax, "devices", lambda: time.sleep(30))
    with pytest.raises(TimeoutError, match="stale lease"):
        device_mod.wait_for_devices(log_every=0.05, timeout=0.3)
    assert "waiting for device grant" in capsys.readouterr().out


def test_wait_for_devices_timeout_shorter_than_heartbeat(monkeypatch):
    """SAGAN_DEVICE_TIMEOUT_S below the heartbeat interval must still
    fire on time — the join must never sleep past the deadline (a
    timeout of 10 s with the default 60 s heartbeat used to wait 60 s)."""
    import time

    import jax
    import pytest

    from sagan_tpu.utils import device as device_mod

    monkeypatch.setattr(jax, "devices", lambda: time.sleep(30))
    t0 = time.time()
    with pytest.raises(TimeoutError):
        device_mod.wait_for_devices(log_every=60.0, timeout=0.3)
    assert time.time() - t0 < 5.0

"""HTTP inference server tests: endpoints, static-batch rounding,
seed determinism, error surfaces (sagan_tpu/serve.py)."""

import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from sagan_tpu.models import get_generator
from sagan_tpu.serve import GeneratorService, make_server
from sagan_tpu.utils.config import resolve_config


@pytest.fixture(scope="module")
def server():
    cfg = resolve_config({
        "dataset": "synthetic", "data_path": "unused",
        "model": "vanilla", "z_dim": 8, "gf_dim": 8, "df_dim": 8,
        "img_size": 16, "use_attention": True, "attn_dim_G": [8],
        "attn_dim_D": [8], "use_label": True, "use_cond_bn": True,
        "num_classes": 4, "batch_size": 4, "num_devices": 1,
        "lr_g": 1e-4, "lr_d": 4e-4, "decay_rate": 0.99,
        "compute_dtype": "float32",
    }, num_local_devices=1)
    gen = get_generator(cfg)
    eval_vars = gen.init(jax.random.PRNGKey(0))
    svc = GeneratorService(gen, eval_vars, z_dim=8, num_classes=4,
                           batch=4, seed=0)
    srv = make_server(svc, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = "http://%s:%d" % srv.server_address[:2]
    yield base
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, dict(r.headers), r.read()


def test_healthz_and_meta(server):
    status, _, body = _get(server + "/healthz")
    assert (status, body) == (200, b"ok")
    status, _, body = _get(server + "/meta")
    meta = json.loads(body)
    assert status == 200
    assert meta == {"img_size": 16, "z_dim": 8, "num_classes": 4,
                    "batch": 4, "ladder": [1, 4], "num_devices": 1}


def test_sample_png_grid(server):
    status, headers, body = _get(server + "/sample?n=3&seed=1")
    assert status == 200
    assert headers["Content-Type"] == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"


def test_sample_npz_rounds_to_n(server):
    # n=6 > batch=4: two device batches, sliced back to 6
    import io
    status, _, body = _get(server + "/sample?n=6&seed=2&format=npz")
    assert status == 200
    imgs = np.load(io.BytesIO(body))["images"]
    assert imgs.shape == (6, 16, 16, 3)
    assert imgs.dtype == np.uint8


def test_sample_raw_shape_header(server):
    status, headers, body = _get(
        server + "/sample?n=2&seed=3&format=raw")
    assert status == 200
    assert headers["X-Image-Shape"] == "2x16x16x3"
    arr = np.frombuffer(body, np.uint8).reshape(2, 16, 16, 3)
    assert arr.any()


def test_seed_determinism_and_freshness(server):
    _, _, a = _get(server + "/sample?n=2&seed=5&format=raw")
    _, _, b = _get(server + "/sample?n=2&seed=5&format=raw")
    assert a == b
    # no seed → server stream advances, two calls differ
    _, _, c = _get(server + "/sample?n=2&format=raw")
    _, _, d = _get(server + "/sample?n=2&format=raw")
    assert c != d


def test_class_pinning(server):
    _, _, a = _get(server + "/sample?n=2&seed=7&class_id=1&format=raw")
    _, _, b = _get(server + "/sample?n=2&seed=7&class_id=3&format=raw")
    assert a != b  # conditional model: class changes the output


def test_class_out_of_range_is_400(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server + "/sample?n=1&class_id=99")
    assert ei.value.code == 400
    assert b"out of range" in ei.value.read()


def test_malformed_query_param_is_400(server):
    # client input errors must not surface as 500s (round-4 review)
    for bad in ("n=abc", "seed=x", "class_id=x", "truncation=x"):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(server + "/sample?" + bad)
        assert ei.value.code == 400, bad
        assert b"bad query parameter" in ei.value.read()


def test_request_cap_scales_with_image_size(server):
    # 16px: the byte bound exceeds the 4096 absolute cap
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server + "/sample?n=5000&format=raw")
    assert ei.value.code == 400
    assert b"per-request cap 4096" in ei.value.read()
    # the cap formula bounds BYTES at large image sizes: at 512px far
    # fewer images fit one request than the 4096 absolute cap
    from sagan_tpu.serve import request_cap
    assert 16 <= request_cap(16, 512) < 256  # ~85: multi-GB impossible
    assert request_cap(64, 4096) == 64  # never below one batch
    assert request_cap(64, 64) == 4096  # small images keep the old cap


def _computed_counter(server):
    _, _, body = _get(server + "/metrics")
    for line in body.decode().splitlines():
        if line.startswith("sagan_images_computed_total"):
            return int(float(line.split()[1]))
    raise AssertionError("sagan_images_computed_total missing")


def test_ladder_small_request_skips_full_batch(server):
    """VERDICT r4 item 6: an n=1 request on a batch-4 server must run
    the 1-image ladder program, not the full batch — the device-work
    counter rises by exactly 1."""
    before = _computed_counter(server)
    _get(server + "/sample?n=1&seed=21&format=raw")
    assert _computed_counter(server) - before == 1


def test_ladder_chunks_cover_request_with_bounded_waste(server):
    # n=6 over ladder (1, 4): one 4-chunk, then the tail (2) finishes
    # with ONE 4-rung program (sliced) rather than two 1-programs —
    # program count beats exactness; waste is bounded < n
    before = _computed_counter(server)
    status, _, _ = _get(server + "/sample?n=6&seed=22&format=raw")
    assert status == 200
    assert _computed_counter(server) - before == 8


def test_ladder_tail_never_degenerates_into_unit_programs():
    """The n-just-under-a-rung tail must run ONE sliced program of the
    next rung, not remainder-many smallest-rung programs (seven 1-image
    dispatches for n=7 on the default ladder)."""
    cfg = _tiny_cfg()
    gen = get_generator(cfg)
    eval_vars = gen.init(jax.random.PRNGKey(0))
    svc = GeneratorService(gen, eval_vars, z_dim=8, num_classes=4,
                           batch=8, seed=0, ladder=(1, 4))
    assert svc.ladder == [1, 4, 8]
    assert list(svc._chunks(1)) == [1]
    assert list(svc._chunks(3)) == [4]      # one program, slice 1
    assert list(svc._chunks(7)) == [8]      # not [4,1,1,1]
    assert list(svc._chunks(9)) == [8, 1]
    assert list(svc._chunks(11)) == [8, 4]  # slice 1
    assert list(svc._chunks(23)) == [8, 8, 8]
    # the DEFAULT production ladder's tails (sparse rungs 1, 8, 64):
    # a remainder of 2-4 must round up to one 8, never repeat the
    # 1-rung; a remainder over 8 must never round up to 64
    svc.ladder = [1, 8, 64]
    assert list(svc._chunks(2)) == [8]
    assert list(svc._chunks(3)) == [8]
    assert list(svc._chunks(9)) == [8, 1]
    assert list(svc._chunks(11)) == [8, 8]  # not [8,1,1,1]
    assert list(svc._chunks(63)) == [64]
    assert list(svc._chunks(130)) == [64, 64, 8]
    assert list(svc._chunks(85)) == [64, 8, 8, 8]  # byte-cap worst case
    svc.ladder = [1, 4, 8]
    imgs = svc.sample(7, seed=1, class_id=-1, truncation=0.0)
    assert imgs.shape[0] == 7 and svc.images_computed_total == 8


def test_parallel_small_requests_dont_serialize_full_batches(server):
    """Two concurrent n=1 requests must cost 2 computed images total
    (each a 1-image program under the lock) — not two serialized
    full-batch programs (2×4)."""
    before = _computed_counter(server)
    results = []

    def one():
        results.append(_get(server + "/sample?n=1&format=raw")[0])

    threads = [threading.Thread(target=one) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == [200, 200]
    assert _computed_counter(server) - before == 2


def test_ladder_disabled_restores_whole_batch_rounding():
    cfg = _tiny_cfg()
    gen = get_generator(cfg)
    eval_vars = gen.init(jax.random.PRNGKey(0))
    svc = GeneratorService(gen, eval_vars, z_dim=8, num_classes=4,
                           batch=4, seed=0, ladder=())
    assert svc.ladder == [4]
    svc.sample(1, seed=0, class_id=-1, truncation=0.0)
    assert svc.images_computed_total == 4  # pre-round-5 behavior


def test_unknown_path_404(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server + "/nope")
    assert ei.value.code == 404


def test_metrics_endpoint_counts(server):
    _get(server + "/sample?n=3&seed=11&format=raw")
    status, headers, body = _get(server + "/metrics")
    assert status == 200 and headers["Content-Type"] == "text/plain"
    text = body.decode()
    fields = {line.split()[0]: float(line.split()[1])
              for line in text.splitlines() if not line.startswith("#")}
    assert fields["sagan_requests_total"] >= 1
    assert fields["sagan_images_total"] >= 3
    assert fields["sagan_sample_seconds_total"] > 0
    assert fields["sagan_serving_devices"] == 1


def _tiny_cfg():
    return resolve_config({
        "dataset": "synthetic", "data_path": "unused",
        "model": "vanilla", "z_dim": 8, "gf_dim": 8, "df_dim": 8,
        "img_size": 16, "use_attention": True, "attn_dim_G": [8],
        "attn_dim_D": [8], "use_label": True, "use_cond_bn": True,
        "num_classes": 4, "batch_size": 4, "num_devices": 1,
        "lr_g": 1e-4, "lr_d": 4e-4, "decay_rate": 0.99,
        "compute_dtype": "float32",
    }, num_local_devices=1)


def test_multi_device_serving_matches_single():
    """--num_devices 8: batch rounds up to a mesh multiple and the
    sharded program generates the SAME images as the single-device
    path (pure per-example compute — sharding must not change
    numerics)."""
    cfg = _tiny_cfg()
    gen = get_generator(cfg)
    eval_vars = gen.init(jax.random.PRNGKey(0))
    one = GeneratorService(gen, eval_vars, z_dim=8, num_classes=4,
                           batch=8, seed=0, num_devices=1)
    many = GeneratorService(gen, eval_vars, z_dim=8, num_classes=4,
                            batch=6, seed=0, num_devices=8)
    assert many.batch == 8  # rounded up to the mesh width
    assert many.num_devices == 8
    a = one.sample(8, seed=5, class_id=2, truncation=0.0)
    b = many.sample(8, seed=5, class_id=2, truncation=0.0)
    assert np.abs(a.astype(np.int16) - b.astype(np.int16)).max() <= 1

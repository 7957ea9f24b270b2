"""Minimal production inference server: trained generator → HTTP.

The reference has no serving story at all (generation exists only as a
training side effect, /root/reference/sagan/main.py:289-320).  This
module completes the deployment chain begun by ``generate --export``:

    python -m sagan_tpu.generate --config_path cfg.py --export g.npz
    python -m sagan_tpu.serve --config_path cfg.py --weights g.npz \
        [--port 8000] [--batch 64] [--host 127.0.0.1]

stdlib-only HTTP (``http.server.ThreadingHTTPServer``) in front of the
jitted device-side-uint8 serve path (:func:`sagan_tpu.generate.
build_serve_fn`).  TPU-first serving design:

* **a static batch-shape ladder** (``--batch`` plus ``--ladder``,
  default 1,8), all compiled at startup — a request is served by
  largest-fitting ladder chunks, so an n=1 request doesn't pay the
  full-batch program and no request shape ever triggers an XLA
  recompile (40-300 s on a remote TPU);
* **device-side de-normalization** — the host fetch (the dominant cost
  for a tunneled chip, tools/bench_generate.py) moves uint8, 4× fewer
  bytes than float32;
* **a single inference lock** — one TPU program in flight at a time;
  concurrent HTTP readers queue (throughput comes from batching, not
  from racing programs into one chip).

* **data-parallel scale-out** (``--num_devices m``) — parameters
  replicated on a 1-D ICI mesh, the latent batch sharded on ``data``;
  generation is pure per-example compute, so GSPMD inserts zero
  collectives and serving throughput scales with chips.

Endpoints:
  GET /healthz                          → 200 "ok" once the model is hot
  GET /meta                             → model geometry JSON
  GET /metrics                          → Prometheus-style counters
  GET /sample?n=16&seed=0&class_id=-1&truncation=0&format=png|npz|raw
      → image grid PNG (default), an npz of uint8 images, or raw
        uint8 bytes (shape in X-Image-Shape, for zero-copy pipelines)

``--weights`` (exported npz) needs no checkpoint tree on the box;
without it the latest checkpoint under the config's ``ckpt_dir`` is
restored (EMA generator when tracked).
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from .utils.cache import enable_compilation_cache

# Per-request output ceiling in raw uint8 bytes (64 MiB).  /sample's n
# cap derives from this and the model's image size, so one request can
# never hold the inference lock while concatenating multi-GB host
# buffers (at 64px this allows the full 4096-image cap; at 512px it
# works out to ~85 images).  The bound is on the REQUESTED image count:
# the device computes whole ladder chunks, so the host buffer can
# exceed it by the one finishing chunk's slice (< the remainder it
# covers, or < the rung above the smallest — see _chunks), keeping the
# buffer under 2× the cap plus one rung — a bounded slop, not the
# multi-GB hazard the cap exists to stop.
MAX_SAMPLE_BYTES = 64 << 20


def request_cap(min_batch: int, img_size: int) -> int:
    """Max images one /sample request may ask for: 4096 absolute,
    tightened so raw output stays under MAX_SAMPLE_BYTES, never below
    one smallest compiled batch (the floor request the server can
    serve without slicing a larger program's output)."""
    return min(4096,
               max(min_batch, MAX_SAMPLE_BYTES // (img_size * img_size * 3)))


class GeneratorService:
    """Owns the jitted serve function and the inference lock.

    ``num_devices > 1`` serves data-parallel over a 1-D ICI mesh:
    parameters replicated, the latent batch sharded on ``data`` — each
    chip generates ``batch / num_devices`` images per program (pure
    per-example compute, so GSPMD inserts zero collectives).  The
    compiled batch rounds up to a mesh multiple.

    ``ladder`` (VERDICT r4 item 6): extra smaller batch shapes compiled
    at startup alongside ``batch``.  A request is served by ladder
    chunks — greedy largest-fitting, with the tail always covered by
    ONE sliced program rather than smallest-rung repeats (see _chunks;
    n=11 on ladder (1, 8, 64) → 8 + 8 sliced to 11) — so an n=1
    request on a ``--batch 64`` server runs the 1-image program, not
    the 64-image one: ~batch/n× lower latency and device work, still
    zero recompiles.  Each ladder size is one more XLA program compiled at
    startup (40-300 s cold on a remote TPU, cached after); pass
    ``ladder=()`` to compile only ``batch`` (the pre-round-5
    behavior)."""

    def __init__(self, gen, eval_vars, z_dim: int, num_classes: int,
                 batch: int, seed: int = 0, num_devices: int = 1,
                 ladder: tuple = (1, 8)):
        import jax

        from .generate import build_serve_fn

        self.z_dim = z_dim
        self.num_classes = max(1, num_classes)
        self._lock = threading.Lock()
        self._key = jax.random.PRNGKey(seed)
        self.requests_total = 0
        self.images_total = 0
        self.images_computed_total = 0
        self.sample_seconds_total = 0.0
        self.num_devices = max(1, num_devices or 1)
        if self.num_devices > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from .parallel.mesh import batch_sharding, make_mesh
            mesh = make_mesh(self.num_devices)
            self._bs = batch_sharding(mesh)
            self._vars = jax.device_put(
                eval_vars, NamedSharding(mesh, P()))
        else:
            self._bs = None
            self._vars = eval_vars
        # every compiled size must shard evenly over the mesh
        mult = self.num_devices
        batch = -(-batch // mult) * mult
        sizes = {batch}
        for s in ladder or ():
            s = -(-int(s) // mult) * mult
            if 0 < s <= batch:
                sizes.add(s)
        self.ladder = sorted(sizes)
        self.batch = batch
        self._fn = build_serve_fn(gen)
        # compile + execute every ladder size once so /healthz reflects
        # a fully hot model (jax.jit caches one program per shape)
        import jax.numpy as jnp
        for s in self.ladder:
            z = self._place(jnp.zeros((s, z_dim), jnp.float32))
            labels = self._place(jnp.zeros((s,), jnp.int32))
            out = np.asarray(jax.device_get(
                self._fn(self._vars, z, labels)))
        self.img_size = int(out.shape[1])
        self.max_request_images = request_cap(self.ladder[0],
                                              self.img_size)

    def _place(self, arr):
        import jax
        return jax.device_put(arr, self._bs) if self._bs is not None else arr

    def _chunks(self, n: int):
        """Ladder decomposition of ``n``: greedy
        largest-compiled-size-≤-remaining, except the request FINISHES
        with ONE rung ≥ the remainder when (a) that wastes strictly
        less than the remainder, or (b) greedy would repeat the
        smallest rung (each chunk is a full dispatch+fetch round trip
        under the inference lock — program count beats exactness once
        the tail is down to smallest-rung repeats).  Without the finish
        rules a tail just under a rung degenerates into many unit
        programs: n=7 on the default (1, 8, 64) ladder would run SEVEN
        1-image programs; n=63 fourteen programs instead of one
        sliced 64.
          n=1 → [1]   n=3 → [8]   n=7 → [8]   n=9 → [8, 1]
          n=11 → [8, 8]   n=63 → [64]   n=130 → [64, 64, 8]
        The overshoot (sliced off by the caller) is bounded by the one
        finishing chunk: < the remainder itself under rule (a), < the
        rung above the smallest under rule (b) — total computed stays
        under 2n + one rung.  A single-rung ladder reduces to the
        pre-ladder behavior (round up to the compiled batch)."""
        remaining = n
        while remaining > 0:
            up = min((s for s in self.ladder if s >= remaining),
                     default=None)
            down = max((s for s in self.ladder if s <= remaining),
                       default=None)
            if up is not None and (
                    up < 2 * remaining                     # rule (a)
                    or down is None
                    or (down == self.ladder[0]
                        and remaining > down)):            # rule (b)
                yield up
                return
            if down is None:  # no rung fits either way: smallest, sliced
                yield self.ladder[0]
                return
            yield down
            remaining -= down

    def sample(self, n: int, seed: int | None, class_id: int,
               truncation: float) -> np.ndarray:
        """n uint8 images [n, H, W, 3], assembled from compiled-ladder
        chunks (no recompile; see _chunks), sliced to n."""
        import jax
        import jax.numpy as jnp

        import time
        out = []
        t0 = time.perf_counter()
        with self._lock:
            if seed is not None:
                key = jax.random.PRNGKey(seed)
            else:
                self._key, key = jax.random.split(self._key)
            for size in self._chunks(n):
                key, kz, kl = jax.random.split(key, 3)
                if truncation and truncation > 0:
                    z = jax.random.truncated_normal(
                        kz, -truncation, truncation,
                        (size, self.z_dim))
                else:
                    z = jax.random.normal(kz, (size, self.z_dim))
                if class_id >= 0:
                    labels = jnp.full((size,), class_id, jnp.int32)
                else:
                    labels = jax.random.randint(
                        kl, (size,), 0, self.num_classes)
                out.append(np.asarray(jax.device_get(
                    self._fn(self._vars, self._place(z),
                             self._place(labels)))))
                self.images_computed_total += size
            self.requests_total += 1
            self.images_total += n
            self.sample_seconds_total += time.perf_counter() - t0
        return np.concatenate(out)[:n]

    def metrics_text(self) -> str:
        """Prometheus-style plaintext counters."""
        return (
            "# TYPE sagan_requests_total counter\n"
            f"sagan_requests_total {self.requests_total}\n"
            "# TYPE sagan_images_total counter\n"
            f"sagan_images_total {self.images_total}\n"
            "# TYPE sagan_images_computed_total counter\n"
            f"sagan_images_computed_total {self.images_computed_total}\n"
            "# TYPE sagan_sample_seconds_total counter\n"
            f"sagan_sample_seconds_total {self.sample_seconds_total:.6f}\n"
            "# TYPE sagan_serving_devices gauge\n"
            f"sagan_serving_devices {self.num_devices}\n")


def _make_handler(svc: GeneratorService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # stderr noise → off
            pass

        def _send(self, code: int, body: bytes, ctype: str,
                  extra: dict | None = None):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in (extra or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            try:
                if url.path == "/healthz":
                    return self._send(200, b"ok", "text/plain")
                if url.path == "/meta":
                    meta = {"img_size": svc.img_size, "z_dim": svc.z_dim,
                            "num_classes": svc.num_classes,
                            "batch": svc.batch,
                            "ladder": svc.ladder,
                            "num_devices": svc.num_devices}
                    return self._send(
                        200, json.dumps(meta).encode(), "application/json")
                if url.path == "/metrics":
                    return self._send(200, svc.metrics_text().encode(),
                                      "text/plain")
                if url.path == "/sample":
                    q = parse_qs(url.query)

                    def one(name, cast, default):
                        return cast(q[name][0]) if name in q else default

                    try:
                        n = max(one("n", int, 16), 1)
                        seed = one("seed", int, None)
                        class_id = one("class_id", int, -1)
                        trunc = one("truncation", float, 0.0)
                    except ValueError as e:
                        # client error, not a server fault: ?n=abc
                        # must be a 400, not a 500
                        return self._send(
                            400, f"bad query parameter: {e}".encode(),
                            "text/plain")
                    # the request cap bounds total output BYTES, not
                    # image count — at 512px an n=4096 request would
                    # build ~3 GB of host buffers under the inference
                    # lock, stalling every other client
                    if n > svc.max_request_images:
                        return self._send(
                            400, f"n={n} exceeds the per-request cap "
                            f"{svc.max_request_images} at "
                            f"{svc.img_size}px".encode(),
                            "text/plain")
                    if class_id >= svc.num_classes:
                        return self._send(
                            400, f"class_id {class_id} out of range "
                            f"(num_classes={svc.num_classes})".encode(),
                            "text/plain")
                    fmt = one("format", str, "png")
                    imgs = svc.sample(n, seed, class_id, trunc)
                    if fmt == "npz":
                        buf = io.BytesIO()
                        np.savez_compressed(buf, images=imgs)
                        return self._send(200, buf.getvalue(),
                                          "application/octet-stream")
                    if fmt == "raw":
                        return self._send(
                            200, imgs.tobytes(), "application/octet-stream",
                            {"X-Image-Shape":
                             "x".join(map(str, imgs.shape)),
                             "X-Image-Dtype": "uint8"})
                    from PIL import Image

                    from .utils.images import make_grid
                    buf = io.BytesIO()
                    Image.fromarray(make_grid(imgs)).save(buf, format="PNG")
                    return self._send(200, buf.getvalue(), "image/png")
                return self._send(404, b"not found", "text/plain")
            except BrokenPipeError:
                pass
            except Exception as e:  # surface, don't kill the thread
                try:
                    self._send(500, f"{type(e).__name__}: {e}".encode(),
                               "text/plain")
                except Exception:
                    pass

    return Handler


def make_server(svc: GeneratorService, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    """Bound-but-not-serving server (call ``serve_forever``); port 0
    picks a free port (``server_address[1]`` has the real one)."""
    return ThreadingHTTPServer((host, port), _make_handler(svc))


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="serve a trained sagan-tpu generator over HTTP")
    ap.add_argument("--config_path", required=True)
    ap.add_argument("--weights", default=None,
                    help="exported generator .npz (generate --export); "
                         "default: latest checkpoint under ckpt_dir")
    ap.add_argument("--step", type=int, default=None,
                    help="restore this checkpointed step (default latest)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--batch", type=int, default=64,
                    help="largest compiled serving batch")
    ap.add_argument("--ladder", default="1,8",
                    help="extra compiled batch sizes (comma-separated) "
                         "serving small requests without paying the "
                         "full batch; '' compiles only --batch "
                         "(each size is one more startup compile)")
    ap.add_argument("--num_devices", type=int, default=1,
                    help="serve data-parallel over this many local "
                         "chips (params replicated, batch sharded; "
                         "batch rounds up to a multiple)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    enable_compilation_cache()
    import os
    import sys

    from .utils.config import load_config_file, resolve_config
    from .utils.device import wait_for_devices
    wait_for_devices(stream=sys.stderr)

    config = resolve_config(load_config_file(args.config_path))
    from .generate import load_generator_npz, restore_eval_state
    if "img_size" not in config or "num_classes" not in config:
        # same fallback chain as generate.main: exported-npz meta
        # first, then dataset metadata — and BOTH keys must resolve
        # before skipping the metadata read (a conditional model with
        # only img_size in its config must not silently serve
        # num_classes=1 and reject every class_id)
        filled = False
        if args.weights and os.path.exists(args.weights):
            with np.load(args.weights) as data:
                for k in ("img_size", "num_classes"):
                    if f"meta/{k}" in data:
                        config.setdefault(k, int(data[f"meta/{k}"]))
            filled = "img_size" in config and "num_classes" in config
        if not filled:
            from .data.tfrecord import load_metadata
            try:
                config.update(load_metadata(config["data_path"]))
            except FileNotFoundError:
                raise SystemExit(
                    f"config lacks img_size/num_classes and no "
                    f"metadata.pickle under {config['data_path']!r}")
    if args.weights:
        gen, eval_vars = load_generator_npz(config, args.weights)
    else:
        gen, eval_vars = restore_eval_state(config, step=args.step)
    try:
        ladder = tuple(int(s) for s in args.ladder.split(",") if s.strip())
    except ValueError:
        raise SystemExit(f"--ladder must be comma-separated ints, got "
                         f"{args.ladder!r}")
    svc = GeneratorService(
        gen, eval_vars, z_dim=config["z_dim"],
        num_classes=config.get("num_classes", 1), batch=args.batch,
        seed=args.seed, num_devices=args.num_devices, ladder=ladder)
    srv = make_server(svc, args.host, args.port)
    host, port = srv.server_address[:2]
    print(f"serving {svc.img_size}px generator on http://{host}:{port} "
          f"(batch ladder {svc.ladder})", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()


if __name__ == "__main__":
    main()

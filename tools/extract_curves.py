"""Extract scalar curves from a TensorBoard event directory to JSON —
used to commit quality-trend artifacts (FID/loss curves) from training
runs.  Reads our own tb_writer output back through TensorFlow's event
reader (the same cross-check the TB tests use).

Usage: python tools/extract_curves.py <logdir> [tag ...]
Prints {tag: [[step, value], ...], ...} as JSON (all scalar tags when no
tag filter is given).
"""

from __future__ import annotations

import json
import os
import sys


def extract(logdir: str, tags: list | None = None) -> dict:
    import tensorflow as tf  # tooling-only dependency

    curves: dict = {}
    for fname in sorted(os.listdir(logdir)):
        if "tfevents" not in fname:
            continue
        for ev in tf.compat.v1.train.summary_iterator(
                os.path.join(logdir, fname)):
            for v in ev.summary.value:
                if not v.HasField("simple_value"):
                    continue
                if tags and v.tag not in tags:
                    continue
                curves.setdefault(v.tag, []).append(
                    [int(ev.step), float(v.simple_value)])
    for series in curves.values():
        series.sort()
    return curves


if __name__ == "__main__":
    logdir = sys.argv[1]
    tags = sys.argv[2:] or None
    print(json.dumps(extract(logdir, tags), indent=1))

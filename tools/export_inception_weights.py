"""Export InceptionV3 weights for standard FID.

Run this once on a machine with network access (or with a local Keras
.h5), then point ``config['inception_weights']`` at the resulting npz:

    python tools/export_inception_weights.py inception_imagenet.npz
    python tools/export_inception_weights.py out.npz --h5 /path/weights.h5

The export is creation-order indexed; the JAX port is validated against
tf.keras with shared weights in tests/test_inception.py, so the npz
produces reference-faithful FID activations.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", help="output .npz path")
    ap.add_argument("--h5", default=None,
                    help="local Keras weights .h5 (default: download "
                         "imagenet weights via tf.keras)")
    args = ap.parse_args(argv)

    from sagan_tpu.train.inception import export_weights_npz

    export_weights_npz(args.out, source=args.h5)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

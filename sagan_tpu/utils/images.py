"""Sample-image grid utilities.

Replaces the matplotlib gridspec path
(/root/reference/sagan/main.py:300-320) with direct PNG assembly — no
figure machinery; each tile's pixels are the exact de-normalized
sample values (the reference's matplotlib render adds margins and
resampling, so whole-file byte identity is not the claim).
"""

from __future__ import annotations

import os

import numpy as np


def denormalize(x: np.ndarray) -> np.ndarray:
    """[-1, 1] float → uint8, matching the reference's
    ``uint8(x*127.5 + 127.5)`` de-norm (sagan/main.py:334 uses +128; we
    center exactly)."""
    x = np.asarray(x, dtype=np.float32)
    return np.clip(x * 127.5 + 127.5, 0, 255).astype(np.uint8)


def make_grid(images: np.ndarray, pad: int = 2) -> np.ndarray:
    """[N, H, W, 3] float in [-1,1] → one uint8 grid image,
    ceil(sqrt(N)) per side, filled column-major like the reference
    (sample i at row i%n, col i//n — sagan/main.py:312; ceil instead of
    the reference's floor-sqrt so a non-square N still shows every
    sample)."""
    n, h, w, c = images.shape
    side = int(np.ceil(np.sqrt(n)))
    grid = np.zeros((side * (h + pad) - pad, side * (w + pad) - pad, c),
                    np.uint8)
    # uint8 input = already de-normalized (the device-side serving path,
    # generate.build_serve_fn, fetches uint8 to cut host-transfer bytes)
    u8 = images if images.dtype == np.uint8 else denormalize(images)
    for i in range(n):
        col, r = divmod(i, side)
        grid[r * (h + pad):r * (h + pad) + h,
             col * (w + pad):col * (w + pad) + w] = u8[i]
    return grid


def save_image_grid(images: np.ndarray, path: str) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(make_grid(images)).save(path)

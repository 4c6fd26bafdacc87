"""Torch-exact bilinear image resize (separable, numpy).

The reference applies ``transforms.Resize`` AFTER ``ToTensor``+``Normalize``
(reference datasets/celeba.py:26-33, datasets/imagenet.py:30-39), i.e.
torchvision's *tensor-mode* resize — which lowers to
``torch.nn.functional.interpolate(mode="bilinear", align_corners=False,
antialias=...)`` with ``antialias=True`` as the torchvision>=0.17 default
(the reference pins no version; its Oct-2024 snapshot installs 0.19+).

This module reproduces both ATen kernels exactly in numpy so the host data
pipeline needs no torch:

  - ``antialias=True``  -> aten::_upsample_bilinear2d_aa (the PIL-style
    triangle filter with support scaled by the downscale factor,
    weight-normalized per output pixel).
  - ``antialias=False`` -> aten::upsample_bilinear2d (2-tap bilinear at
    ``src = (i + 0.5) * scale - 0.5`` with edge clamping).

Both are separable: we build the (out, in) row/col weight matrices once per
geometry (LRU-cached) and apply them as two small matmuls per image.
Parity vs ``F.interpolate`` is asserted in tests/test_data.py.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


@lru_cache(maxsize=64)
def _aa_weights(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) weight matrix of aten::_upsample_bilinear2d_aa along one
    axis (align_corners=False)."""
    scale = in_size / out_size
    support = scale if scale >= 1.0 else 1.0  # bilinear filter support = 1
    invscale = 1.0 / scale if scale >= 1.0 else 1.0
    w = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        center = scale * (i + 0.5)
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        js = np.arange(xmin, xmax)
        ws = 1.0 - np.abs((js + 0.5 - center) * invscale)
        ws = np.clip(ws, 0.0, None)
        total = ws.sum()
        if total > 0:
            ws /= total
        w[i, xmin:xmax] = ws
    return w.astype(np.float32)


@lru_cache(maxsize=64)
def _bilinear_weights(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) weight matrix of aten::upsample_bilinear2d (antialias=False,
    align_corners=False) along one axis."""
    scale = in_size / out_size
    w = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        src = max((i + 0.5) * scale - 0.5, 0.0)
        i0 = min(int(src), in_size - 1)
        i1 = min(i0 + 1, in_size - 1)
        frac = src - i0
        w[i, i0] += 1.0 - frac
        w[i, i1] += frac
    return w.astype(np.float32)


def resize_bilinear(
    img_hwc: np.ndarray, out_h: int, out_w: int, antialias: bool = True
) -> np.ndarray:
    """Resize an (H, W, C) float array with torch-interpolate semantics.

    Returns float32 (H', W', C). Linear in the input, so affine normalize
    commutes exactly through it — callers may resize raw 0..255 floats and
    apply scale/offset afterwards.
    """
    img = np.asarray(img_hwc, np.float32)
    h, w = img.shape[:2]
    if h == out_h and w == out_w:
        return img
    make = _aa_weights if antialias else _bilinear_weights
    wh = make(h, out_h)  # (out_h, h)
    ww = make(w, out_w)  # (out_w, w)
    # rows: (out_h, h) @ (h, w*c) ; cols: (out_h*c?, ...) via tensordot
    out = np.tensordot(wh, img, axes=(1, 0))  # (out_h, w, c)
    out = np.tensordot(ww, out, axes=(1, 1))  # (out_w, out_h, c)
    return np.ascontiguousarray(out.transpose(1, 0, 2))

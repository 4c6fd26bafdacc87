"""Image saving utilities (reference sampler.py:158-184, eesampler.py:92-99,
utils/evaluation_utils.py:46-51) on PIL/numpy."""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np
from PIL import Image


def to_uint8(img01: np.ndarray) -> np.ndarray:
    img01 = np.nan_to_num(img01, nan=0.0, posinf=1.0, neginf=0.0)
    return (np.clip(img01, 0.0, 1.0) * 255.0).round().astype(np.uint8)


def save_image(img01: np.ndarray, path) -> None:
    """img01: (H, W, C) float in [0, 1]."""
    arr = to_uint8(np.asarray(img01))
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)


def make_grid(samples: np.ndarray) -> np.ndarray:
    """(N, H, W, C) in [0,1] -> square grid image (reference sampler.py:163-183)."""
    n, h, w, c = samples.shape
    grid_size = math.ceil(math.sqrt(n))
    grid = np.zeros((grid_size * h, grid_size * w, c), dtype=np.float32)
    for idx in range(n):
        row, col = divmod(idx, grid_size)
        grid[row * h : (row + 1) * h, col * w : (col + 1) * w] = np.clip(
            samples[idx], 0, 1
        )
    return grid


def save_samples(samples: np.ndarray, output_folder, timestep: int = 1000,
                 with_grid: bool = True) -> None:
    """Dump each sample as ``{i}.png`` (``{i}_{t}.png`` for intermediates)
    plus a ``grid_image.png`` (reference sampler.py:158-184)."""
    output_folder = Path(output_folder)
    output_folder.mkdir(parents=True, exist_ok=True)
    for i, s in enumerate(np.asarray(samples)):
        name = f"{i}_{timestep}.png" if timestep != 1000 else f"{i}.png"
        save_image(s, output_folder / name)
    if with_grid:
        save_image(make_grid(np.asarray(samples)), output_folder / "grid_image.png")

"""Frechet Inception Distance on TPU.

Feature extraction (InceptionV3 pool3, duodiff_tpu.models.inception) runs
jitted and batched on device; the Gaussian statistics are accumulated in
fp64-on-host numpy and the matrix square root uses scipy (2048x2048, host) —
the same split torchmetrics uses (reference fid.py:34-39).
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image


def extract_features(model, params, images01: np.ndarray, batch_size: int = 64):
    """images01: (N, H, W, C) float in [0, 1] -> (N, 2048) np features."""
    from duodiff_tpu.models.inception import preprocess

    @jax.jit
    def run(batch):
        return model.apply({"params": params}, preprocess(batch))

    feats = []
    n = images01.shape[0]
    i = 0
    while i < n:
        chunk = images01[i : i + batch_size]
        pad = 0
        if chunk.shape[0] < batch_size:
            pad = batch_size - chunk.shape[0]
            chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:],
                                                    chunk.dtype)])
        out = np.asarray(run(jnp.asarray(chunk, jnp.float32)))
        feats.append(out[: batch_size - pad])
        i += batch_size
    return np.concatenate(feats, axis=0)


def compute_statistics(features: np.ndarray):
    """(N, D) -> (mu (D,), sigma (D, D)) in float64."""
    f = np.asarray(features, np.float64)
    mu = f.mean(axis=0)
    sigma = np.cov(f, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """|mu1-mu2|^2 + tr(s1 + s2 - 2 sqrtm(s1 s2)), with the standard
    eps-jitter fallback when the product is near-singular."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean = linalg.sqrtm(sigma1.dot(sigma2))  # scipy>=1.12 returns array only
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real

    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
        - 2.0 * np.trace(covmean)
    )


def fid_from_features(real_feats: np.ndarray, fake_feats: np.ndarray) -> float:
    mu_r, s_r = compute_statistics(real_feats)
    mu_f, s_f = compute_statistics(fake_feats)
    return frechet_distance(mu_r, s_r, mu_f, s_f)


# ---------------------------------------------------------------------------
# sample/dataset IO (reference utils/evaluation_utils.py:13-43)
# ---------------------------------------------------------------------------


def read_samples(path) -> np.ndarray:
    """Recursively read PNGs from a samples dir, skipping grid images
    (reference utils/evaluation_utils.py:13-24). Returns (N, H, W, 3) in [0,1]."""
    imgs = []
    for p in sorted(Path(path).rglob("*.png")):
        if "grid" in p.name:
            continue
        imgs.append(np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0)
    if not imgs:
        raise FileNotFoundError(f"no sample PNGs under {path}")
    print(f"Read {len(imgs)} images")
    return np.stack(imgs)


def get_dataset_samples(dataset_name: str, data_path, seed: int, n_samples: int):
    """First n_samples real images, un-normalized [0,1]
    (reference utils/evaluation_utils.py:27-43)."""
    from duodiff_tpu.data import get_dataloader

    loader = get_dataloader(
        dataset_name, n_samples, seed, data_path, normalize=False
    )
    return loader.next_batch()["image"]

"""Weight-free sample-quality metrics: FD-rand and spectral distance.

The reference's quality metric is FID on canonical pt_inception weights
(reference fid.py:34-39) — a weights file this environment cannot download.
These two metrics make quality claims falsifiable WITHOUT that file:

- **FD-rand**: the Frechet distance of `duodiff_tpu.models.inception` pool3
  features under a FIXED seeded random initialization. Random deep
  convolutional features are a classical two-sample statistic (untrained
  CNN features discriminate image distributions; the Frechet form matches
  FID exactly, only the feature map differs). The seed is pinned so numbers
  are comparable across runs and machines.
- **Spectral distance**: RMS distance between mean radial log power spectra.
  This targets precisely what mean-color/std mode statistics cannot see —
  texture and high-frequency damage, the first casualty of stale block-cache
  deltas and int8 quantization.

Both are RELATIVE metrics: always report them against a reference set (real
draws from the data distribution, or the dense-DDPM sample set when isolating
what a speed knob costs). Absolute values are meaningless across different
feature seeds or image sizes.
"""

from __future__ import annotations

import jax
import numpy as np

# Pinned feature seed: every FD-rand number in the repo uses this key, so
# tables from different sessions are directly comparable.
FEATURE_SEED = 2026


def random_inception(seed: int = FEATURE_SEED):
    """The verified InceptionV3-FID graph (models/inception.py) with fixed
    seeded random init — the FD-rand feature extractor."""
    from duodiff_tpu.models.inception import init_inception

    return init_inception(jax.random.PRNGKey(seed))


def standardize_features(ref_feats: np.ndarray, feats_list):
    """Z-score every feature set by the REFERENCE set's per-dim stats.

    Random-init inception activations decay through the ~94 conv+frozen-BN
    layers to ~1e-4 scale (measured), so the raw Frechet distance lands at
    ~1e-6 — numerically valid but useless to report. Standardizing by the
    reference set makes FD-rand scale-free (comparable across seeds and
    image sizes) and whitens the per-dim contributions. The std floor keeps
    near-dead dims from amplifying float noise."""
    ref = np.asarray(ref_feats, np.float64)
    mu = ref.mean(axis=0)
    sd = ref.std(axis=0)
    sd = np.maximum(sd, 0.01 * sd.mean() + 1e-12)
    return [(np.asarray(f, np.float64) - mu) / sd for f in feats_list]


def fd_rand(
    images_a: np.ndarray,
    images_b: np.ndarray,
    batch_size: int = 32,
    seed: int = FEATURE_SEED,
    model_params=None,
) -> float:
    """Frechet distance between two image sets under seeded random pool3
    features, standardized by set a's per-dim statistics (see
    :func:`standardize_features`). images: (N, H, W, 3) float in [0, 1].

    Pass ``model_params=(model, params)`` (from :func:`random_inception`) to
    amortize the extractor across many calls.
    """
    from duodiff_tpu.evaluation.fid import extract_features, fid_from_features

    model, params = model_params if model_params else random_inception(seed)
    fa = extract_features(model, params, images_a, batch_size)
    fb = extract_features(model, params, images_b, batch_size)
    fa, fb = standardize_features(fa, [fa, fb])
    return fid_from_features(fa, fb)


# ---------------------------------------------------------------------------
# radial power spectrum
# ---------------------------------------------------------------------------


def radial_power_spectrum(images: np.ndarray) -> np.ndarray:
    """Mean radial log-power spectrum of an image set.

    images: (N, H, W, C) float in [0, 1] (H == W). Per image: channel-mean
    to grayscale, subtract the per-image mean (drop DC), |FFT2|^2, average
    over the set, then bin by integer radial frequency. Returns
    (H//2 - 1,) float64 of log10 mean power per radial band: entry k
    covers integer radii [k+1, k+2) — the radius-[0,1) band holds only the
    (removed) DC component on the integer frequency lattice, so it is
    dropped rather than reported as a sentinel.
    """
    imgs = np.asarray(images, np.float64)
    if imgs.ndim == 4:
        imgs = imgs.mean(axis=-1)
    n, h, w = imgs.shape
    if h != w:
        raise ValueError(f"radial spectrum needs square images, got {h}x{w}")
    imgs = imgs - imgs.mean(axis=(1, 2), keepdims=True)
    power = np.abs(np.fft.fft2(imgs)) ** 2
    power = power.mean(axis=0)

    f = np.fft.fftfreq(h) * h  # integer frequency lattice
    fx, fy = np.meshgrid(f, f, indexing="ij")
    r = np.sqrt(fx**2 + fy**2)
    nbins = h // 2
    bins = np.clip(r.astype(np.int64), 0, nbins)  # r in [k, k+1) -> bin k
    flat_bins = bins.ravel()
    flat_power = power.ravel()
    keep = (flat_bins < nbins) & (r.ravel() > 0)  # drop DC and corner tail
    sums = np.bincount(flat_bins[keep], weights=flat_power[keep],
                       minlength=nbins)
    counts = np.bincount(flat_bins[keep], minlength=nbins)
    mean_power = sums / np.maximum(counts, 1)
    return np.log10(mean_power + 1e-12)[1:]  # drop the empty DC-only band


def spectral_distance(images_a: np.ndarray, images_b: np.ndarray) -> float:
    """RMS distance between the two sets' mean radial log power spectra —
    in log10-power units, so 0.3 means ~2x power mismatch in an average
    radial band."""
    sa = radial_power_spectrum(images_a)
    sb = radial_power_spectrum(images_b)
    return float(np.sqrt(np.mean((sa - sb) ** 2)))

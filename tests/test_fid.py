"""FID subsystem tests: Inception graph shapes, Frechet math golden values,
and the end-to-end fid CLI path with random-init inception weights."""

import sys
from pathlib import Path

import numpy as np
import pytest

from duodiff_tpu.evaluation.fid import (
    compute_statistics,
    extract_features,
    fid_from_features,
    frechet_distance,
    read_samples,
)


def test_frechet_distance_identical_is_zero():
    rng = np.random.RandomState(0)
    f = rng.randn(500, 8)
    mu, s = compute_statistics(f)
    assert abs(frechet_distance(mu, s, mu, s)) < 1e-6


def test_frechet_distance_mean_shift_golden():
    # equal (identity-ish) covariances: FID == |mu1 - mu2|^2
    d = 4
    mu1, mu2 = np.zeros(d), np.full(d, 2.0)
    s = np.eye(d)
    got = frechet_distance(mu1, s, mu2, s)
    np.testing.assert_allclose(got, d * 4.0, rtol=1e-9)


def test_frechet_distance_covariance_golden():
    # 1-d gaussians: FID = (m1-m2)^2 + (sqrt(v1)-sqrt(v2))^2
    got = frechet_distance(np.array([1.0]), np.array([[4.0]]),
                           np.array([[0.0]]).ravel(), np.array([[9.0]]))
    np.testing.assert_allclose(got, 1.0 + (2.0 - 3.0) ** 2, rtol=1e-9)


def test_fid_from_features_separates_distributions():
    rng = np.random.RandomState(0)
    a = rng.randn(400, 16)
    b = rng.randn(400, 16) + 0.0
    c = rng.randn(400, 16) + 3.0
    near = fid_from_features(a, b)
    far = fid_from_features(a, c)
    assert near < 1.0 < far


@pytest.fixture(scope="module")
def inception():
    import jax

    from duodiff_tpu.models.inception import init_inception

    return init_inception(jax.random.PRNGKey(0))


def test_inception_shapes_and_param_count_abstract():
    """Graph wiring without the ~50s full-graph init compile: eval_shape
    traces init + apply abstractly. Covers the (2048,) pool3 feature shape
    and the ~21.8M-param structural check (every torchvision block made it
    into the port); the compiled-forward twin runs in the slow set."""
    import jax
    import jax.numpy as jnp

    from duodiff_tpu.models.inception import InceptionV3Features

    model = InceptionV3Features()
    x = jax.ShapeDtypeStruct((3, 299, 299, 3), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    n = sum(np.prod(p.shape)
            for p in jax.tree_util.tree_leaves(variables["params"]))
    assert 21.5e6 < n < 22.5e6, n / 1e6
    feats = jax.eval_shape(model.apply, variables, x)
    assert feats.shape == (3, 2048)


@pytest.mark.slow
def test_inception_feature_shape(inception):
    rng = np.random.RandomState(0)
    model, params = inception
    imgs = rng.rand(3, 32, 32, 3).astype(np.float32)
    feats = extract_features(model, params, imgs, batch_size=2)
    assert feats.shape == (3, 2048)
    assert np.all(np.isfinite(feats))


def test_real_stats_npz_roundtrip(tmp_path):
    """mu/sigma cached to .npz (pytorch-fid convention) reproduce the FID of
    a full two-sided computation exactly."""
    rng = np.random.RandomState(0)
    real = rng.randn(300, 16)
    fake = rng.randn(300, 16) + 1.0
    mu_r, s_r = compute_statistics(real)
    np.savez(tmp_path / "stats.npz", mu=mu_r, sigma=s_r)
    loaded = np.load(tmp_path / "stats.npz")
    mu_f, s_f = compute_statistics(fake)
    got = frechet_distance(loaded["mu"], loaded["sigma"], mu_f, s_f)
    want = fid_from_features(real, fake)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_read_samples_skips_grid(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    for name in ["0.png", "1.png", "grid_image.png"]:
        Image.fromarray(rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)).save(
            tmp_path / name
        )
    imgs = read_samples(tmp_path)
    assert imgs.shape == (2, 8, 8, 3)
    assert imgs.max() <= 1.0


@pytest.mark.slow
def test_inception_features_match_torch_graph(tmp_path):
    """Feature-level agreement between the Flax InceptionV3 and a plain-torch
    replica of the pytorch-fid graph (tests/torch_inception_ref.py), with
    every conv/BN tensor randomly initialized and converted through
    convert_inception_weights. This proves graph + converter end to end;
    with it, the only untested piece of the FID stack is the canonical
    weights file itself (unobtainable in this environment).
    Reference: fid.py:34-39 (torchmetrics FrechetInceptionDistance)."""
    import jax.numpy as jnp
    import torch

    from duodiff_tpu.models.inception import (
        convert_inception_weights,
        init_inception,
    )

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from torch_inception_ref import random_initialized

    tmodel = random_initialized(seed=0)
    wpath = tmp_path / "fid_inception_random.pth"
    torch.save(tmodel.state_dict(), wpath)

    model, template = init_inception()
    params = convert_inception_weights(str(wpath), template)

    rng = np.random.RandomState(42)
    x = rng.uniform(-1.0, 1.0, size=(2, 299, 299, 3)).astype(np.float32)
    with torch.no_grad():
        feats_t = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    feats_j = np.asarray(model.apply({"params": params}, jnp.asarray(x)))

    assert feats_t.shape == feats_j.shape == (2, 2048)
    err = np.max(np.abs(feats_t - feats_j))
    assert err < 1e-4, f"torch/flax feature mismatch: max abs err {err}"


def test_inception_preprocess_matches_torch_interpolate():
    """preprocess (jax.image.resize bilinear, half-pixel centers) must match
    pytorch-fid's F.interpolate(..., mode='bilinear', align_corners=False)
    resize-to-299 + [-1,1] rescale."""
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from duodiff_tpu.models.inception import preprocess

    rng = np.random.RandomState(7)
    img = rng.uniform(0.0, 1.0, size=(2, 64, 64, 3)).astype(np.float32)
    ours = np.asarray(preprocess(jnp.asarray(img)))
    t = F.interpolate(
        torch.from_numpy(img.transpose(0, 3, 1, 2)), size=(299, 299),
        mode="bilinear", align_corners=False,
    ).numpy().transpose(0, 2, 3, 1)
    theirs = 2.0 * t - 1.0
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)

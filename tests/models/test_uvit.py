"""U-ViT model tests (modelled on reference tests/models/test_uvit.py:82-108,
extended with patchify round-trips and class-conditional coverage)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from duodiff_tpu.config import UViTConfig
from duodiff_tpu.models import UViT, init_uvit, patchify, unpatchify
from duodiff_tpu.models.layers import timestep_embedding

# Mirrors the hard-coded test configs in reference tests/models/test_uvit.py:8-62,
# shrunk where possible for CPU test speed.
CIFAR10_CONFIG = UViTConfig(
    img_size=32, patch_size=2, in_chans=3, embed_dim=64, depth=5, num_heads=4,
    mlp_ratio=4, qkv_bias=False, mlp_time_embed=False, num_classes=-1,
    normalize_timesteps=True,
)
CELEBA_CONFIG = UViTConfig(
    img_size=64, patch_size=4, in_chans=3, embed_dim=64, depth=5, num_heads=4,
    mlp_ratio=4, qkv_bias=False, mlp_time_embed=False, num_classes=-1,
    normalize_timesteps=True,
)
IMAGENET_CLASS_COND_CONFIG = UViTConfig(
    img_size=64, patch_size=4, in_chans=3, embed_dim=64, depth=5, num_heads=4,
    mlp_ratio=4, qkv_bias=False, mlp_time_embed=False, num_classes=1000,
    normalize_timesteps=False,
)


def test_patchify_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3), jnp.float32)
    tokens = patchify(x, 2)
    assert tokens.shape == (2, 16, 12)
    back = unpatchify(tokens, 3)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_patchify_token_ordering():
    # token layout must be (p1 p2 C): pixel (0,1) channel 2 of patch (0,0)
    # lands at flat index 1*C + 2 within token 0.
    x = np.zeros((1, 4, 4, 3), np.float32)
    x[0, 0, 1, 2] = 7.0
    tokens = patchify(jnp.asarray(x), 2)
    assert float(tokens[0, 0, 1 * 3 + 2]) == 7.0


def test_timestep_embedding_matches_reference_formula():
    t = jnp.array([0.0, 0.5, 999.0])
    emb = timestep_embedding(t, 8)
    assert emb.shape == (3, 8)
    half = 4
    freqs = np.exp(-np.log(10000) * np.arange(half) / half)
    args = np.asarray(t)[:, None] * freqs[None]
    want = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    np.testing.assert_allclose(np.asarray(emb), want, rtol=1e-5, atol=1e-6)
    # odd dim gets zero-padded (reference models/uvit.py:113-114)
    emb9 = timestep_embedding(t, 9)
    assert emb9.shape == (3, 9)
    np.testing.assert_allclose(np.asarray(emb9[:, -1]), 0.0)


@pytest.mark.parametrize(
    "config", [CIFAR10_CONFIG, CELEBA_CONFIG], ids=["cifar10", "celeba"]
)
def test_uvit_output_shape(config):
    model, params = init_uvit(config, jax.random.PRNGKey(0))
    x = jnp.zeros((2, config.img_size, config.img_size, config.in_chans))
    t = jnp.ones((2,))
    y = model.apply({"params": params}, x, t)
    assert y.shape == x.shape
    assert jnp.all(jnp.isfinite(y))


def test_uvit_class_conditional():
    config = IMAGENET_CLASS_COND_CONFIG
    model, params = init_uvit(config, jax.random.PRNGKey(0))
    x = jnp.zeros((2, 64, 64, 3))
    t = jnp.ones((2,))
    y = jnp.array([3, 999])
    out = model.apply({"params": params}, x, t, y)
    assert out.shape == x.shape
    # label must change the output
    out2 = model.apply({"params": params}, x, t, jnp.array([5, 42]))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_uvit_backward():
    # gradient plumbing (reference tests/models/test_uvit.py:96-108)
    config = CIFAR10_CONFIG
    model, params = init_uvit(config, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
    t = jnp.ones((2,))

    def loss_fn(p):
        return jnp.sum(model.apply({"params": p}, x, t))

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # every parameter receives gradient signal somewhere
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0


def test_uvit_bf16_compute_close_to_fp32():
    config = CIFAR10_CONFIG
    model32, params = init_uvit(config, jax.random.PRNGKey(0))
    model16 = UViT(config=config, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
    t = jnp.full((2,), 500.0)
    y32 = model32.apply({"params": params}, x, t)
    y16 = model16.apply({"params": params}, x, t)
    assert y16.dtype == jnp.float32  # outputs are upcast
    assert np.max(np.abs(np.asarray(y32) - np.asarray(y16))) < 0.15


def test_uvit_timestep_normalization_changes_embedding():
    cfg_norm = CIFAR10_CONFIG
    model, params = init_uvit(cfg_norm, jax.random.PRNGKey(0))
    x = jnp.zeros((1, 32, 32, 3))
    a = model.apply({"params": params}, x, jnp.array([999.0]))
    b = model.apply({"params": params}, x, jnp.array([0.0]))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_use_checkpoint_same_params_outputs_and_grads():
    """--use_checkpoint (per-block remat, reference models/uvit.py:197-201)
    must be a pure memory/FLOPs trade: identical param structure (checkpoints
    interchangeable), identical forward, and matching gradients."""
    config = UViTConfig(
        img_size=32, patch_size=8, in_chans=3, embed_dim=32, depth=3,
        num_heads=2, mlp_ratio=2, num_classes=-1, normalize_timesteps=True,
    )
    model, params = init_uvit(config, jax.random.PRNGKey(0))
    model_r, params_r = init_uvit(
        config, jax.random.PRNGKey(0), use_checkpoint=True
    )
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_r
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params_r)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    x = jnp.asarray(np.random.RandomState(1).randn(2, 32, 32, 3), jnp.float32)
    t = jnp.full((2,), 417.0)
    out = model.apply({"params": params}, x, t)
    out_r = model_r.apply({"params": params}, x, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-6)

    def loss(m):
        def f(p):
            return jnp.mean(m.apply({"params": p}, x, t) ** 2)
        return f

    g = jax.jit(jax.grad(loss(model)))(params)
    g_r = jax.jit(jax.grad(loss(model_r)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


@pytest.mark.slow  # default-set coverage: test_use_checkpoint_same_params_outputs_and_grads (backbone)
def test_use_checkpoint_early_exit_grads():
    """Remat composes with the EarlyExitUViT wrapper (probes/heads read
    block-boundary activations, which remat keeps live)."""
    from duodiff_tpu.models.early_exit import init_early_exit_uvit

    cfg = UViTConfig(
        img_size=8, patch_size=4, in_chans=3, embed_dim=64, depth=3,
        num_heads=4, mlp_ratio=2, num_classes=-1, normalize_timesteps=True,
        classifier_type="mlp_probe_per_layer",
    )
    model, params = init_early_exit_uvit(cfg, jax.random.PRNGKey(0))
    model_r, _ = init_early_exit_uvit(
        cfg, jax.random.PRNGKey(0), use_checkpoint=True
    )
    x = jnp.asarray(np.random.RandomState(2).randn(2, 8, 8, 3), jnp.float32)
    t = jnp.full((2,), 100.0)

    def loss(m):
        def f(p):
            bb, u, g = m.apply({"params": p}, x, t)
            return jnp.mean(bb**2) + jnp.mean(u) + jnp.mean(g**2)
        return f

    g0 = jax.jit(jax.grad(loss(model)))(params)
    g1 = jax.jit(jax.grad(loss(model_r)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )

"""EarlyExitUViT tests (modelled on reference tests/models/test_early_exit.py:71-115,
parametrized over all four classifier types, plus table-gather coverage the
reference cannot have)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from duodiff_tpu.config import UViTConfig
from duodiff_tpu.models.early_exit import (
    CLASSIFIER_TYPES,
    AttentionProbe,
    MLPProbe,
    OutputHead,
    init_early_exit_uvit,
)

BASE = dict(
    img_size=32, patch_size=2, in_chans=3, embed_dim=64, depth=5, num_heads=4,
    mlp_ratio=4, qkv_bias=False, mlp_time_embed=False, num_classes=-1,
    normalize_timesteps=True,
)


def test_output_head_shape():
    # (B, 1+256, D) -> (B, 32, 32, 3) with extras=1
    head = OutputHead(patch_dim=2 * 2 * 3, in_chans=3, extras=1)
    x = jnp.zeros((2, 257, 64))
    params = head.init(jax.random.PRNGKey(0), x)["params"]
    y = head.apply({"params": params}, x)
    assert y.shape == (2, 32, 32, 3)


def test_mlp_probe_shape_and_range():
    probe = MLPProbe()
    x = jnp.asarray(np.random.RandomState(0).randn(3, 17, 64), jnp.float32)
    params = probe.init(jax.random.PRNGKey(0), x)["params"]
    u = probe.apply({"params": params}, x)
    assert u.shape == (3,)
    assert np.all((np.asarray(u) > 0) & (np.asarray(u) < 1))  # sigmoid-mean


def test_attention_probe_shape():
    probe = AttentionProbe()
    x = jnp.asarray(np.random.RandomState(0).randn(3, 17, 64), jnp.float32)
    params = probe.init(jax.random.PRNGKey(0), x)["params"]
    u = probe.apply({"params": params}, x)
    assert u.shape == (3,)


@pytest.mark.parametrize("classifier_type", CLASSIFIER_TYPES)
def test_early_exit_uvit_forward(classifier_type):
    cfg = UViTConfig(**BASE, classifier_type=classifier_type)
    model, params = init_early_exit_uvit(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
    t = jnp.array([7.0, 993.0])
    bb, u, g = model.apply({"params": params}, x, t)
    assert bb.shape == x.shape
    assert u.shape == (cfg.depth, 2)
    assert g.shape == (cfg.depth, 2, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(bb)))
    assert np.all(np.isfinite(np.asarray(u)))


def test_early_exit_uvit_backward():
    cfg = UViTConfig(**BASE, classifier_type="mlp_probe_per_layer")
    model, params = init_early_exit_uvit(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
    t = jnp.array([7.0, 993.0])

    def loss_fn(p):
        bb, u, g = model.apply({"params": p}, x, t)
        return jnp.sum(bb) + jnp.sum(u) + jnp.sum(g)

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # probes and heads both receive gradients
    assert float(jnp.abs(grads["probes"]["classifier"]["kernel"]).sum()) > 0
    assert float(jnp.abs(grads["heads"]["decoder_pred"]["kernel"]).sum()) > 0


def test_per_timestep_probe_gathers_per_sample():
    """Unlike the reference (which applies sample 0's timestep probe to the
    whole batch, models/early_exit.py:269), our table gathers per sample:
    two samples with different t must produce different probe outputs while
    identical t produces identical ones."""
    cfg = UViTConfig(**BASE, classifier_type="mlp_probe_per_timestep")
    model, params = init_early_exit_uvit(cfg, jax.random.PRNGKey(0))
    x0 = np.random.RandomState(0).randn(1, 32, 32, 3).astype(np.float32)
    x = jnp.asarray(np.concatenate([x0, x0], axis=0))
    # same input, different timestep: probe rows differ (different table row),
    # also the time token differs. Isolate the table by comparing u directly
    # between (t, t) and (t, t') pairs on the same x rows.
    _, u_same, _ = model.apply({"params": params}, x, jnp.array([500.0, 500.0]))
    np.testing.assert_allclose(np.asarray(u_same[:, 0]), np.asarray(u_same[:, 1]), rtol=1e-5)
    _, u_diff, _ = model.apply({"params": params}, x, jnp.array([500.0, 501.0]))
    assert not np.allclose(np.asarray(u_diff[:, 0]), np.asarray(u_diff[:, 1]))


def test_early_exit_class_conditional():
    cfg = UViTConfig(**{**BASE, "num_classes": 10},
                     classifier_type="mlp_probe_per_layer")
    model, params = init_early_exit_uvit(cfg, jax.random.PRNGKey(0))
    x = jnp.zeros((2, 32, 32, 3))
    t = jnp.ones((2,))
    y = jnp.array([1, 5])
    bb, u, g = model.apply({"params": params}, x, t, y)
    assert bb.shape == x.shape and u.shape == (5, 2)

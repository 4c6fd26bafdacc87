"""Heads-layout attention params: Megatron-style tensor parallelism.

The "heads" qkv layout (models/layers._QKVProj: kernel (D, 3, H, Dh) /
proj (H, Dh, D)) stores the same values as the reference-packed (D, 3D)
layout but exposes the head axis to GSPMD, so a TP mesh shards whole heads
(column-parallel qkv, row-parallel proj — SURVEY.md §2b's "TPU-native
equivalents"). These tests pin (1) bit-exact layout equivalence, (2) the
head-aligned partition specs, and (3) the collective signature under TP:
ZERO all-gathers (the packed layout's column shards cross q/k/v boundaries
and force GSPMD to all-gather the weights every step)."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from duodiff_tpu.config import UViTConfig
from duodiff_tpu.models.early_exit import init_early_exit_uvit
from duodiff_tpu.models.uvit import init_uvit
from duodiff_tpu.parallel import batch_sharding, create_mesh, shard_params
from duodiff_tpu.utils.param_layout import (
    qkv_heads_to_packed,
    qkv_packed_to_heads,
)


@pytest.fixture(scope="module")
def cfg():
    return UViTConfig(
        img_size=16, patch_size=2, in_chans=3, embed_dim=128, depth=5,
        num_heads=4, mlp_ratio=4, qkv_bias=True, num_classes=-1,
        normalize_timesteps=True,
    )


@pytest.fixture(scope="module")
def packed(cfg):
    return init_uvit(cfg, jax.random.PRNGKey(0))


def test_layout_conversion_bit_exact_forward(cfg, packed):
    model_p, params_p = packed
    model_h, _ = init_uvit(cfg, jax.random.PRNGKey(0), qkv_layout="heads")
    params_h = qkv_packed_to_heads(params_p, cfg.num_heads)

    # converted tree matches a natively-initialized heads tree exactly
    native = model_h.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,))
    )["params"]
    assert jax.tree_util.tree_structure(params_h) == (
        jax.tree_util.tree_structure(native)
    )
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(params_h),
        jax.tree_util.tree_leaves_with_path(native),
    ):
        assert a.shape == b.shape, (kp, a.shape, b.shape)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.full((2,), 417.0)
    y_p = model_p.apply({"params": params_p}, x, t)
    y_h = model_h.apply({"params": params_h}, x, t)
    np.testing.assert_array_equal(np.asarray(y_p), np.asarray(y_h))

    # round trip is exact
    rt = qkv_heads_to_packed(params_h, cfg.num_heads)
    for a, b in zip(
        jax.tree_util.tree_leaves(rt), jax.tree_util.tree_leaves(params_p)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_heads_layout_fused_raw_path_matches_packed(cfg, packed):
    """The fused-kernel raw path re-packs the heads params at trace time —
    same values, so identical outputs (interpret mode off-TPU)."""
    _, params_p = packed
    params_h = qkv_packed_to_heads(params_p, cfg.num_heads)
    mf_p, _ = init_uvit(
        cfg, jax.random.PRNGKey(0), attn_impl="fused", mlp_impl="fused"
    )
    mf_h, _ = init_uvit(
        cfg, jax.random.PRNGKey(0), attn_impl="fused", mlp_impl="fused",
        qkv_layout="heads",
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.full((2,), 31.0)
    y_p = mf_p.apply({"params": params_p}, x, t)
    y_h = mf_h.apply({"params": params_h}, x, t)
    np.testing.assert_array_equal(np.asarray(y_p), np.asarray(y_h))


def test_heads_layout_early_exit_forward(cfg):
    eecfg = UViTConfig(**{
        **{f: getattr(cfg, f) for f in (
            "img_size", "patch_size", "in_chans", "embed_dim", "depth",
            "num_heads", "mlp_ratio", "qkv_bias", "num_classes",
            "normalize_timesteps",
        )},
        "classifier_type": "mlp_probe_per_layer",
    })
    model_p, params_p = init_early_exit_uvit(eecfg, jax.random.PRNGKey(0))
    model_h, _ = init_early_exit_uvit(
        eecfg, jax.random.PRNGKey(0), qkv_layout="heads"
    )
    params_h = qkv_packed_to_heads(params_p, eecfg.num_heads)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.full((2,), 101.0)
    out_p = model_p.apply({"params": params_p}, x, t)
    out_h = model_h.apply({"params": params_h}, x, t)
    for a, b in zip(jax.tree_util.tree_leaves(out_p),
                    jax.tree_util.tree_leaves(out_h)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_heads_layout_partition_specs(cfg, packed):
    _, params_p = packed
    params_h = qkv_packed_to_heads(params_p, cfg.num_heads)
    mesh = create_mesh(shape=(4, 2))
    sh = shard_params(params_h, mesh)
    attn = sh["in_blocks_0"]["attn"]
    assert attn["qkv"]["kernel"].spec == P(None, None, "model", None)
    assert attn["qkv"]["bias"].spec == P(None, "model", None)
    assert attn["proj"]["kernel"].spec == P("model", None, None)
    # packed layout still gets its (correct-but-gathering) column specs
    sp = shard_params(params_p, mesh)
    assert sp["in_blocks_0"]["attn"]["qkv"]["kernel"].spec == P(None, "model")


def _collective_counts(model, params, mesh):
    shardings = shard_params(params, mesh)
    params = jax.device_put(params, shardings)
    xb = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(2), (8, 16, 16, 3)),
        batch_sharding(mesh),
    )
    t = jnp.full((8,), 5.0)
    f = jax.jit(
        lambda p, x, t: model.apply({"params": p}, x, t),
        in_shardings=(shardings, batch_sharding(mesh), None),
    )
    txt = f.lower(params, xb, t).compile().as_text()
    return (
        len(re.findall(r"all-gather", txt)),
        len(re.findall(r"all-reduce", txt)),
    )


def test_heads_layout_tp_has_zero_all_gathers(cfg, packed):
    """The Megatron signature: under a (data, model) mesh the heads layout
    compiles to ONLY the per-sublayer psum all-reduces — zero all-gathers —
    while the packed layout must gather its misaligned weight shards."""
    model_p, params_p = packed
    model_h, _ = init_uvit(cfg, jax.random.PRNGKey(0), qkv_layout="heads")
    params_h = qkv_packed_to_heads(params_p, cfg.num_heads)
    mesh = create_mesh(shape=(4, 2))

    ag_h, ar_h = _collective_counts(model_h, params_h, mesh)
    assert ag_h == 0, f"heads layout should not all-gather, found {ag_h}"
    assert ar_h > 0, "expected row-parallel psum all-reduces"

    ag_p, _ = _collective_counts(model_p, params_p, mesh)
    assert ag_p > 0, (
        "packed layout unexpectedly gather-free — if GSPMD learned to "
        "shard it head-aligned, the heads layout may be retired"
    )


def test_tp_saved_checkpoint_loads_single_chip(cfg, packed, tmp_path):
    """--model_parallel training saves params in the heads layout; a
    single-chip (packed) sampler must load that checkpoint transparently
    (load_params_flexible normalizes via match_attention_layout)."""
    import orbax.checkpoint as ocp

    from duodiff_tpu.training.trainer import load_params_flexible

    model_p, params_p = packed
    params_h = qkv_packed_to_heads(params_p, cfg.num_heads)
    ckpt = tmp_path / "tp_ckpt"
    ocp.Checkpointer(ocp.PyTreeCheckpointHandler()).save(
        ckpt.resolve(), {"params": params_h, "step": 7}
    )

    loaded = load_params_flexible(str(ckpt), params_p)
    for a, b in zip(
        jax.tree_util.tree_leaves(loaded), jax.tree_util.tree_leaves(params_p)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and the reverse: a packed checkpoint loads into a heads template
    ckpt2 = tmp_path / "packed_ckpt"
    ocp.Checkpointer(ocp.PyTreeCheckpointHandler()).save(
        ckpt2.resolve(), {"params": params_p, "step": 7}
    )
    loaded_h = load_params_flexible(str(ckpt2), params_h)
    for a, b in zip(
        jax.tree_util.tree_leaves(loaded_h), jax.tree_util.tree_leaves(params_h)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_rejects_shape_mismatch(cfg, packed, tmp_path):
    """Leaf-shape validation (the docstring's promise): loading a checkpoint
    of a different geometry must raise a clear error, not defer to an
    obscure apply-time failure."""
    import dataclasses

    import orbax.checkpoint as ocp

    from duodiff_tpu.training.trainer import load_params_flexible

    _, params_p = packed
    ckpt = tmp_path / "ckpt"
    ocp.Checkpointer(ocp.PyTreeCheckpointHandler()).save(
        ckpt.resolve(), {"params": params_p}
    )
    other_cfg = dataclasses.replace(cfg, embed_dim=64, num_heads=2)
    _, other_params = init_uvit(other_cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="shapes do not match"):
        load_params_flexible(str(ckpt), other_params)

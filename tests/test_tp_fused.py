"""TP x fused kernels: shard_map sublayers on head-/hidden-sharded weights.

Round 2 left tensor parallelism and the fused Pallas sublayer kernels
non-composable (the kernels consumed packed (D, 3D) weights, which under TP
meant an all-gather repack every step). parallel/tp_fused.py runs the same
kernels per model-shard on the LOCAL heads / hidden slice (kernels
generalized to rectangular weights + residual=False partials) with only the
two Megatron row-parallel psums as collectives. These tests pin:

1. value equivalence vs the single-chip fused sublayers (fp32),
2. gradient equivalence (weights AND the residual stream),
3. full-UViT forward/grad equivalence through the Block TP branch,
4. the collective signature of a compiled TP train step with
   attn_impl="fused": ZERO all-gathers (mirroring
   test_qkv_layout.test_heads_layout_tp_has_zero_all_gathers for XLA).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from duodiff_tpu.config import UViTConfig
from duodiff_tpu.models.uvit import init_uvit
from duodiff_tpu.ops.pallas_block import (
    fused_attn_sublayer,
    fused_mlp_sublayer,
)
from duodiff_tpu.parallel import batch_sharding, create_mesh, shard_params
from duodiff_tpu.parallel.tp_fused import (
    tp_fused_attn_sublayer,
    tp_fused_mlp_sublayer,
)
from duodiff_tpu.utils.param_layout import qkv_packed_to_heads

B, L, D, H = 8, 17, 32, 4
DH = D // H
HIDDEN = 4 * D


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(shape=(4, 2))


def _attn_params(key):
    ks = jax.random.split(key, 6)
    return dict(
        ln_scale=1.0 + 0.1 * jax.random.normal(ks[0], (D,)),
        ln_bias=0.1 * jax.random.normal(ks[1], (D,)),
        qkv=jax.random.normal(ks[2], (D, 3 * D)) * 0.2,
        qkv_b=jax.random.normal(ks[3], (3 * D,)) * 0.1,
        proj=jax.random.normal(ks[4], (D, D)) * 0.2,
        proj_b=jax.random.normal(ks[5], (D,)) * 0.1,
    )


def _heads_view(p):
    """Packed (D, 3D)/(D, D) -> heads (D, 3, H, Dh)/(H, Dh, D)."""
    return (
        p["qkv"].reshape(D, 3, H, DH),
        p["qkv_b"].reshape(3, H, DH),
        p["proj"].reshape(H, DH, D),
    )


def test_tp_attn_sublayer_matches_single(mesh):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, D))
    p = _attn_params(jax.random.PRNGKey(1))
    ref = fused_attn_sublayer(
        x, p["ln_scale"], p["ln_bias"], p["qkv"], p["qkv_b"], p["proj"],
        p["proj_b"], num_heads=H, interpret=True,
    )
    wq, bq, wp = _heads_view(p)
    got = tp_fused_attn_sublayer(
        x, p["ln_scale"], p["ln_bias"], wq, bq, wp, p["proj_b"],
        mesh=mesh, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_tp_attn_sublayer_no_qkv_bias(mesh):
    x = jax.random.normal(jax.random.PRNGKey(2), (B, L, D))
    p = _attn_params(jax.random.PRNGKey(3))
    ref = fused_attn_sublayer(
        x, p["ln_scale"], p["ln_bias"], p["qkv"], None, p["proj"],
        p["proj_b"], num_heads=H, interpret=True,
    )
    wq, _, wp = _heads_view(p)
    got = tp_fused_attn_sublayer(
        x, p["ln_scale"], p["ln_bias"], wq, None, wp, p["proj_b"],
        mesh=mesh, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_tp_mlp_sublayer_matches_single(mesh):
    ks = jax.random.split(jax.random.PRNGKey(4), 7)
    x = jax.random.normal(ks[0], (B, L, D))
    g = 1.0 + 0.1 * jax.random.normal(ks[1], (D,))
    b = 0.1 * jax.random.normal(ks[2], (D,))
    w1 = jax.random.normal(ks[3], (D, HIDDEN)) * 0.2
    b1 = jax.random.normal(ks[4], (HIDDEN,)) * 0.1
    w2 = jax.random.normal(ks[5], (HIDDEN, D)) * 0.2
    b2 = jax.random.normal(ks[6], (D,)) * 0.1
    ref = fused_mlp_sublayer(x, g, b, w1, b1, w2, b2, interpret=True)
    got = tp_fused_mlp_sublayer(x, g, b, w1, b1, w2, b2, mesh=mesh,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_tp_attn_sublayer_grads_match(mesh):
    x = jax.random.normal(jax.random.PRNGKey(5), (B, L, D))
    p = _attn_params(jax.random.PRNGKey(6))

    from duodiff_tpu.ops.pallas_block import fused_attn_sublayer_trainable

    def loss_single(x, qkv, proj):
        y = fused_attn_sublayer_trainable(
            x, p["ln_scale"], p["ln_bias"], qkv, p["qkv_b"], proj,
            p["proj_b"], H, 1e-5, True,
        )
        return jnp.sum(y * jnp.cos(y))  # nontrivial cotangent

    def loss_tp(x, qkv_h, proj_h):
        y = tp_fused_attn_sublayer(
            x, p["ln_scale"], p["ln_bias"], qkv_h,
            p["qkv_b"].reshape(3, H, DH), proj_h, p["proj_b"],
            mesh=mesh, interpret=True,
        )
        return jnp.sum(y * jnp.cos(y))

    dx_s, dq_s, dp_s = jax.grad(loss_single, argnums=(0, 1, 2))(
        x, p["qkv"], p["proj"]
    )
    dx_t, dq_t, dp_t = jax.grad(loss_tp, argnums=(0, 1, 2))(
        x, p["qkv"].reshape(D, 3, H, DH), p["proj"].reshape(H, DH, D)
    )
    np.testing.assert_allclose(np.asarray(dx_t), np.asarray(dx_s), atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(dq_t.reshape(D, 3 * D)), np.asarray(dq_s), atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(dp_t.reshape(D, D)), np.asarray(dp_s), atol=3e-4
    )


@pytest.fixture(scope="module")
def tp_model(mesh):
    cfg = UViTConfig(
        img_size=16, patch_size=2, in_chans=3, embed_dim=D, depth=3,
        num_heads=H, mlp_ratio=4, qkv_bias=True, num_classes=-1,
        normalize_timesteps=True,
    )
    model_p, params_p = init_uvit(
        cfg, jax.random.PRNGKey(0), attn_impl="fused", mlp_impl="fused"
    )
    model_tp, _ = init_uvit(
        cfg, jax.random.PRNGKey(0), attn_impl="fused", mlp_impl="fused",
        qkv_layout="heads", tp_mesh=mesh,
    )
    params_h = qkv_packed_to_heads(params_p, cfg.num_heads)
    return cfg, model_p, params_p, model_tp, params_h


def test_uvit_tp_fused_forward_matches(tp_model):
    _, model_p, params_p, model_tp, params_h = tp_model
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 16, 16, 3))
    t = jnp.full((B,), 417.0)
    y_ref = model_p.apply({"params": params_p}, x, t)
    y_tp = model_tp.apply({"params": params_h}, x, t)
    np.testing.assert_allclose(
        np.asarray(y_tp), np.asarray(y_ref), atol=5e-5
    )


@pytest.mark.slow
def test_uvit_tp_fused_grads_match(tp_model):
    # slow set: full-model gradient equivalence; the default run keeps the
    # sublayer grad test + the CLI TP-vs-DP loss equality (test_cli)
    _, model_p, params_p, model_tp, params_h = tp_model
    x = jax.random.normal(jax.random.PRNGKey(2), (B, 16, 16, 3))
    t = jnp.full((B,), 93.0)

    g_ref = jax.grad(
        lambda p: jnp.mean(model_p.apply({"params": p}, x, t) ** 2)
    )(params_p)
    g_tp = jax.grad(
        lambda p: jnp.mean(model_tp.apply({"params": p}, x, t) ** 2)
    )(params_h)
    from duodiff_tpu.utils.param_layout import qkv_heads_to_packed

    g_tp_packed = qkv_heads_to_packed(g_tp, H)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_tp_packed),
        jax.tree_util.tree_leaves_with_path(g_ref),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, err_msg=str(kp)
        )


def test_tp_fused_train_step_zero_weight_all_gathers(tp_model, mesh):
    """The headline assertion: a compiled TP fwd+bwd step with
    attn_impl='fused' moves NO weights — zero all-gathers, only the
    row-parallel psum / grad-reduction all-reduces."""
    _, _, _, model_tp, params_h = tp_model
    shardings = shard_params(params_h, mesh)
    params = jax.device_put(params_h, shardings)
    xb = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(3), (B, 16, 16, 3)),
        batch_sharding(mesh),
    )
    t = jnp.full((B,), 5.0)

    def loss(p, x, t):
        return jnp.mean(model_tp.apply({"params": p}, x, t) ** 2)

    f = jax.jit(
        jax.grad(loss),
        in_shardings=(shardings, batch_sharding(mesh), None),
    )
    txt = f.lower(params, xb, t).compile().as_text()
    n_ag = len(re.findall(r"all-gather", txt))
    n_ar = len(re.findall(r"all-reduce", txt))
    assert n_ag == 0, f"TP fused step should not all-gather, found {n_ag}"
    assert n_ar > 0, "expected row-parallel psums / grad all-reduces"

"""Tensor-parallel fused sublayers: shard_map over the "model" axis.

The fused Pallas sublayer kernels (ops/pallas_block.py) consume packed
(D, 3A)/(A, D) attention weights and (D, hidden)/(hidden, D) MLP weights.
Under tensor parallelism the params live in the "heads" layout with the
head / hidden axis sharded over "model" (parallel/mesh.py rules) — and
naively repacking them for the kernel would all-gather every weight every
step (the round-2 limitation: training/trainer.py used to warn and fall
back to XLA attention under TP).

This module runs the SAME kernels inside ``jax.shard_map`` instead: each
model shard passes its local heads (A = D/mp) / local hidden slice straight
into the kernel — the kernels are shape-general (head_dim static,
rectangular weights) and emit the bare projection partial (residual=False);
the only collectives are the two Megatron row-parallel psums, exactly as in
the unfused heads-layout path. No weight ever moves.

Math per shard (attention): partial_s = proj_s(SDPA_s(qkv_s(LN(x)))) over
the shard's heads; y = x + psum_s(partial_s) + proj_bias. LN is computed
redundantly per shard (tiny VPU work vs an extra collective). MLP:
partial_s = fc2_s(gelu(fc1_s(LN(x)))) over the shard's hidden columns.

Numerics vs the single-chip fused kernel: the partial is rounded to the
activation dtype before the psum and the residual/bias add happens in fp32
outside the kernel — the standard TP reduction contract (bf16 partials on
the wire), bit-identical in fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from duodiff_tpu.ops.pallas_block import (
    fused_attn_sublayer_trainable,
    fused_mlp_sublayer_trainable,
)


def _batch_spec(mesh: Mesh, axis: str, batch: int):
    """Partition entry for the batch dim: every non-model mesh axis
    (("dcn", "data") hybrid / "data" single-host), matching
    parallel.mesh.batch_sharding. Falls back to replicated (None) when the
    batch doesn't divide the data shards — e.g. the B=1 dummy batch of
    ``model.init`` — which is correct (each shard then computes the full
    batch; the psum is only over the model axis) just not data-parallel."""
    axes = tuple(a for a in mesh.axis_names if a != axis)
    n = 1
    for a in axes:
        n *= mesh.shape[a]
    if batch % n != 0:
        return None
    return axes if len(axes) > 1 else axes[0]


def tp_fused_attn_sublayer(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    qkv_kernel: jax.Array,   # (D, 3, H, Dh), H sharded over `axis`
    qkv_bias,                # (3, H, Dh) or None
    proj_kernel: jax.Array,  # (H, Dh, D)
    proj_bias: jax.Array,    # (D,), replicated
    *,
    mesh: Mesh,
    axis: str = "model",
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """``x + proj(SDPA(qkv(LN(x))))`` with head-sharded weights, fused
    kernels per shard, one psum."""
    d = x.shape[-1]
    dh = qkv_kernel.shape[3]
    bspec = _batch_spec(mesh, axis, x.shape[0])
    has_bias = qkv_bias is not None

    def body(xb, g, b, wq, bq, wp):
        h_loc = wq.shape[2]
        wq_p = wq.reshape(d, 3 * h_loc * dh)     # local (K H_loc Dh) packing
        bq_p = bq.reshape(3 * h_loc * dh) if has_bias else None
        wp_p = wp.reshape(h_loc * dh, d)
        partial = fused_attn_sublayer_trainable(
            xb, g, b, wq_p, bq_p, wp_p, jnp.zeros((d,), jnp.float32),
            h_loc, eps, interpret, "v2", dh, False,
        )
        return jax.lax.psum(partial, axis)

    in_specs = [
        P(bspec, None, None), P(None), P(None),
        P(None, None, axis, None),   # qkv kernel: heads sharded
        P(None, axis, None),         # qkv bias (dropped when absent)
        P(axis, None, None),         # proj kernel: heads sharded
    ]
    if not has_bias:
        # drop the bias slot entirely (shard_map specs must match args)
        def body_nb(xb, g, b, wq, wp):
            return body(xb, g, b, wq, None, wp)

        out = jax.shard_map(
            body_nb, mesh=mesh,
            in_specs=tuple(in_specs[:4] + [in_specs[5]]),
            out_specs=P(bspec, None, None), check_vma=False,
        )(x, ln_scale, ln_bias, qkv_kernel, proj_kernel)
    else:
        out = jax.shard_map(
            body, mesh=mesh, in_specs=tuple(in_specs),
            out_specs=P(bspec, None, None), check_vma=False,
        )(x, ln_scale, ln_bias, qkv_kernel, qkv_bias, proj_kernel)
    return (
        x.astype(jnp.float32) + out.astype(jnp.float32)
        + proj_bias.astype(jnp.float32)
    ).astype(x.dtype)


def tp_fused_mlp_sublayer(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    fc1_kernel: jax.Array,  # (D, hidden), hidden sharded over `axis`
    fc1_bias: jax.Array,    # (hidden,)
    fc2_kernel: jax.Array,  # (hidden, D)
    fc2_bias: jax.Array,    # (D,), replicated
    *,
    mesh: Mesh,
    axis: str = "model",
    eps: float = 1e-5,
    gelu_approx: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """``x + fc2(gelu(fc1(LN(x))))`` with hidden-sharded weights, fused
    kernels per shard, one psum."""
    d = x.shape[-1]
    bspec = _batch_spec(mesh, axis, x.shape[0])

    def body(xb, g, b, w1, b1, w2):
        partial = fused_mlp_sublayer_trainable(
            xb, g, b, w1, b1, w2, jnp.zeros((d,), jnp.float32),
            eps, gelu_approx, interpret, False,
        )
        return jax.lax.psum(partial, axis)

    out = jax.shard_map(
        body, mesh=mesh,
        in_specs=(
            P(bspec, None, None), P(None), P(None),
            P(None, axis), P(axis), P(axis, None),
        ),
        out_specs=P(bspec, None, None), check_vma=False,
    )(x, ln_scale, ln_bias, fc1_kernel, fc1_bias, fc2_kernel)
    return (
        x.astype(jnp.float32) + out.astype(jnp.float32)
        + fc2_bias.astype(jnp.float32)
    ).astype(x.dtype)

"""Pallas TPU attention kernels for U-ViT sequence lengths.

U-ViT attends over 65-1025 tokens (1-2 extra tokens + <=1024 patches;
reference models/uvit.py:262,281-283), so entire (L, L) score matrices fit
in VMEM and a single-pass kernel (no online-softmax tiling) is both simpler
and faster than a streamed flash kernel.

The kernel consumes (BH, L, Dh)-contiguous q/k/v and processes a group of G
(batch, head) pairs per grid program with leading-batch-dim batched matmuls
(the only batched dot_general Mosaic supports), amortizing per-program
overhead ~Gx vs one pair per program. The surrounding Attention module
produces this layout directly out of the QKV matmul epilogue
(duodiff_tpu/models/layers.py) so no standalone relayout copies are needed —
profiling showed those copies cost ~20% of a sampling step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # blocks: (G, L, Dh); batch dim leading. Scale is folded into q (one
    # (G, L, Dh) pass vs scaling the (G, L, L) scores) and the softmax
    # 1/denom normalization divides the (G, L, Dh) output instead of the
    # lane-padded (G, L, L) probabilities — same optimization as
    # pallas_block._kernel_v2, worth ~10% of the kernel at L=257.
    k = k_ref[:]
    v = v_ref[:]
    q = (q_ref[:].astype(jnp.float32) * scale).astype(k.dtype)
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G, L, L)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        e.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G, L, Dh)
    o_ref[:] = (o / denom).astype(o_ref.dtype)


def _group_size(bh: int, l: int, dh: int, budget_bytes: int = 10 * 2**20) -> int:
    """Largest divisor of bh whose VMEM working set fits the budget."""
    l_sub = _round_up(l, 8)
    l_lane = _round_up(l, 128)
    dh_lane = _round_up(dh, 128)
    best = 1
    for g in range(1, bh + 1):
        if bh % g:
            continue
        scores = 2 * g * l_sub * l_lane * 4  # s + p, fp32
        qkv = 2 * 3 * g * l_sub * dh_lane * 2  # double-buffered bf16 inputs
        out = 2 * g * l_sub * dh_lane * 2
        if scores + qkv + out <= budget_bytes:
            best = g
    return best


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float):
    """Recompute-softmax attention backward for one (batch,head) group.

    Never stores the (L, L) probabilities to HBM: the forward saves only
    q/k/v and this kernel rebuilds softmax in fp32 VMEM (the XLA backward
    keeps a fp32 (B, H, L, L) tensor alive between forward and backward —
    ~270MB per block at CelebA-64 batch 128).
    """
    k = k_ref[:]
    v = v_ref[:]
    bdt = k.dtype
    # scale folded into q; 1/denom factored onto (G, L, Dh) tensors — no
    # (G, L, L) divides or scale passes (see pallas_block._attn_bwd_kernel
    # for the identities; p = e*r with e = exp(s-m), r = 1/rowsum(e)).
    qsc = (q_ref[:].astype(jnp.float32) * scale).astype(bdt)
    do = do_ref[:].astype(jnp.float32)
    s = jax.lax.dot_general(
        qsc, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # scaled scores (G, Lq, Lk)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)  # (G, Lq, 1)
    eb = e.astype(bdt)
    # dv[g, lk, d] = sum_lq p[g, lq, lk] * do[g, lq, d] = e^T @ (do * r)
    dv = jax.lax.dot_general(
        eb, (do * r).astype(bdt), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # dp[g, lq, lk] = sum_d do[g, lq, d] * v[g, lk, d]
    dp = jax.lax.dot_general(
        do.astype(bdt), v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    c = jnp.sum(dp * e, axis=-1, keepdims=True) * r
    dsp = (e * (dp - c)).astype(bdt)  # ds' (unnormalized, unscaled)
    # dq[g, lq, d] = (ds' @ k) * r * scale
    dq = jax.lax.dot_general(
        dsp, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * (r * scale)
    # dk[g, lk, d] = ds'^T @ (q_scaled * r)
    dk = jax.lax.dot_general(
        dsp, (qsc.astype(jnp.float32) * r).astype(bdt),
        (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
    )
    dq_ref[:] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _flash_attention_bwd_impl(q, k, v, do, interpret: bool = False):
    b, h, l, dh = q.shape
    scale = float(dh) ** -0.5
    bh = b * h
    # the bwd working set holds 4 fp32 (L, L) score-sized arrays
    g = _group_size(bh, l, dh, budget_bytes=5 * 2**20)

    def flat(x):
        return x.reshape(bh, l, dh)

    spec = pl.BlockSpec((g, l, dh), lambda i: (i, 0, 0))
    shape = jax.ShapeDtypeStruct((bh, l, dh), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        out_shape=(shape, shape, shape),
        grid=(bh // g,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * bh * l * l * dh,
            bytes_accessed=7 * bh * l * dh * q.dtype.itemsize,
            transcendentals=bh * l * l,
        ),
        interpret=interpret,
    )(flat(q), flat(k), flat(v), flat(do))
    unflat = lambda x: x.reshape(b, h, l, dh)
    return unflat(dq), unflat(dk), unflat(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_trainable(q, k, v, interpret: bool = False):
    """flash_attention with a Pallas recompute-softmax backward, safe under
    jax.grad (used by attn_impl='pallas' on the training path)."""
    return flash_attention(q, k, v, interpret=interpret)


def _fa_fwd(q, k, v, interpret):
    return flash_attention(q, k, v, interpret=interpret), (q, k, v)


def _fa_bwd(interpret, res, do):
    q, k, v = res
    return _flash_attention_bwd_impl(q, k, v, do, interpret=interpret)


flash_attention_trainable.defvjp(_fa_fwd, _fa_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """Scaled dot-product attention.

    Args:
      q, k, v: (B, H, L, Dh) (any float dtype; fp32 softmax internally).
    Returns:
      (B, H, L, Dh) in q's dtype.
    """
    b, h, l, dh = q.shape
    scale = float(dh) ** -0.5
    bh = b * h
    g = _group_size(bh, l, dh)

    def flat(x):
        return x.reshape(bh, l, dh)

    spec = pl.BlockSpec((g, l, dh), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, l, dh), q.dtype),
        grid=(bh // g,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * l * l * dh,
            bytes_accessed=4 * bh * l * dh * q.dtype.itemsize,
            transcendentals=bh * l * l,
        ),
        interpret=interpret,
    )(flat(q), flat(k), flat(v))
    return out.reshape(b, h, l, dh)

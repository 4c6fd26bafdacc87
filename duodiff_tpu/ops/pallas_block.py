"""Fused attention-sublayer Pallas kernel: x + proj(SDPA(qkv(LN(x)))).

Motivation (round-1 profiling, NOTES.md): with the projections expressed as
XLA einsums ('bld,dhe->bhle'), XLA lowers them as convolutions whose rank-4
outputs carry a {2,0,1} layout, then inserts ~52 33.7MB relayout copies per
sampling step to reconcile with the {2,1,0} residual stream, plus ~39 copies
canonicalizing the attention custom call's operands — together ~20-25% of a
CelebA-64 batch-128 step. Fusing the whole pre-norm attention sublayer
(reference models/uvit.py:203-207: ``x = x + attn(norm1(x))``) into ONE
Pallas kernel removes every intermediate HBM tensor: the kernel reads the
(B, L, D) residual stream in default layout and writes it back in default
layout, with LayerNorm statistics, per-head projections, fp32 softmax, the
output projection, and the residual add all VMEM-resident.

Grid layout: ``(B // G, H)`` with the head axis minor. TPU grids execute
sequentially, so a VMEM scratch accumulator carries the per-head output
projections for a batch group; LayerNorm runs once per group (at h == 0) into
a second scratch reused by all heads. Weights are delivered per head via
BlockSpecs over prepacked (H, D, Dh) / (H, Dh, D) arrays, so every matmul in
the kernel has K ∈ {D, Dh, L} with no in-kernel transposes or lane-unaligned
slicing (Dh = 64 is half a lane tile; slicing a packed (L, 3D) projection at
64-element offsets would force Mosaic relayouts).

Numerics match duodiff_tpu/models/layers.py's unfused path: LN statistics and
softmax in fp32, matmul inputs in the activation dtype with fp32 MXU
accumulation, and the residual + bias + per-head partials accumulated in fp32
(the unfused path accumulates the residual in bf16, so the fused path is
slightly *more* precise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(*refs, num_heads: int, scale: float, eps: float, has_qkv_bias: bool):
    if has_qkv_bias:
        (x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref,
         o_ref, xn_ref, acc_ref) = refs
    else:
        (x_ref, g_ref, b_ref, wqkv_ref, wp_ref, bp_ref,
         o_ref, xn_ref, acc_ref) = refs
        bqkv_ref = None

    h = pl.program_id(1)

    @pl.when(h == 0)
    def _layernorm_and_residual_init():
        xv = x_ref[:].astype(jnp.float32)  # (G, L, D)
        _, _, xn = _ln_fwd(xv, g_ref[0].astype(jnp.float32),
                           b_ref[0].astype(jnp.float32), eps)
        xn_ref[:] = xn.astype(xn_ref.dtype)
        # residual + output-projection bias, accumulated once in fp32
        acc_ref[:] = xv + bp_ref[0].astype(jnp.float32)

    g, l, d = x_ref.shape
    # Unrolled per-sample 2D matmuls: Mosaic cannot shape-cast (G*L, Dh) <->
    # (G, L, Dh) when L isn't sublane-aligned (e.g. 257), and its batched
    # dot_general only supports a leading batch dim, so each group member
    # runs standalone (G is small; the unroll just lengthens the program).
    for i in range(g):
        xn = xn_ref[i]  # (L, D)

        def head_proj(j, xn=xn):
            o = jnp.dot(xn, wqkv_ref[j, 0], preferred_element_type=jnp.float32)
            if has_qkv_bias:
                o = o + bqkv_ref[j, 0].astype(jnp.float32)
            return o.astype(xn_ref.dtype)

        q, k, v = head_proj(0), head_proj(1), head_proj(2)  # (L, Dh)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (L, L)
        p = jax.nn.softmax(s.astype(jnp.float32) * scale, axis=-1)
        o = jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )  # (L, Dh)
        partial = jnp.dot(
            o.astype(xn_ref.dtype), wp_ref[0], preferred_element_type=jnp.float32
        )  # (L, D)
        acc_ref[i] += partial

    @pl.when(h == num_heads - 1)
    def _write_out():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _kernel_v2(*refs, num_heads: int, head_dim: int, eps: float,
               has_qkv_bias: bool, residual: bool):
    """Batch-only grid variant: per sample, ONE full-width (L, D) x (D, 3A)
    QKV matmul (full MXU tiles vs the (b, h)-grid version's N=64 per-head
    projections), then a static unrolled head loop over 64-column lane
    slices of the packed result. Weights have constant block indices, so
    Pallas DMAs them once instead of once per (batch, head) program.

    A = num_heads * head_dim is the attention width; single-chip A == D, but
    under tensor parallelism each shard holds H/mp heads (A = D/mp) of the
    same math — the kernel only needs head_dim passed explicitly instead of
    deriving it from D. residual=False skips the ``x +`` term so a TP shard
    emits its partial projection for the row-parallel psum outside
    (duodiff_tpu/parallel/tp_fused.py).

    The softmax scale is pre-folded into the q columns of the delivered
    weight (and bias) by the wrapper — a loop-invariant (D, 3A) op XLA
    hoists out of the sampling scan — so the kernel runs no scale pass at
    all and q slices straight out of the packed bf16 qkv."""
    if has_qkv_bias:
        (x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref,
         o_ref) = refs
    else:
        (x_ref, g_ref, b_ref, wqkv_ref, wp_ref, bp_ref, o_ref) = refs
        bqkv_ref = None

    g, l, d = x_ref.shape
    dh = head_dim
    da = num_heads * dh  # attention width A
    for i in range(g):
        xv = x_ref[i].astype(jnp.float32)  # (L, D)
        _, _, xn = _ln_fwd(xv, g_ref[0].astype(jnp.float32),
                           b_ref[0].astype(jnp.float32), eps)
        xn = xn.astype(x_ref.dtype)

        qkv = jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
        if has_qkv_bias:
            qkv = qkv + bqkv_ref[0].astype(jnp.float32)
        qkv = qkv.astype(x_ref.dtype)  # (L, 3A), packed (K H Dh), q scaled

        heads = []
        for h in range(num_heads):
            q = jax.lax.slice(qkv, (0, h * dh), (l, (h + 1) * dh))
            k = jax.lax.slice(qkv, (0, da + h * dh), (l, da + (h + 1) * dh))
            v = jax.lax.slice(qkv, (0, 2 * da + h * dh), (l, 2 * da + (h + 1) * dh))
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (L, L)
            # softmax with the 1/denom normalization moved AFTER the value
            # contraction: divides the (L, Dh) output instead of the
            # lane-padded (L, L->384) probability matrix (ablation:
            # max+sum+divide cost ~0.26ms of the 0.99ms block at CelebA-64
            # batch 128, the divide being the largest full-matrix pass).
            # exp(s-m) is in [0, 1], so the bf16 cast loses the same bits
            # either side of the divide.
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
            heads.append((o / denom).astype(x_ref.dtype))
        # one full-width K=A output projection instead of num_heads K=Dh
        # partial matmuls (K=64 runs the MXU at half rate)
        merged = jnp.concatenate(heads, axis=1)  # (L, A)
        proj = jnp.dot(merged, wp_ref[:], preferred_element_type=jnp.float32)
        if residual:
            proj = proj + xv
        o_ref[i] = (proj + bp_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _group_size_v2(b: int, l: int, d: int, itemsize: int,
                   budget_bytes: int = 10 * 2**20) -> int:
    """Largest divisor of b fitting the v2 working set. Only the x in/out
    blocks scale with the group size — the per-sample loop reuses its
    transients (qkv, scores, probs, head outputs, proj accumulator), and
    constant-index weight blocks are fetched once. grp=4 measured ~2.5%
    faster than grp=2 at CelebA-64 shapes (chained kernel timing); raising
    the budget to 15MB (grp=8) measured 74% SLOWER — the larger x blocks
    starve the double-buffering headroom."""
    l_sub = _round_up(l, 8)
    l_lane = _round_up(l, 128)
    # per-iteration transients (independent of g)
    qkv = l_sub * 3 * d * (4 + itemsize)     # fp32 dot output + cast
    sp = 2 * l_sub * l_lane * 4              # scores + probs, fp32
    heads = 2 * l_sub * d * itemsize         # scaled q + merged heads
    proj = l_sub * d * 4
    fixed = qkv + sp + heads + proj
    best = 1
    for g in range(1, b + 1):
        if b % g:
            continue
        x_io = 4 * g * l_sub * d * itemsize  # in + out, double-buffered
        if fixed + x_io <= budget_bytes:
            best = g
    return best


def _group_size(b: int, l: int, d: int, dh: int, itemsize: int,
                budget_bytes: int = 10 * 2**20) -> int:
    """Largest divisor of b whose VMEM working set fits the budget."""
    l_sub = _round_up(l, 8)
    l_lane = _round_up(l, 128)
    dh_lane = _round_up(dh, 128)
    best = 1
    for g in range(1, b + 1):
        if b % g:
            continue
        x_io = 4 * g * l_sub * d * itemsize       # in + out, double-buffered
        xn = g * l_sub * d * itemsize
        acc = g * l_sub * d * 4
        qkv = 3 * g * l_sub * dh_lane * itemsize
        sp = 2 * g * l_sub * l_lane * 4           # scores + probs, fp32
        partial = g * l_sub * d * 4
        if x_io + xn + acc + qkv + sp + partial <= budget_bytes:
            best = g
    return best


def _ln_fwd(xv: jax.Array, gamma, beta, eps: float):
    """LayerNorm forward pieces in fp32: returns (x_hat, rstd, xn)."""
    mean = jnp.mean(xv, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xv - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    x_hat = (xv - mean) * rstd
    return x_hat, rstd, x_hat * gamma + beta


def _ln_bwd_dx(dxn, x_hat, rstd, gamma):
    """dL/dx for LayerNorm given dL/dxn (all fp32, per row over last dim)."""
    dxh = dxn * gamma
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * x_hat, axis=-1, keepdims=True)
    return rstd * (dxh - m1 - x_hat * m2)


def _attn_bwd_kernel(*refs, num_heads: int, head_dim: int, scale: float,
                     eps: float, has_qkv_bias: bool, residual: bool):
    """Backward of the fused attention sublayer for one batch group.

    Recomputes LN, QKV, and the fp32 softmax in VMEM (no saved activations
    beyond x itself), emits dx per batch block, and accumulates the weight
    gradients in fp32 VMEM across the sequential grid — they are written to
    constant-index output blocks, zero-initialized at program 0.

    Rectangular (A = num_heads * head_dim != D) weights and residual=False
    mirror _kernel_v2's TP-shard mode: dx then excludes the identity (dy)
    path, which the shard_map wrapper accounts for outside.
    """
    if has_qkv_bias:
        (x_ref, dy_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wp_ref,
         dx_ref, dg_ref, db_ref, dwqkv_ref, dbqkv_ref, dwp_ref, dbp_ref) = refs
    else:
        (x_ref, dy_ref, g_ref, b_ref, wqkv_ref, wp_ref,
         dx_ref, dg_ref, db_ref, dwqkv_ref, dwp_ref, dbp_ref) = refs
        bqkv_ref = dbqkv_ref = None

    @pl.when(pl.program_id(0) == 0)
    def _zero_accumulators():
        dg_ref[:] = jnp.zeros_like(dg_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        if has_qkv_bias:
            dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dwp_ref[:] = jnp.zeros_like(dwp_ref)
        dbp_ref[:] = jnp.zeros_like(dbp_ref)

    g, l, d = x_ref.shape
    dh = head_dim
    da = num_heads * dh  # attention width A
    gamma = g_ref[0].astype(jnp.float32)
    beta = b_ref[0].astype(jnp.float32)
    bdt = x_ref.dtype

    for i in range(g):
        xv = x_ref[i].astype(jnp.float32)
        x_hat, rstd, xn_f = _ln_fwd(xv, gamma, beta, eps)
        xn = xn_f.astype(bdt)
        qkv = jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
        if has_qkv_bias:
            qkv = qkv + bqkv_ref[0].astype(jnp.float32)
        qkv = qkv.astype(bdt)

        dy = dy_ref[i].astype(jnp.float32)
        dyb = dy.astype(bdt)
        dbp_ref[:] += jnp.sum(dy, axis=0, keepdims=True)
        # dmerged = dy @ Wp^T  (contract the output dim)
        dm = jax.lax.dot_general(
            dyb, wp_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (L, A)
        dm_b = dm.astype(bdt)

        dqs, dks, dvs, os_ = [], [], [], []
        for h in range(num_heads):
            q = jax.lax.slice(qkv, (0, h * dh), (l, (h + 1) * dh))
            k = jax.lax.slice(qkv, (0, da + h * dh), (l, da + (h + 1) * dh))
            v = jax.lax.slice(
                qkv, (0, 2 * da + h * dh), (l, 2 * da + (h + 1) * dh)
            )
            # scale folded into q (one (L, Dh) pass vs scaling the (L, L)
            # scores); all 1/denom normalizations factored onto (L, Dh) /
            # (L, 1) tensors — no full-width (L, L->384-lane) divides.
            # With p = e*r (e = exp(s-m), r = 1/rowsum):
            #   o  = (e @ v) * r
            #   dv = e^T @ (do * r)
            #   ds_scaled = e*(dp - c) * r,  c = rowsum(dp*e) * r
            #   dq = (ds' @ k) * r * scale,  dk = ds'^T @ (q_scaled * r)
            # where ds' = e*(dp - c) stays unnormalized for the matmuls.
            qsc = (q.astype(jnp.float32) * scale).astype(bdt)
            s = jax.lax.dot_general(
                qsc, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # scaled scores (Lq, Lk)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)  # (Lq, 1)
            eb = e.astype(bdt)
            do = jax.lax.slice(dm_b, (0, h * dh), (l, (h + 1) * dh))
            dof = do.astype(jnp.float32)
            os_.append(
                (jnp.dot(eb, v, preferred_element_type=jnp.float32) * r
                 ).astype(bdt)
            )
            # dv = e^T @ (do * r) (contract Lq)
            dvs.append(jax.lax.dot_general(
                eb, (dof * r).astype(bdt), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(bdt))
            # dp = do @ v^T (contract Dh)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            c = jnp.sum(dp * e, axis=-1, keepdims=True) * r
            dsp = (e * (dp - c)).astype(bdt)  # ds'(unnormalized, unscaled)
            dqs.append(
                (jnp.dot(dsp, k, preferred_element_type=jnp.float32)
                 * (r * scale)).astype(bdt)
            )
            # dk = ds'^T @ (q_scaled * r) (contract Lq)
            dks.append(jax.lax.dot_general(
                dsp, (qsc.astype(jnp.float32) * r).astype(bdt),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(bdt))

        merged = jnp.concatenate(os_, axis=1)          # (L, A)
        dqkv = jnp.concatenate(dqs + dks + dvs, axis=1)  # (L, 3A), (K H Dh)

        # weight grads (contract L)
        dwp_ref[:] += jax.lax.dot_general(
            merged, dyb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwqkv_ref[:] += jax.lax.dot_general(
            xn, dqkv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dqkv_f = dqkv.astype(jnp.float32)
        if has_qkv_bias:
            dbqkv_ref[:] += jnp.sum(dqkv_f, axis=0, keepdims=True)

        # dxn = dqkv @ Wqkv^T (contract 3A)
        dxn = jax.lax.dot_general(
            dqkv, wqkv_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dg_ref[:] += jnp.sum(dxn * x_hat, axis=0, keepdims=True)
        db_ref[:] += jnp.sum(dxn, axis=0, keepdims=True)
        dx = _ln_bwd_dx(dxn, x_hat, rstd, gamma)
        if residual:
            dx = dx + dy
        dx_ref[i] = dx.astype(dx_ref.dtype)


def _erf_poly(x: jax.Array) -> jax.Array:
    """fp32 erf via Abramowitz-Stegun 7.1.26 (|err| < 1.5e-7 — far below
    bf16 resolution). Mosaic has no TC lowering for erf/erfc, so the exact
    GELU inside kernels uses this polynomial."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu(h: jax.Array, approx: bool) -> jax.Array:
    """GELU inside a kernel (jax.nn.gelu's exact form lowers through
    erf/erfc, which Mosaic cannot lower)."""
    if approx:
        return jax.nn.gelu(h, approximate=True)
    return 0.5 * h * (1.0 + _erf_poly(h * (2.0 ** -0.5)))


def _mlp_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                *, eps: float, gelu_approx: bool, residual: bool = True):
    """x + fc2(gelu(fc1(LN(x)))) for a batch group, fully VMEM-resident.
    residual=False emits the bare fc2 output (+ bias) — a TP shard's
    hidden-slice partial, psum-reduced outside (parallel/tp_fused.py)."""
    g, l, d = x_ref.shape
    for i in range(g):
        xv = x_ref[i].astype(jnp.float32)  # (L, D)
        _, _, xn = _ln_fwd(xv, g_ref[0].astype(jnp.float32),
                           b_ref[0].astype(jnp.float32), eps)
        h = jnp.dot(
            xn.astype(x_ref.dtype), w1_ref[:], preferred_element_type=jnp.float32
        ) + b1_ref[0].astype(jnp.float32)
        h = _gelu(h, gelu_approx).astype(x_ref.dtype)
        out = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
        if residual:
            out = out + xv
        o_ref[i] = (out + b2_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _block_kernel(*refs, num_heads: int, eps: float,
                  has_qkv_bias: bool, gelu_approx: bool):
    """Whole transformer block (both pre-norm sublayers) in ONE kernel:
    y = u + fc2(gelu(fc1(LN2(u)))), u = x + proj(SDPA(qkv(LN1(x)))).
    Saves one full residual-stream HBM round trip per block vs running the
    two sublayer kernels back to back."""
    if has_qkv_bias:
        (x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref,
         g2_ref, b2_ref, w1_ref, fb1_ref, w2_ref, fb2_ref, o_ref) = refs
    else:
        (x_ref, g1_ref, b1_ref, wqkv_ref, wp_ref, bp_ref,
         g2_ref, b2_ref, w1_ref, fb1_ref, w2_ref, fb2_ref, o_ref) = refs
        bqkv_ref = None

    g, l, d = x_ref.shape
    dh = d // num_heads
    bdt = x_ref.dtype
    for i in range(g):
        # ---- attention sublayer ----
        xv = x_ref[i].astype(jnp.float32)
        _, _, xn_f = _ln_fwd(xv, g1_ref[0].astype(jnp.float32),
                             b1_ref[0].astype(jnp.float32), eps)
        xn = xn_f.astype(bdt)
        qkv = jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
        if has_qkv_bias:
            qkv = qkv + bqkv_ref[0].astype(jnp.float32)
        qkv = qkv.astype(bdt)  # q columns pre-scaled by the wrapper
        heads = []
        for h in range(num_heads):
            q = jax.lax.slice(qkv, (0, h * dh), (l, (h + 1) * dh))
            k = jax.lax.slice(qkv, (0, d + h * dh), (l, d + (h + 1) * dh))
            v = jax.lax.slice(
                qkv, (0, 2 * d + h * dh), (l, 2 * d + (h + 1) * dh)
            )
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # post-normalized softmax: divide the (L, Dh) output, not the
            # lane-padded (L, L) probabilities (see _kernel_v2)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.dot(e.astype(bdt), v, preferred_element_type=jnp.float32)
            heads.append((o / denom).astype(bdt))
        merged = jnp.concatenate(heads, axis=1)
        proj = jnp.dot(merged, wp_ref[:], preferred_element_type=jnp.float32)
        u = xv + proj + bp_ref[0].astype(jnp.float32)  # (L, D) fp32

        # ---- MLP sublayer ----
        _, _, un_f = _ln_fwd(u, g2_ref[0].astype(jnp.float32),
                             b2_ref[0].astype(jnp.float32), eps)
        hmid = jnp.dot(
            un_f.astype(bdt), w1_ref[:], preferred_element_type=jnp.float32
        ) + fb1_ref[0].astype(jnp.float32)
        hmid = _gelu(hmid, gelu_approx).astype(bdt)
        out = jnp.dot(hmid, w2_ref[:], preferred_element_type=jnp.float32)
        o_ref[i] = (u + out + fb2_ref[0].astype(jnp.float32)).astype(
            o_ref.dtype
        )


def _group_size_block(b: int, l: int, d: int, hidden: int, itemsize: int,
                      budget_bytes: int = 9 * 2**20) -> int:
    l_sub = _round_up(l, 8)
    l_lane = _round_up(l, 128)
    weights = (4 * d * d + 2 * d * hidden) * itemsize
    best = 1
    for g in range(1, b + 1):
        if b % g:
            continue
        x_io = 4 * g * l_sub * d * itemsize
        qkv = g * l_sub * 3 * d * (4 + itemsize)
        u = g * l_sub * d * 4
        sp = 2 * l_sub * l_lane * 4
        hid = l_sub * hidden * (4 + itemsize)
        if weights + x_io + qkv + u + sp + hid <= budget_bytes:
            best = g
    return best


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "eps", "gelu_approx", "interpret"),
)
def fused_block(
    x: jax.Array,
    ln1_scale, ln1_bias, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
    ln2_scale, ln2_bias, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias,
    *,
    num_heads: int,
    eps: float = 1e-5,
    gelu_approx: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """One transformer block (reference models/uvit.py:203-208, no skip) as
    a single Pallas kernel. Measured slightly SLOWER than running the two
    sublayer kernels back to back (5.05 vs 5.11 samples/sec at CelebA-64
    batch 128): the inter-kernel round trips are already hidden behind
    async DMA and shorter programs pipeline better — kept as a measured
    alternative for other shapes, not used by Block."""
    b, l, d = x.shape
    h = num_heads
    scale = float(d // h) ** -0.5
    dtype = x.dtype
    itemsize = jnp.dtype(dtype).itemsize
    hidden = fc1_kernel.shape[1]

    grp = _group_size_block(b, l, d, hidden, itemsize)
    row = pl.BlockSpec((grp, l, d), lambda i: (i, 0, 0))
    vec = pl.BlockSpec((1, d), lambda i: (0, 0))

    in_specs = [row, vec, vec,
                pl.BlockSpec((d, 3 * d), lambda i: (0, 0))]
    # softmax scale pre-folded into the q columns/bias (see _kernel_v2)
    wqkv = jnp.concatenate(
        [qkv_kernel[:, :d] * scale, qkv_kernel[:, d:]], axis=1
    ).astype(dtype)
    args = [x, ln1_scale.reshape(1, d), ln1_bias.reshape(1, d), wqkv]
    if qkv_bias is not None:
        in_specs.append(pl.BlockSpec((1, 3 * d), lambda i: (0, 0)))
        bq = jnp.concatenate([qkv_bias[:d] * scale, qkv_bias[d:]])
        args.append(bq.astype(jnp.float32).reshape(1, 3 * d))
    in_specs += [
        pl.BlockSpec((d, d), lambda i: (0, 0)), vec,      # wp, bp
        vec, vec,                                          # ln2
        pl.BlockSpec((d, hidden), lambda i: (0, 0)),
        pl.BlockSpec((1, hidden), lambda i: (0, 0)),
        pl.BlockSpec((hidden, d), lambda i: (0, 0)),
        vec,
    ]
    args += [
        proj_kernel.astype(dtype),
        proj_bias.astype(jnp.float32).reshape(1, d),
        ln2_scale.reshape(1, d), ln2_bias.reshape(1, d),
        fc1_kernel.astype(dtype),
        fc1_bias.astype(jnp.float32).reshape(1, hidden),
        fc2_kernel.astype(dtype),
        fc2_bias.astype(jnp.float32).reshape(1, d),
    ]

    return pl.pallas_call(
        functools.partial(
            _block_kernel,
            num_heads=h,
            eps=eps,
            has_qkv_bias=qkv_bias is not None,
            gelu_approx=gelu_approx,
        ),
        out_shape=jax.ShapeDtypeStruct((b, l, d), dtype),
        grid=(b // grp,),
        in_specs=in_specs,
        out_specs=row,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * l * d * (4 * d + 2 * l + 2 * hidden),
            bytes_accessed=2 * b * l * d * itemsize,
            transcendentals=b * h * l * l + b * l * hidden,
        ),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16))
def fused_block_trainable(
    x, ln1_scale, ln1_bias, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
    ln2_scale, ln2_bias, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias,
    num_heads, eps=1e-5, gelu_approx=False, interpret=False,
):
    """fused_block with a chained backward: recompute the attention-sublayer
    output u with the forward kernel, MLP grads via the XLA recompute vjp,
    then the hand-written Pallas attention backward."""
    return fused_block(
        x, ln1_scale, ln1_bias, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
        ln2_scale, ln2_bias, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias,
        num_heads=num_heads, eps=eps, gelu_approx=gelu_approx,
        interpret=interpret,
    )


def _fb_fwd(x, ln1_scale, ln1_bias, qkv_kernel, qkv_bias, proj_kernel,
            proj_bias, ln2_scale, ln2_bias, fc1_kernel, fc1_bias, fc2_kernel,
            fc2_bias, num_heads, eps, gelu_approx, interpret):
    y = fused_block(
        x, ln1_scale, ln1_bias, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
        ln2_scale, ln2_bias, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias,
        num_heads=num_heads, eps=eps, gelu_approx=gelu_approx,
        interpret=interpret,
    )
    return y, (x, ln1_scale, ln1_bias, qkv_kernel, qkv_bias, proj_kernel,
               proj_bias, ln2_scale, ln2_bias, fc1_kernel, fc1_bias,
               fc2_kernel, fc2_bias)


def _fb_bwd(num_heads, eps, gelu_approx, interpret, res, dy):
    (x, ln1_scale, ln1_bias, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
     ln2_scale, ln2_bias, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias) = res
    u = fused_attn_sublayer(
        x, ln1_scale, ln1_bias, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
        num_heads=num_heads, eps=eps, interpret=interpret,
    )
    du, dg2, db2, dw1, dfb1, dw2, dfb2 = _mlp_sublayer_bwd(
        u, dy, ln2_scale, ln2_bias, fc1_kernel, fc1_bias, fc2_kernel,
        fc2_bias, eps=eps, gelu_approx=gelu_approx, interpret=interpret,
    )
    dx, dg1, db1, dwqkv, dbqkv, dwp, dbp = _attn_sublayer_bwd(
        x, du.astype(x.dtype), ln1_scale, ln1_bias, qkv_kernel, qkv_bias,
        proj_kernel, num_heads=num_heads, eps=eps, interpret=interpret,
    )
    return (dx, dg1, db1, dwqkv, dbqkv, dwp, dbp, dg2, db2, dw1, dfb1,
            dw2, dfb2)


fused_block_trainable.defvjp(_fb_fwd, _fb_bwd)


def _fwd_fits(d: int, itemsize: int) -> bool:
    """Empirical forward-kernel VMEM fit guard: fp32 activations+weights at
    D >= 768 blow Mosaic's 16MB scoped-vmem limit (measured: the fused MLP
    forward at fp32 D=768 L=258 g=1 needs 21.83M per Mosaic's own error;
    fp32 D=512 and bf16 up to D=1024 all compile and run on-chip —
    bench_matrix's imagenet256 rows exercise bf16 D=1024 every round).
    A static byte model can't draw this line: it over-counts actual Mosaic
    stack allocation by ~1.35x and would wrongly reject the WORKING bf16
    D=1024 kernels, so gate on the measured failure class instead.
    _group_size_* returning 1 is a preference, not a fit proof."""
    return itemsize <= 2 or d < 768


def mlp_fwd_fits(l: int, d: int, hidden: int, itemsize: int) -> bool:
    return _fwd_fits(d, itemsize)


def attn_fwd_fits(l: int, d: int, itemsize: int) -> bool:
    return _fwd_fits(d, itemsize)


def _group_size_mlp(b: int, l: int, d: int, hidden: int, itemsize: int,
                    budget_bytes: int = 13 * 2**20) -> int:
    """13MB lands grp=4 at flagship shapes: probed 1.517ms vs 1.617 (grp=1,
    the old 9MB budget) vs 1.764 (grp=2) — tools/probe_mlp_fwd.py."""
    l_sub = _round_up(l, 8)
    weights = 2 * d * hidden * itemsize  # constant-index blocks, single copy
    best = 1
    for g in range(1, b + 1):
        if b % g:
            continue
        x_io = 4 * g * l_sub * d * itemsize
        hid = l_sub * hidden * (4 + itemsize)  # fp32 pre-gelu + cast
        acc = l_sub * d * 4
        if weights + x_io + hid + acc <= budget_bytes:
            best = g
    return best


@functools.partial(
    jax.jit, static_argnames=("num_heads", "eps", "interpret", "head_dim",
                              "residual")
)
def _attn_sublayer_bwd_impl(
    x, dy, ln_scale, ln_bias, qkv_kernel, qkv_bias, proj_kernel,
    *, num_heads: int, eps: float, interpret: bool,
    head_dim: int | None = None, residual: bool = True,
):
    b, l, d = x.shape
    h = num_heads
    dh = head_dim if head_dim is not None else d // h
    da = h * dh
    scale = float(dh) ** -0.5
    dtype = x.dtype
    itemsize = jnp.dtype(dtype).itemsize
    has_bias = qkv_bias is not None

    # working set ~2x the forward's; weight-grad accumulators add ~4MB fp32
    grp = _group_size_v2(b, l, d, itemsize, budget_bytes=5 * 2**20)
    row = pl.BlockSpec((grp, l, d), lambda i: (i, 0, 0))
    vec = pl.BlockSpec((1, d), lambda i: (0, 0))
    const_ad = pl.BlockSpec((da, d), lambda i: (0, 0))
    const_d3a = pl.BlockSpec((d, 3 * da), lambda i: (0, 0))
    vec3 = pl.BlockSpec((1, 3 * da), lambda i: (0, 0))

    in_specs = [row, row, vec, vec, const_d3a]
    args = [x, dy, ln_scale.reshape(1, d), ln_bias.reshape(1, d),
            qkv_kernel.astype(dtype)]
    if has_bias:
        in_specs.append(vec3)
        args.append(qkv_bias.astype(jnp.float32).reshape(1, 3 * da))
    in_specs.append(const_ad)
    args.append(proj_kernel.astype(dtype))

    f32 = jnp.float32
    out_shape = [
        jax.ShapeDtypeStruct((b, l, d), dtype),       # dx
        jax.ShapeDtypeStruct((1, d), f32),            # d ln_scale
        jax.ShapeDtypeStruct((1, d), f32),            # d ln_bias
        jax.ShapeDtypeStruct((d, 3 * da), f32),       # d qkv_kernel
    ]
    out_specs = [row, vec, vec, const_d3a]
    if has_bias:
        out_shape.append(jax.ShapeDtypeStruct((1, 3 * da), f32))
        out_specs.append(vec3)
    out_shape += [
        jax.ShapeDtypeStruct((da, d), f32),           # d proj_kernel
        jax.ShapeDtypeStruct((1, d), f32),            # d proj_bias
    ]
    out_specs += [const_ad, vec]

    outs = pl.pallas_call(
        functools.partial(
            _attn_bwd_kernel,
            num_heads=h,
            head_dim=dh,
            scale=scale,
            eps=eps,
            has_qkv_bias=has_bias,
            residual=residual,
        ),
        out_shape=tuple(out_shape),
        grid=(b // grp,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * l * da * (4 * d + 2 * l),
            bytes_accessed=3 * b * l * d * itemsize,
            transcendentals=b * h * l * l,
        ),
        interpret=interpret,
    )(*args)
    if has_bias:
        dx, dg, db, dwqkv, dbqkv, dwp, dbp = outs
        dbqkv = dbqkv.reshape(3 * da)
    else:
        dx, dg, db, dwqkv, dwp, dbp = outs
        dbqkv = None
    return dx, dg.reshape(d), db.reshape(d), dwqkv, dbqkv, dwp, dbp.reshape(d)


def _attn_sublayer_reference(
    x, ln_scale, ln_bias, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
    *, num_heads: int, eps: float, sdpa: str = "xla",
    interpret: bool = False, head_dim: int | None = None,
    residual: bool = True,
):
    """Replica of the fused attention sublayer's numerics (fp32 LN and
    softmax, bf16 matmul operands, post-normalized attention output,
    full-width out-projection), used as the recompute backward when the
    Pallas attention backward's VMEM residents don't fit (attn_bwd_fits).

    sdpa selects the attention core inside the shared LN/projection chain:
    "xla" (pure-XLA einsum softmax) or "flash" (the per-head-tiled
    flash-attention kernel, whose custom VJP keeps the (B, H, L, L)
    score/probability tensors in VMEM instead of materializing them to HBM
    — the D>=768 on-TPU backward path)."""
    b, l, d = x.shape
    h = num_heads
    dh = head_dim if head_dim is not None else d // h
    da = h * dh
    bdt = x.dtype
    f32 = jnp.float32

    xv = x.astype(f32)
    _, _, xn_f = _ln_fwd(xv, ln_scale.astype(f32), ln_bias.astype(f32), eps)
    xn = xn_f.astype(bdt)
    qkv = jnp.dot(
        xn, qkv_kernel.astype(bdt), preferred_element_type=f32
    )
    if qkv_bias is not None:
        qkv = qkv + qkv_bias.astype(f32)
    qkv = qkv.astype(bdt)
    # packed column order (K H Dh): [q | k | v] each (B, L, H, Dh)
    q = qkv[..., :da].reshape(b, l, h, dh)
    k = qkv[..., da:2 * da].reshape(b, l, h, dh)
    v = qkv[..., 2 * da:].reshape(b, l, h, dh)
    if sdpa == "flash":
        from duodiff_tpu.ops.pallas_attention import (
            flash_attention_trainable,
        )

        # (B, L, H, Dh) -> (B, H, L, Dh); the kernel applies the dh**-0.5
        # scale itself
        o = flash_attention_trainable(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), interpret,
        )
        merged = o.transpose(0, 2, 1, 3).reshape(b, l, da).astype(bdt)
    else:
        scale = float(dh) ** -0.5
        qsc = (q.astype(f32) * scale).astype(bdt)
        s = jnp.einsum(
            "blhe,bmhe->bhlm", qsc, k, preferred_element_type=f32
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        o = jnp.einsum(
            "bhlm,bmhe->blhe", e.astype(bdt), v, preferred_element_type=f32
        )
        o = (o / jnp.swapaxes(denom, 1, 2)).astype(bdt)
        merged = o.reshape(b, l, da)
    proj = jnp.dot(
        merged, proj_kernel.astype(bdt), preferred_element_type=f32
    )
    if residual:
        proj = proj + xv
    return (proj + proj_bias.astype(f32)).astype(bdt)


def attn_bwd_fits(b: int, l: int, d: int, itemsize: int,
                  budget_bytes: int = 24 * 2**20) -> bool:
    """Whether the Pallas attention backward's VMEM working set fits.

    The fp32 dWqkv/dWp accumulators + one activation-dtype copy of the
    weights are grid-resident (d*4d*(4+itemsize) bytes: 6.3MB at D=512,
    14.2MB at D=768, 25.2MB at D=1024 bf16); per-iteration transients add
    the recomputed qkv, per-head fp32 score/prob matrices and the dqkv
    construction. The 24MB default ceiling is the measured effective Mosaic
    limit on v5e (NOTES.md: a ~24MB MLP-bwd tile compiles, 28.3MB does
    not); callers fall back to the XLA recompute backward via
    _attn_sublayer_reference above it."""
    l_sub = _round_up(l, 8)
    l_lane = _round_up(l, 128)
    residents = d * 4 * d * (4 + itemsize) + 16 * 1024
    grp = _group_size_v2(b, l, d, itemsize, budget_bytes=5 * 2**20)
    qkv = l_sub * 3 * d * (4 + itemsize)          # fp32 dot output + cast
    sp = 3 * l_sub * l_lane * 4 + l_sub * l_lane * itemsize  # s/e/dp + dsp
    dqkv = l_sub * 3 * d * (4 + itemsize)         # concat + fp32 copy
    rows = 4 * grp * l_sub * d * itemsize + 2 * l_sub * d * 4  # x/dy/dx + dm/dxn
    return residents + qkv + sp + dqkv + rows <= budget_bytes


def _attn_sublayer_bwd(
    x, dy, ln_scale, ln_bias, qkv_kernel, qkv_bias, proj_kernel,
    *, num_heads: int, eps: float, interpret: bool,
    head_dim: int | None = None, residual: bool = True,
):
    """Attention-sublayer backward dispatch: the hand-written Pallas kernel
    when its VMEM residents fit (D<=512-class models), else a recompute
    backward for D>=768 — on TPU through _attn_sublayer_reference_flash
    (flash-attention custom VJP inside the XLA LN/projection chain: the
    per-head tiling fits VMEM at any embed dim and keeps the (B, H, L, L)
    tensors out of HBM — 11.07 vs 17.63 ms/call isolated at D=768 B=128,
    tools/probe_attn_bwd.py 2026-08-17), in interpret mode (off-TPU)
    through the pure-XLA _attn_sublayer_reference. Returns
    (dx, dg, db, dwqkv, dbqkv, dwp, dbp) with dbqkv None iff qkv_bias is.

    DUODIFF_ATTN_BWD_FALLBACK={flash,xla} overrides the D>=768 fallback
    choice in either direction (read at TRACE time, like
    DUODIFF_MLP_BWD_SPLIT): "xla" forces the pure-XLA recompute backward on
    TPU for end-to-end attribution of the flash-core path
    (tools/microbench.py --mode train); "flash" forces the flash core even
    off-TPU (the kernel runs in interpret mode). Other values fall through
    to the default (flash on TPU, xla in interpret mode)."""
    import os

    b, l, d = x.shape
    if attn_bwd_fits(b, l, d, jnp.dtype(x.dtype).itemsize):
        return _attn_sublayer_bwd_impl(
            x, dy, ln_scale, ln_bias, qkv_kernel, qkv_bias, proj_kernel,
            num_heads=num_heads, eps=eps, interpret=interpret,
            head_dim=head_dim, residual=residual,
        )
    fallback = os.environ.get("DUODIFF_ATTN_BWD_FALLBACK")
    if fallback not in ("flash", "xla"):
        fallback = "xla" if interpret else "flash"
    ref = functools.partial(
        _attn_sublayer_reference, num_heads=num_heads, eps=eps,
        sdpa=fallback, interpret=interpret, head_dim=head_dim,
        residual=residual,
    )
    zero_bp = jnp.zeros((d,), jnp.float32)  # additive: grads independent
    if qkv_bias is not None:
        _, vjp = jax.vjp(
            lambda xx, g, bb, wq, bq, wp: ref(xx, g, bb, wq, bq, wp, zero_bp),
            x, ln_scale, ln_bias, qkv_kernel, qkv_bias, proj_kernel,
        )
        dx, dg, db, dwqkv, dbqkv, dwp = vjp(dy.astype(x.dtype))
    else:
        _, vjp = jax.vjp(
            lambda xx, g, bb, wq, wp: ref(xx, g, bb, wq, None, wp, zero_bp),
            x, ln_scale, ln_bias, qkv_kernel, proj_kernel,
        )
        dx, dg, db, dwqkv, dwp = vjp(dy.astype(x.dtype))
        dbqkv = None
    dbp = jnp.sum(dy.astype(jnp.float32), axis=(0, 1))
    return dx, dg, db, dwqkv, dbqkv, dwp, dbp


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def fused_attn_sublayer_trainable(
    x, ln_scale, ln_bias, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
    num_heads, eps=1e-5, interpret=False, variant="v2", head_dim=None,
    residual=True,
):
    """fused_attn_sublayer with a hand-written Pallas backward (recomputes
    LN/QKV/softmax in VMEM; weight grads accumulated across the sequential
    grid) — safe under jax.grad, so training can run the fused kernel."""
    return fused_attn_sublayer(
        x, ln_scale, ln_bias, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
        num_heads=num_heads, eps=eps, interpret=interpret, variant=variant,
        head_dim=head_dim, residual=residual,
    )


def _fas_fwd(x, ln_scale, ln_bias, qkv_kernel, qkv_bias, proj_kernel,
             proj_bias, num_heads, eps, interpret, variant, head_dim,
             residual):
    y = fused_attn_sublayer(
        x, ln_scale, ln_bias, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
        num_heads=num_heads, eps=eps, interpret=interpret, variant=variant,
        head_dim=head_dim, residual=residual,
    )
    return y, (x, ln_scale, ln_bias, qkv_kernel, qkv_bias, proj_kernel)


def _fas_bwd(num_heads, eps, interpret, variant, head_dim, residual, res,
             dy):
    x, ln_scale, ln_bias, qkv_kernel, qkv_bias, proj_kernel = res
    dx, dg, db, dwqkv, dbqkv, dwp, dbp = _attn_sublayer_bwd(
        x, dy.astype(x.dtype), ln_scale, ln_bias, qkv_kernel, qkv_bias,
        proj_kernel, num_heads=num_heads, eps=eps, interpret=interpret,
        head_dim=head_dim, residual=residual,
    )
    return (dx, dg, db, dwqkv, dbqkv, dwp, dbp)


fused_attn_sublayer_trainable.defvjp(_fas_fwd, _fas_bwd)


def _gelu_grad(h_pre: jax.Array, approx: bool) -> jax.Array:
    """d gelu(x)/dx in fp32 for both GELU forms, Mosaic-lowerable.

    exact: Phi(x) + x*phi(x); tanh: d/dx 0.5x(1+tanh(c(x+a x^3))).
    """
    if approx:
        c = 0.7978845608028654  # sqrt(2/pi)
        a = 0.044715
        u = c * (h_pre + a * h_pre * h_pre * h_pre)
        t = jnp.tanh(u)
        return 0.5 * (1.0 + t) + 0.5 * h_pre * (1.0 - t * t) * c * (
            1.0 + 3.0 * a * h_pre * h_pre
        )
    phi = jnp.exp(-0.5 * h_pre * h_pre) * 0.3989422804014327  # 1/sqrt(2pi)
    cdf = 0.5 * (1.0 + _erf_poly(h_pre * (2.0 ** -0.5)))
    return cdf + h_pre * phi


def _row_chunks(l: int, target: int = 128):
    """Static row-chunk (start, size) list: sublane-aligned starts, a small
    tail (< target/2 rows) absorbed into the previous chunk so no tiny-K
    matmuls hit the weight-gradient contractions."""
    if l <= target:
        return [(0, l)]
    chunks = []
    s = 0
    while s < l:
        n = min(target, l - s)
        if 0 < l - (s + n) < max(target // 2, 8):
            n = l - s
        chunks.append((s, n))
        s += n
    return chunks


def _mlp_bwd_config(b: int, l: int, d: int, hidden: int, itemsize: int,
                    budget_bytes: int = 16_900_000):
    """Pick (group, row_target, hidden_chunk) for the MLP backward kernel.

    The fp32 dW1/dW2 accumulators + one activation-dtype copy of W1/W2 are
    VMEM-resident for the whole grid (2*d*hidden*(4+itemsize) bytes — 12.6MB
    at the flagship D=512/hidden=2048/bf16), so the row/hidden tiles must
    shrink until LN row buffers + hidden-chunk transients + double-buffered
    x/dy/dx blocks fit the remainder. Candidates degrade MXU efficiency
    gracefully: row_target 128 keeps the weight-grad contractions (K=rows)
    at full MXU rate; 64 halves them (2 of 5 matmuls). Returns None if
    nothing fits (caller falls back to the XLA recompute backward) — in
    particular D>=768 models (ImageNet-64/256 configs), whose fp32 dW
    accumulators alone exceed VMEM (18.9MB at D=768, hidden=3072).

    Probed on the real v5e (tools/probe_mlp_bwd.py, flagship B=128 L=257
    D=512 hidden=2048 bf16): (1,128,256) compiles at a ~16.1MB static
    estimate and is fastest (5.08ms isolated incl. dispatch overhead);
    every shrink (hc=128, rt=64/32, g=2) is monotonically slower — hence
    the generous default budget.
    """
    import os

    override = os.environ.get("DUODIFF_MLP_BWD_CFG")
    if override:
        # "g,row_target,hidden_chunk" probing knob. Read at TRACE time: a
        # new process per setting (jit caches the first traced config for
        # a given shape). In-process sweeps must pass config= explicitly
        # (tools/probe_mlp_bwd.py does). Invalid group/chunk sizes would
        # silently drop batch elements / misslice weights, so fall through
        # to the cascade instead of honoring them.
        g, rt, hc = (int(v) for v in override.split(","))
        # rt <= 0 would make _row_chunks loop forever at trace time
        if (g > 0 and rt > 0 and hc > 0 and b % g == 0
                and (hidden % hc == 0 or hidden == hc)):
            return g, rt, hc

    l_sub = _round_up(l, 8)
    fixed = 2 * d * hidden * (4 + itemsize) + 64 * 1024  # + small vec slack
    # g=1 only: g=2 measured ~12% slower at flagship shapes (the weight/
    # grad residents dominate VMEM; larger x blocks only shrink the
    # pipelining headroom) — tools/probe_mlp_bwd.py, 2026-08-16.
    for rt in (128, 64, 32):
        for hc in (256, 128, 64) if hidden > 256 else (hidden,):
            if hidden % hc:
                continue
            rn = _round_up(max(n for _, n in _row_chunks(l, rt)), 8)
            # live row buffers: x_hat/dy/dxn/dx-construction fp32, xn/dyb
            # activation dtype; hidden-chunk: h_pre/dh/dhp fp32 + 2 casts
            trans = rn * d * (4 * 4 + 2 * itemsize) + rn * hc * (
                3 * 4 + 2 * itemsize
            )
            io = 6 * l_sub * d * itemsize
            if fixed + trans + io <= budget_bytes:
                return 1, rt, hc
    return None


def _mlp_bwd_kernel(x_ref, dy_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref,
                    dx_ref, dg_ref, db_ref, dw1_ref, db1_ref, dw2_ref,
                    db2_ref, *, eps: float, gelu_approx: bool,
                    row_target: int, hc: int, residual: bool = True):
    """Backward of the fused MLP sublayer y = x + fc2(gelu(fc1(LN(x)))).

    Everything except the row-summed weight gradients is row-independent
    (LayerNorm normalizes per row), so the kernel streams (row-chunk,
    hidden-chunk) tiles: recompute LN + fc1 + gelu in VMEM, produce dx
    directly per row chunk, and accumulate dW1/dW2/db1/db2/dgamma/dbeta in
    fp32 VMEM across the sequential batch grid (constant-index outputs,
    zeroed at program 0 — same pattern as _attn_bwd_kernel). Zero HBM
    traffic beyond x/dy in and dx out: the (B, L, hidden) tensors the XLA
    recompute backward materializes never exist here.
    """
    @pl.when(pl.program_id(0) == 0)
    def _zero_accumulators():
        for r in (dg_ref, db_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
            r[:] = jnp.zeros_like(r)

    g, l, d = x_ref.shape
    hidden = w1_ref.shape[1]
    gamma = g_ref[0].astype(jnp.float32)
    beta = b_ref[0].astype(jnp.float32)
    bdt = x_ref.dtype

    for i in range(g):
        x2d = x_ref[i]
        dy2d = dy_ref[i]
        for r0, rn in _row_chunks(l, row_target):
            xv = jax.lax.slice(x2d, (r0, 0), (r0 + rn, d)).astype(jnp.float32)
            x_hat, rstd, xn_f = _ln_fwd(xv, gamma, beta, eps)
            xn = xn_f.astype(bdt)
            dy = jax.lax.slice(dy2d, (r0, 0), (r0 + rn, d)).astype(jnp.float32)
            dyb = dy.astype(bdt)
            db2_ref[:] += jnp.sum(dy, axis=0, keepdims=True)
            dxn = jnp.zeros((rn, d), jnp.float32)
            for c0 in range(0, hidden, hc):
                w1c = w1_ref[:, c0:c0 + hc]              # (D, hc)
                h_pre = jnp.dot(
                    xn, w1c, preferred_element_type=jnp.float32
                ) + b1_ref[0, c0:c0 + hc].astype(jnp.float32)
                hgb = _gelu(h_pre, gelu_approx).astype(bdt)
                # dW2[c] += h^T @ dy (contract rows)
                dw2_ref[c0:c0 + hc, :] += jax.lax.dot_general(
                    hgb, dyb, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                # dh = dy @ W2[c]^T (contract D)
                dh = jax.lax.dot_general(
                    dyb, w2_ref[c0:c0 + hc, :], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dhp = dh * _gelu_grad(h_pre, gelu_approx)
                db1_ref[:, c0:c0 + hc] += jnp.sum(dhp, axis=0, keepdims=True)
                dhpb = dhp.astype(bdt)
                # dW1[:, c] += xn^T @ dh_pre (contract rows)
                dw1_ref[:, c0:c0 + hc] += jax.lax.dot_general(
                    xn, dhpb, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                # dxn += dh_pre @ W1[:, c]^T (contract hidden chunk)
                dxn = dxn + jax.lax.dot_general(
                    dhpb, w1c, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            dg_ref[:] += jnp.sum(dxn * x_hat, axis=0, keepdims=True)
            db_ref[:] += jnp.sum(dxn, axis=0, keepdims=True)
            dx = _ln_bwd_dx(dxn, x_hat, rstd, gamma)
            if residual:
                dx = dx + dy
            dx_ref[i, r0:r0 + rn, :] = dx.astype(dx_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("eps", "gelu_approx", "interpret", "config",
                              "residual")
)
def _mlp_sublayer_bwd_impl(
    x, dy, ln_scale, ln_bias, w1, b1, w2,
    *, eps: float, gelu_approx: bool, interpret: bool,
    config: tuple | None = None, residual: bool = True,
):
    b, l, d = x.shape
    hidden = w1.shape[1]
    dtype = x.dtype
    itemsize = jnp.dtype(dtype).itemsize

    cfg = config or _mlp_bwd_config(b, l, d, hidden, itemsize)
    assert cfg is not None, "caller must check mlp_bwd_fits first"
    grp, row_target, hc = cfg
    row = pl.BlockSpec((grp, l, d), lambda i: (i, 0, 0))
    vec_d = pl.BlockSpec((1, d), lambda i: (0, 0))
    vec_h = pl.BlockSpec((1, hidden), lambda i: (0, 0))
    const_dh = pl.BlockSpec((d, hidden), lambda i: (0, 0))
    const_hd = pl.BlockSpec((hidden, d), lambda i: (0, 0))

    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(
            _mlp_bwd_kernel, eps=eps, gelu_approx=gelu_approx,
            row_target=row_target, hc=hc, residual=residual,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, l, d), dtype),      # dx
            jax.ShapeDtypeStruct((1, d), f32),           # d ln_scale
            jax.ShapeDtypeStruct((1, d), f32),           # d ln_bias
            jax.ShapeDtypeStruct((d, hidden), f32),      # dW1
            jax.ShapeDtypeStruct((1, hidden), f32),      # db1
            jax.ShapeDtypeStruct((hidden, d), f32),      # dW2
            jax.ShapeDtypeStruct((1, d), f32),           # db2
        ),
        grid=(b // grp,),
        in_specs=[row, row, vec_d, vec_d, const_dh, vec_h, const_hd],
        out_specs=(row, vec_d, vec_d, const_dh, vec_h, const_hd, vec_d),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * l * d * hidden,
            bytes_accessed=3 * b * l * d * itemsize,
            transcendentals=2 * b * l * hidden,
        ),
        interpret=interpret,
    )(
        x, dy,
        ln_scale.reshape(1, d), ln_bias.reshape(1, d),
        w1.astype(dtype), b1.astype(jnp.float32).reshape(1, hidden),
        w2.astype(dtype),
    )
    dx, dg, db, dw1, db1, dw2, db2 = outs
    return (dx, dg.reshape(d), db.reshape(d), dw1, db1.reshape(hidden),
            dw2, db2.reshape(d))


def _mlp_bwd_partial_kernel(x_ref, dy_ref, g_ref, b_ref, w1_ref, b1_ref,
                            w2_ref, dxn_ref, dw1_ref, db1_ref, dw2_ref,
                            *, eps: float, gelu_approx: bool,
                            row_target: int, hc: int):
    """Hidden-slice partial of the MLP-sublayer backward.

    Same streaming structure as _mlp_bwd_kernel, but covers only a slice of
    the hidden dimension (w1_ref is (D, hidden/splits)): emits the slice's
    dxn contribution (fp32) instead of dx, and the slice's dW1/db1/dW2.
    The caller sums the dxn partials and finishes the LayerNorm backward
    (dx, dgamma, dbeta) plus db2 in XLA — that recombination touches only
    (B, L, D)-sized tensors, so the (B, L, hidden) recompute activations
    still never exist. This extends the fused backward to D>=768 models
    (ImageNet-64/256), whose full-width fp32 dW accumulators (28.3MB at
    D=768) exceed the ~24MB effective Mosaic VMEM ceiling.
    """
    @pl.when(pl.program_id(0) == 0)
    def _zero_accumulators():
        for r in (dw1_ref, db1_ref, dw2_ref):
            r[:] = jnp.zeros_like(r)

    g, l, d = x_ref.shape
    hs = w1_ref.shape[1]
    gamma = g_ref[0].astype(jnp.float32)
    beta = b_ref[0].astype(jnp.float32)
    bdt = x_ref.dtype

    for i in range(g):
        x2d = x_ref[i]
        dy2d = dy_ref[i]
        for r0, rn in _row_chunks(l, row_target):
            xv = jax.lax.slice(x2d, (r0, 0), (r0 + rn, d)).astype(jnp.float32)
            _, _, xn_f = _ln_fwd(xv, gamma, beta, eps)
            xn = xn_f.astype(bdt)
            dy = jax.lax.slice(dy2d, (r0, 0), (r0 + rn, d)).astype(jnp.float32)
            dyb = dy.astype(bdt)
            dxn = jnp.zeros((rn, d), jnp.float32)
            for c0 in range(0, hs, hc):
                w1c = w1_ref[:, c0:c0 + hc]              # (D, hc)
                h_pre = jnp.dot(
                    xn, w1c, preferred_element_type=jnp.float32
                ) + b1_ref[0, c0:c0 + hc].astype(jnp.float32)
                hgb = _gelu(h_pre, gelu_approx).astype(bdt)
                dw2_ref[c0:c0 + hc, :] += jax.lax.dot_general(
                    hgb, dyb, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dh = jax.lax.dot_general(
                    dyb, w2_ref[c0:c0 + hc, :], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dhp = dh * _gelu_grad(h_pre, gelu_approx)
                db1_ref[:, c0:c0 + hc] += jnp.sum(dhp, axis=0, keepdims=True)
                dhpb = dhp.astype(bdt)
                dw1_ref[:, c0:c0 + hc] += jax.lax.dot_general(
                    xn, dhpb, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dxn = dxn + jax.lax.dot_general(
                    dhpb, w1c, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            dxn_ref[i, r0:r0 + rn, :] = dxn


def _mlp_bwd_split_config(b: int, l: int, d: int, hidden: int,
                          itemsize: int,
                          budget_bytes: int = 16_900_000):
    """Pick (splits, row_target, hidden_chunk) for the hidden-split MLP
    backward: the smallest split count whose per-call residents
    (2*d*(hidden/splits)*(4+itemsize) fp32 dW slice + weight-slice copy)
    plus transients fit the budget. Returns None when even splits=8 doesn't
    fit (caller falls back to the XLA recompute backward)."""
    import os

    override = os.environ.get("DUODIFF_MLP_BWD_SPLIT_CFG")
    if override:
        s, rt, hc = (int(v) for v in override.split(","))
        hs = hidden // s if s > 0 and hidden % s == 0 else 0
        if (s > 1 and rt > 0 and hc > 0 and hs > 0
                and (hs % hc == 0 or hs == hc)):
            return s, rt, hc

    l_sub = _round_up(l, 8)
    for splits in (2, 4, 8):
        if hidden % splits:
            continue
        hs = hidden // splits
        fixed = 2 * d * hs * (4 + itemsize) + 64 * 1024
        for rt in (128, 64, 32):
            for hc in (256, 128, 64) if hs > 256 else (hs,):
                if hs % hc:
                    continue
                rn = _round_up(max(n for _, n in _row_chunks(l, rt)), 8)
                trans = rn * d * (4 * 4 + 2 * itemsize) + rn * hc * (
                    3 * 4 + 2 * itemsize
                )
                # x/dy in (itemsize) + dxn out (fp32), double-buffered
                io = 4 * l_sub * d * itemsize + 2 * l_sub * d * 4
                if fixed + trans + io <= budget_bytes:
                    return splits, rt, hc
    return None


@functools.partial(
    jax.jit, static_argnames=("eps", "gelu_approx", "interpret", "config")
)
def _mlp_sublayer_bwd_split(
    x, dy, ln_scale, ln_bias, w1, b1, w2,
    *, eps: float, gelu_approx: bool, interpret: bool,
    config: tuple | None = None,
):
    """Hidden-split MLP-sublayer backward: one pallas call per hidden slice
    (each fitting VMEM), dxn partials summed and the LayerNorm backward
    finished in XLA. Numerics match _mlp_sublayer_bwd_impl to fp32
    rounding: identical per-slice accumulation order, fp32 dxn partials."""
    b, l, d = x.shape
    hidden = w1.shape[1]
    dtype = x.dtype
    itemsize = jnp.dtype(dtype).itemsize

    cfg = config or _mlp_bwd_split_config(b, l, d, hidden, itemsize)
    assert cfg is not None, "caller must check _mlp_bwd_split_config first"
    splits, row_target, hc = cfg
    hs = hidden // splits

    row = pl.BlockSpec((1, l, d), lambda i: (i, 0, 0))
    vec_d = pl.BlockSpec((1, d), lambda i: (0, 0))
    vec_h = pl.BlockSpec((1, hs), lambda i: (0, 0))
    const_dh = pl.BlockSpec((d, hs), lambda i: (0, 0))
    const_hd = pl.BlockSpec((hs, d), lambda i: (0, 0))
    f32 = jnp.float32

    g2 = ln_scale.reshape(1, d)
    b2v = ln_bias.reshape(1, d)
    w1c = w1.astype(dtype)
    b1f = b1.astype(f32).reshape(1, hidden)
    w2c = w2.astype(dtype)

    dxn = None
    dw1s, db1s, dw2s = [], [], []
    for s in range(splits):
        lo = s * hs
        dxn_s, dw1_s, db1_s, dw2_s = pl.pallas_call(
            functools.partial(
                _mlp_bwd_partial_kernel, eps=eps, gelu_approx=gelu_approx,
                row_target=row_target, hc=hc,
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, l, d), f32),    # dxn partial
                jax.ShapeDtypeStruct((d, hs), f32),      # dW1 slice
                jax.ShapeDtypeStruct((1, hs), f32),      # db1 slice
                jax.ShapeDtypeStruct((hs, d), f32),      # dW2 slice
            ),
            grid=(b,),
            in_specs=[row, row, vec_d, vec_d, const_dh, vec_h, const_hd],
            out_specs=(row, const_dh, vec_h, const_hd),
            cost_estimate=pl.CostEstimate(
                flops=5 * 2 * b * l * d * hs,
                bytes_accessed=(2 * itemsize + 4) * b * l * d,
                transcendentals=2 * b * l * hs,
            ),
            interpret=interpret,
        )(
            x, dy, g2, b2v,
            w1c[:, lo:lo + hs], b1f[:, lo:lo + hs], w2c[lo:lo + hs, :],
        )
        dxn = dxn_s if dxn is None else dxn + dxn_s
        dw1s.append(dw1_s)
        db1s.append(db1_s)
        dw2s.append(dw2_s)

    # XLA recombination: finish the LayerNorm backward on (B, L, D) tensors
    xv = x.astype(f32)
    x_hat, rstd, _ = _ln_fwd(
        xv, ln_scale.astype(f32), ln_bias.astype(f32), eps
    )
    dg = jnp.sum(dxn * x_hat, axis=(0, 1))
    db = jnp.sum(dxn, axis=(0, 1))
    dyf = dy.astype(f32)
    dx = (dyf + _ln_bwd_dx(dxn, x_hat, rstd, ln_scale.astype(f32))).astype(
        dtype
    )
    db2 = jnp.sum(dyf, axis=(0, 1))
    return (
        dx, dg, db,
        jnp.concatenate(dw1s, axis=1),
        jnp.concatenate(db1s, axis=1).reshape(hidden),
        jnp.concatenate(dw2s, axis=0),
        db2,
    )


def mlp_bwd_fits(b: int, l: int, d: int, hidden: int, itemsize: int) -> bool:
    """Whether the Pallas MLP backward's VMEM working set fits (fp32
    activations at flagship shapes don't — those fall back to the XLA
    recompute backward in _fms_bwd)."""
    return _mlp_bwd_config(b, l, d, hidden, itemsize) is not None


def _mlp_reference(x, ln_scale, ln_bias, w1, b1, w2, b2, *, eps, gelu_approx,
                   residual=True):
    """Pure-XLA replica of _mlp_kernel's numerics, used as the recompute
    backward of fused_mlp_sublayer (one extra fc1-fwd matmul instead of
    saving the (B, L, 4D) hidden activation to HBM)."""
    xv = x.astype(jnp.float32)
    _, _, xn_f = _ln_fwd(xv, ln_scale.astype(jnp.float32),
                         ln_bias.astype(jnp.float32), eps)
    h = jnp.dot(
        xn_f.astype(x.dtype), w1.astype(x.dtype),
        preferred_element_type=jnp.float32,
    ) + b1.astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=gelu_approx).astype(x.dtype)
    out = jnp.dot(h, w2.astype(x.dtype), preferred_element_type=jnp.float32)
    if residual:
        out = out + xv
    return (out + b2.astype(jnp.float32)).astype(x.dtype)


def _mlp_sublayer_bwd(
    x, dy, ln_scale, ln_bias, w1, b1, w2, b2,
    *, eps: float, gelu_approx: bool, interpret: bool,
    residual: bool = True,
):
    """MLP-sublayer backward dispatch: the monolithic Pallas kernel when its
    full-width dW residents fit VMEM (D<=512-class models), else the XLA
    recompute backward. Returns (dx, dg, db, dw1, db1, dw2, db2).

    The hidden-split Pallas variant is available behind
    DUODIFF_MLP_BWD_SPLIT=1 but NOT the default: on-chip at D=768
    (imagenet64, B=128 L=258 bf16) the best compilable split config
    (splits=4, rt=128, hc=256) measures 11.63 ms vs 10.56 for the XLA
    recompute backward (tools/probe_mlp_bwd_split.py, 2026-08-17; splits=2
    fails Mosaic compile at ~20MB residents). The per-split x/dy refetch +
    fp32 dxn round-trips cost more than XLA's hidden-activation
    materialization saves at these shapes."""
    import os

    b_, l, d = x.shape
    hidden = w1.shape[1]
    itemsize = jnp.dtype(x.dtype).itemsize
    if mlp_bwd_fits(b_, l, d, hidden, itemsize):
        return _mlp_sublayer_bwd_impl(
            x, dy.astype(x.dtype), ln_scale, ln_bias, w1, b1, w2,
            eps=eps, gelu_approx=gelu_approx, interpret=interpret,
            residual=residual,
        )
    if (residual
            and os.environ.get("DUODIFF_MLP_BWD_SPLIT") == "1"
            and _mlp_bwd_split_config(b_, l, d, hidden, itemsize) is not None):
        return _mlp_sublayer_bwd_split(
            x, dy.astype(x.dtype), ln_scale, ln_bias, w1, b1, w2,
            eps=eps, gelu_approx=gelu_approx, interpret=interpret,
        )
    _, vjp = jax.vjp(
        functools.partial(_mlp_reference, eps=eps, gelu_approx=gelu_approx,
                          residual=residual),
        x, ln_scale, ln_bias, w1, b1, w2, b2,
    )
    return vjp(dy.astype(x.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_mlp_sublayer_trainable(
    x, ln_scale, ln_bias, w1, b1, w2, b2,
    eps=1e-5, gelu_approx=False, interpret=False, residual=True,
):
    """fused_mlp_sublayer with a recompute (XLA) backward."""
    return fused_mlp_sublayer(
        x, ln_scale, ln_bias, w1, b1, w2, b2,
        eps=eps, gelu_approx=gelu_approx, interpret=interpret,
        residual=residual,
    )


def _fms_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, gelu_approx,
             interpret, residual):
    y = fused_mlp_sublayer(
        x, ln_scale, ln_bias, w1, b1, w2, b2,
        eps=eps, gelu_approx=gelu_approx, interpret=interpret,
        residual=residual,
    )
    return y, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _fms_bwd(eps, gelu_approx, interpret, residual, res, dy):
    x, ln_scale, ln_bias, w1, b1, w2, b2 = res
    return tuple(_mlp_sublayer_bwd(
        x, dy, ln_scale, ln_bias, w1, b1, w2, b2,
        eps=eps, gelu_approx=gelu_approx, interpret=interpret,
        residual=residual,
    ))


fused_mlp_sublayer_trainable.defvjp(_fms_fwd, _fms_bwd)


@functools.partial(
    jax.jit, static_argnames=("eps", "gelu_approx", "interpret", "residual")
)
def fused_mlp_sublayer(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    fc1_kernel: jax.Array,
    fc1_bias: jax.Array,
    fc2_kernel: jax.Array,
    fc2_bias: jax.Array,
    *,
    eps: float = 1e-5,
    gelu_approx: bool = False,
    interpret: bool = False,
    residual: bool = True,
) -> jax.Array:
    """Compute ``x + fc2(gelu(fc1(layernorm(x))))`` in one kernel.

    The hidden (L, mlp_ratio*D) activation never touches HBM (the XLA version
    writes + re-reads it between the two matmuls), and LayerNorm statistics
    stay fp32 in VMEM. The kernel is shape-general in ``hidden``: a TP shard
    passes its local fc1 columns / fc2 rows with residual=False and psums
    the partial outside (parallel/tp_fused.py).
    """
    b, l, d = x.shape
    hidden = fc1_kernel.shape[1]
    dtype = x.dtype
    itemsize = jnp.dtype(dtype).itemsize

    if not interpret and not mlp_fwd_fits(l, d, hidden, itemsize):
        # even g=1 exceeds VMEM (e.g. fp32 at D>=768): XLA fallback with
        # the same numerics
        return _mlp_reference(
            x, ln_scale, ln_bias, fc1_kernel, fc1_bias, fc2_kernel,
            fc2_bias, eps=eps, gelu_approx=gelu_approx, residual=residual,
        )

    grp = _group_size_mlp(b, l, d, hidden, itemsize)
    row = pl.BlockSpec((grp, l, d), lambda i: (i, 0, 0))
    vec_d = pl.BlockSpec((1, d), lambda i: (0, 0))
    vec_h = pl.BlockSpec((1, hidden), lambda i: (0, 0))
    return pl.pallas_call(
        functools.partial(_mlp_kernel, eps=eps, gelu_approx=gelu_approx,
                          residual=residual),
        out_shape=jax.ShapeDtypeStruct((b, l, d), dtype),
        grid=(b // grp,),
        in_specs=[
            row, vec_d, vec_d,
            pl.BlockSpec((d, hidden), lambda i: (0, 0)),
            vec_h,
            pl.BlockSpec((hidden, d), lambda i: (0, 0)),
            vec_d,
        ],
        out_specs=row,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * l * d * hidden,
            bytes_accessed=2 * b * l * d * itemsize,
            transcendentals=b * l * hidden,
        ),
        interpret=interpret,
    )(
        x,
        ln_scale.reshape(1, d),
        ln_bias.reshape(1, d),
        fc1_kernel.astype(dtype),
        fc1_bias.astype(jnp.float32).reshape(1, hidden),
        fc2_kernel.astype(dtype),
        fc2_bias.astype(jnp.float32).reshape(1, d),
    )


@functools.partial(
    jax.jit, static_argnames=("num_heads", "eps", "interpret", "variant",
                              "head_dim", "residual")
)
def fused_attn_sublayer(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    qkv_kernel: jax.Array,
    qkv_bias: jax.Array | None,
    proj_kernel: jax.Array,
    proj_bias: jax.Array,
    *,
    num_heads: int,
    eps: float = 1e-5,
    interpret: bool = False,
    variant: str = "v2",
    head_dim: int | None = None,
    residual: bool = True,
) -> jax.Array:
    """Compute ``x + proj(attention(qkv(layernorm(x))))`` in one kernel.

    Args:
      x: (B, L, D) residual stream, any float dtype (activations run in it).
      ln_scale, ln_bias: (D,) LayerNorm affine parameters.
      qkv_kernel: (D, 3A) packed projection, reference column order
        "(K H Dh)" (reference models/uvit.py:150,159); A = num_heads *
        head_dim is D single-chip and D/mp for a TP shard's local heads.
      qkv_bias: (3A,) packed bias or None.
      proj_kernel: (A, D); proj_bias: (D,).
      variant: "v2" (batch grid, full-width QKV matmul, unrolled head loop)
        or "v1" ((batch, head) grid with per-head weight blocks).
      head_dim: per-head width; default D // num_heads (the single-chip
        square case). Pass it explicitly when A != D (tensor parallelism).
      residual: include the ``x +`` term. False emits the bare projection
        (plus proj_bias) — the TP-shard partial summed by the psum in
        parallel/tp_fused.py.
    Returns:
      (B, L, D) in x's dtype.
    """
    b, l, d = x.shape
    h = num_heads
    dh = head_dim if head_dim is not None else d // h
    da = h * dh
    assert qkv_kernel.shape == (d, 3 * da), (qkv_kernel.shape, d, da)
    assert proj_kernel.shape == (da, d), (proj_kernel.shape, da, d)
    scale = float(dh) ** -0.5
    dtype = x.dtype
    itemsize = jnp.dtype(dtype).itemsize

    if not interpret and not attn_fwd_fits(l, d, itemsize):
        # even g=1 exceeds VMEM (fp32 weights at D>=768): XLA fallback
        # with the same numerics
        return _attn_sublayer_reference(
            x, ln_scale, ln_bias, qkv_kernel, qkv_bias, proj_kernel,
            proj_bias, num_heads=num_heads, eps=eps, head_dim=dh,
            residual=residual,
        )

    bp = proj_bias.astype(jnp.float32).reshape(1, d)
    g2 = ln_scale.reshape(1, d)
    b2 = ln_bias.reshape(1, d)
    cost = pl.CostEstimate(
        # qkv 3*2*l*d*da + proj 2*l*da*d + attention 4*l*l*da per sample
        flops=2 * b * l * da * (4 * d + 2 * l),
        bytes_accessed=2 * b * l * d * itemsize,
        transcendentals=b * h * l * l,
    )

    if variant == "v2":
        # softmax scale pre-folded into the q columns (and bias entries):
        # loop-invariant, hoisted by XLA; the hand-written VJP never sees
        # these prescaled copies, so gradients stay wrt the originals
        wqkv = jnp.concatenate(
            [qkv_kernel[:, :da] * scale, qkv_kernel[:, da:]], axis=1
        ).astype(dtype)                             # (D, 3A), packed (K H Dh)
        wp = proj_kernel.astype(dtype)              # (A, D), rows (H Dh)
        grp = _group_size_v2(b, l, d, itemsize)
        row = pl.BlockSpec((grp, l, d), lambda i: (i, 0, 0))
        vec = pl.BlockSpec((1, d), lambda i: (0, 0))
        in_specs = [
            row, vec, vec,
            pl.BlockSpec((d, 3 * da), lambda i: (0, 0)),  # wqkv
        ]
        args = [x, g2, b2, wqkv]
        if qkv_bias is not None:
            in_specs.append(pl.BlockSpec((1, 3 * da), lambda i: (0, 0)))
            bq = jnp.concatenate([qkv_bias[:da] * scale, qkv_bias[da:]])
            args.append(bq.astype(jnp.float32).reshape(1, 3 * da))
        in_specs += [
            pl.BlockSpec((da, d), lambda i: (0, 0)),  # wproj
            vec,
        ]
        args += [wp, bp]
        return pl.pallas_call(
            functools.partial(
                _kernel_v2,
                num_heads=h,
                head_dim=dh,
                eps=eps,
                has_qkv_bias=qkv_bias is not None,
                residual=residual,
            ),
            out_shape=jax.ShapeDtypeStruct((b, l, d), dtype),
            grid=(b // grp,),
            in_specs=in_specs,
            out_specs=row,
            cost_estimate=cost,
            interpret=interpret,
        )(*args)
    assert da == d and residual, (
        "variant 'v1' supports only the square residual form"
    )

    # v1: (batch, head) grid with per-head weight blocks
    wqkv = (
        qkv_kernel.astype(dtype).reshape(d, 3, h, dh).transpose(1, 2, 0, 3)
    )
    wp = proj_kernel.astype(dtype).reshape(h, dh, d)

    grp = _group_size(b, l, d, dh, itemsize)

    row = pl.BlockSpec((grp, l, d), lambda i, j: (i, 0, 0))
    full_vec = pl.BlockSpec((1, d), lambda i, j: (0, 0))
    in_specs = [
        row,                                                # x
        full_vec, full_vec,                                 # ln scale/bias
        pl.BlockSpec((3, 1, d, dh), lambda i, j: (0, j, 0, 0)),  # wqkv
    ]
    args = [x, g2, b2, wqkv]
    if qkv_bias is not None:
        bq = qkv_bias.astype(jnp.float32).reshape(3, h, dh)
        in_specs.append(pl.BlockSpec((3, 1, dh), lambda i, j: (0, j, 0)))
        args.append(bq)
    in_specs += [
        pl.BlockSpec((1, dh, d), lambda i, j: (j, 0, 0)),   # wproj
        full_vec,                                           # proj bias
    ]
    args += [wp, bp]

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            num_heads=h,
            scale=scale,
            eps=eps,
            has_qkv_bias=qkv_bias is not None,
        ),
        out_shape=jax.ShapeDtypeStruct((b, l, d), dtype),
        grid=(b // grp, h),
        in_specs=in_specs,
        out_specs=row,
        scratch_shapes=[
            pltpu.VMEM((grp, l, d), dtype),        # LayerNorm output
            pltpu.VMEM((grp, l, d), jnp.float32),  # residual/proj accumulator
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(*args)
    return out

"""Int8 (W8A8) variants of the fused sublayer kernels — sampling only.

The v5e MXU runs int8 x int8 -> int32 at ~2x the bf16 rate (measured on this
chip: 369.7 TOP/s vs 192.6 TF/s at 4096^3, tools/probe_int8.py — chained
kernel timing, 1.42x at the (257, 512) x (512, 512) fused-kernel geometry
including the dynamic activation quantization). Since the weight matmuls are
~93% of a U-ViT sampling step's FLOPs (the (L, L) SDPA contractions at
Dh = 64 are the rest), quantizing weights to int8 ahead of time and
activations dynamically per token inside the kernels buys a large fraction of
that 2x on the sampling path.

Scheme (standard dynamic W8A8, cf. LLM.int8/SmoothQuant-style serving paths):
  - weights: symmetric per-output-channel int8, quantized ONCE at trace time
    from the fp32 params (loop-invariant, so XLA hoists the quantization out
    of the sampling scan exactly like the bf16 path's softmax-scale fold);
  - activations: symmetric per-row (per-token) int8, computed in fp32 inside
    the kernel right after LayerNorm / GELU — the quantization fuses into the
    epilogue of the op that produced the activation, and the int32
    accumulator is dequantized with a rank-1 (row_scale x col_scale) outer
    product in the matmul epilogue;
  - the SDPA core (q k^T, softmax, p v) stays in bf16 with fp32 softmax —
    attention probabilities are the quality-sensitive part and the
    (L, L) x (L, Dh) contractions are MXU-half-rate anyway, so quantizing
    them buys little and risks much.

This path changes sampled values (it is NOT the parity path): it is an
opt-in speed knob (`--attn_impl fused_int8` on the sampling CLIs), with its
quality impact measured on-chip rather than assumed. Training is
unsupported (no VJP) by design.

No counterpart exists in the reference (torch eager fp32/AMP only); the
closest reference surface is the sampling CLIs these kernels accelerate
(reference sampler.py:82-155, eesampler.py:40-89).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from duodiff_tpu.ops.pallas_block import (
    _erf_poly,
    _group_size_mlp,
    _group_size_v2,
    _ln_fwd,
    attn_fwd_fits,
    mlp_fwd_fits,
)


def quantize_weight_int8(w: jax.Array, extra_col_scale=None):
    """Symmetric per-output-channel int8 quantization of a (K, N) kernel.

    Returns (w8 int8 (K, N), col_scale f32 (1, N)) with
    ``w ~= w8 * col_scale``. ``extra_col_scale`` (scalar or (1, N)) is folded
    into the returned scale — used to fold the softmax scale into the q
    columns without touching the int8 values.
    """
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)  # (1, N)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    w8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    if extra_col_scale is not None:
        scale = scale * extra_col_scale
    return w8, scale


def _quant_rows(x: jax.Array):
    """Symmetric per-row int8 quantization of a (L, D) fp32 activation.

    Returns (x8 int8, row_scale f32 (L, 1)) with ``x ~= x8 * row_scale``.
    Multiplies by the reciprocal scale (one VPU divide per row, not per
    element).
    """
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)  # (L, 1)
    inv = jnp.where(amax > 0, 127.0 / amax, 1.0)
    x8 = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
    return x8, amax / 127.0


def _quant_rows_static(x: jax.Array, inv_scale: float):
    """Static-scale int8 quantization: one fused multiply-round-clip, no
    row-amax reduce (the matching ``scale/127`` dequant factor is folded
    into the weight column scales by the caller)."""
    return jnp.clip(jnp.round(x * inv_scale), -127, 127).astype(jnp.int8)


def _dot_int8(x8, w8):
    return jax.lax.dot_general(
        x8, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _gelu_f32(h: jax.Array, approx: bool) -> jax.Array:
    if approx:
        return jax.nn.gelu(h, approximate=True)
    return 0.5 * h * (1.0 + _erf_poly(h * (2.0 ** -0.5)))


def _kernel_v2_int8(*refs, num_heads: int, eps: float, has_qkv_bias: bool):
    """Int8 twin of pallas_block._kernel_v2: LN (fp32) -> per-row quant ->
    int8 QKV matmul -> rank-1 dequant (+ prescaled bias) -> bf16 SDPA with
    post-normalized fp32 softmax -> per-row quant of the merged heads ->
    int8 output projection -> dequant + residual."""
    if has_qkv_bias:
        (x_ref, g_ref, b_ref, wqkv_ref, sqkv_ref, bqkv_ref,
         wp_ref, sp_ref, bp_ref, o_ref) = refs
    else:
        (x_ref, g_ref, b_ref, wqkv_ref, sqkv_ref,
         wp_ref, sp_ref, bp_ref, o_ref) = refs
        bqkv_ref = None

    g, l, d = x_ref.shape
    dh = d // num_heads
    bdt = x_ref.dtype
    for i in range(g):
        xv = x_ref[i].astype(jnp.float32)  # (L, D)
        _, _, xn = _ln_fwd(xv, g_ref[0].astype(jnp.float32),
                           b_ref[0].astype(jnp.float32), eps)
        x8, rs = _quant_rows(xn)
        acc = _dot_int8(x8, wqkv_ref[:])  # (L, 3D) int32
        qkv = acc.astype(jnp.float32) * (rs * sqkv_ref[0])
        if has_qkv_bias:
            qkv = qkv + bqkv_ref[0].astype(jnp.float32)
        qkv = qkv.astype(bdt)  # (L, 3D) packed (K H Dh), q pre-scaled

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
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.dot(e.astype(bdt), v, preferred_element_type=jnp.float32)
            heads.append((o / denom).astype(bdt))
        merged = jnp.concatenate(heads, axis=1).astype(jnp.float32)  # (L, D)
        m8, mrs = _quant_rows(merged)
        pacc = _dot_int8(m8, wp_ref[:])
        proj = pacc.astype(jnp.float32) * (mrs * sp_ref[0])
        o_ref[i] = (xv + proj + bp_ref[0].astype(jnp.float32)).astype(
            o_ref.dtype
        )


def _mlp_kernel_int8(x_ref, g_ref, b_ref, w1_ref, s1_ref, b1_ref,
                     w2_ref, s2_ref, b2_ref, *rest,
                     eps: float, gelu_approx: bool,
                     use_static_scales: bool = False):
    """Int8 twin of pallas_block._mlp_kernel: LN -> quant -> int8 fc1 ->
    dequant + bias -> GELU (fp32) -> quant -> int8 fc2 -> dequant +
    residual.

    ``static_scales=(sx, sh)`` (calibrated activation amax for the post-LN
    and post-GELU sites) replaces the per-row dynamic quantization with a
    single multiply-round-clip per site: the row amax reduce, per-row
    reciprocal, and the rank-1 (row x col) dequant epilogue all disappear —
    the sx/127, sh/127 row factors are pre-folded into s1/s2 by the wrapper.
    Measured 11% faster per call at the flagship geometry
    (tools/probe_int8_static.py); activations beyond the calibrated range
    clip at +-127 * scale (graceful saturation, not wraparound).

    The per-block inverse scales ride in as a (1, 2) f32 OPERAND
    (``inv_ref`` = [127/sx, 127/sh]), not as baked Python constants —
    every Block of a depth-13 model shares ONE compiled kernel instead of
    Mosaic-compiling 13 twins differing only in two scalar literals.
    """
    if use_static_scales:
        inv_ref, o_ref = rest
    else:
        (o_ref,) = rest
    g, l, d = x_ref.shape
    for i in range(g):
        xv = x_ref[i].astype(jnp.float32)  # (L, D)
        _, _, xn = _ln_fwd(xv, g_ref[0].astype(jnp.float32),
                           b_ref[0].astype(jnp.float32), eps)
        if use_static_scales:
            x8 = _quant_rows_static(xn, inv_ref[0, 0])
            h = _dot_int8(x8, w1_ref[:]).astype(jnp.float32) * s1_ref[0]
        else:
            x8, rs = _quant_rows(xn)
            h = _dot_int8(x8, w1_ref[:]).astype(jnp.float32) * (rs * s1_ref[0])
        h = _gelu_f32(h + b1_ref[0].astype(jnp.float32), gelu_approx)
        if use_static_scales:
            h8 = _quant_rows_static(h, inv_ref[0, 1])
            out = _dot_int8(h8, w2_ref[:]).astype(jnp.float32) * s2_ref[0]
        else:
            h8, hrs = _quant_rows(h)
            out = _dot_int8(h8, w2_ref[:]).astype(jnp.float32) * (hrs * s2_ref[0])
        o_ref[i] = (xv + out + b2_ref[0].astype(jnp.float32)).astype(
            o_ref.dtype
        )


# ---------------------------------------------------------------------------
# XLA reference implementations with IDENTICAL quantization math — the
# numerics contract for the kernels (interpret-mode parity tests) and the
# fallback when the kernel doesn't fit VMEM.
# ---------------------------------------------------------------------------


def _attn_sublayer_int8_reference(
    x, ln_scale, ln_bias, wqkv8, sqkv, bqkv, wp8, sp, proj_bias,
    *, num_heads: int, eps: float,
):
    b, l, d = x.shape
    h = num_heads
    dh = d // h
    bdt = x.dtype
    xv = x.astype(jnp.float32)
    _, _, xn = _ln_fwd(xv, ln_scale.astype(jnp.float32),
                       ln_bias.astype(jnp.float32), eps)
    x8, rs = _quant_rows(xn)
    acc = jax.lax.dot_general(
        x8, wqkv8, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    qkv = acc.astype(jnp.float32) * (rs * sqkv)
    if bqkv is not None:
        qkv = qkv + bqkv.astype(jnp.float32)
    qkv = qkv.astype(bdt).reshape(b, l, 3, h, dh)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3)  # (B, H, L, Dh)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    s = jnp.einsum(
        "bhqe,bhke->bhqk", q, k, preferred_element_type=jnp.float32
    )
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.einsum(
        "bhqk,bhke->bhqe", e.astype(bdt), v,
        preferred_element_type=jnp.float32,
    )
    o = (o / denom).astype(bdt)
    merged = o.transpose(0, 2, 1, 3).reshape(b, l, d).astype(jnp.float32)
    m8, mrs = _quant_rows(merged)
    pacc = jax.lax.dot_general(
        m8, wp8, (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    proj = pacc.astype(jnp.float32) * (mrs * sp)
    return (xv + proj + proj_bias.astype(jnp.float32)).astype(bdt)


def _mlp_int8_reference(x, ln_scale, ln_bias, w1_8, s1, b1, w2_8, s2, b2,
                        *, eps: float, gelu_approx: bool,
                        static_scales=None):
    xv = x.astype(jnp.float32)
    _, _, xn = _ln_fwd(xv, ln_scale.astype(jnp.float32),
                       ln_bias.astype(jnp.float32), eps)
    if static_scales is None:
        x8, rs = _quant_rows(xn)
        rs1 = rs * s1
    else:
        x8 = _quant_rows_static(xn, 127.0 / static_scales[0])
        rs1 = s1  # sx/127 pre-folded into s1 by the wrapper
    h = jax.lax.dot_general(
        x8, w1_8, (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32) * rs1
    h = _gelu_f32(h + b1.astype(jnp.float32), gelu_approx)
    if static_scales is None:
        h8, hrs = _quant_rows(h)
        rs2 = hrs * s2
    else:
        h8 = _quant_rows_static(h, 127.0 / static_scales[1])
        rs2 = s2
    out = jax.lax.dot_general(
        h8, w2_8, (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32) * rs2
    return (xv + out + b2.astype(jnp.float32)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Calibration helpers (tools/calibrate_int8.py): dynamic-int8 XLA sublayers
# that also report the activation amax at each static-quant site.
# ---------------------------------------------------------------------------


def _prep_attn_int8(qkv_kernel, qkv_bias, proj_kernel, *, num_heads: int):
    """Trace-time int8 weight prep shared by the fused wrapper and the
    calibration path: quantize qkv/proj, fold the softmax scale into the q
    column scales (and the q bias)."""
    d = qkv_kernel.shape[0]
    scale = float(d // num_heads) ** -0.5
    col_extra = jnp.concatenate(
        [jnp.full((1, d), scale, jnp.float32),
         jnp.ones((1, 2 * d), jnp.float32)], axis=1
    )
    wqkv8, sqkv = quantize_weight_int8(qkv_kernel, extra_col_scale=col_extra)
    wp8, sp = quantize_weight_int8(proj_kernel)
    bqkv = None
    if qkv_bias is not None:
        bqkv = jnp.concatenate(
            [qkv_bias[:d] * scale, qkv_bias[d:]]
        ).astype(jnp.float32).reshape(1, 3 * d)
    return wqkv8, sqkv, bqkv, wp8, sp


def attn_sublayer_int8_xla(
    x, ln_scale, ln_bias, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
    *, num_heads: int, eps: float = 1e-5,
):
    """Dynamic-int8 attention sublayer via the XLA reference math (no
    Pallas) — the calibration forward; numerics match the kernel."""
    d = x.shape[-1]
    wqkv8, sqkv, bqkv, wp8, sp = _prep_attn_int8(
        qkv_kernel, qkv_bias, proj_kernel, num_heads=num_heads
    )
    return _attn_sublayer_int8_reference(
        x, ln_scale, ln_bias, wqkv8, sqkv,
        bqkv.reshape(1, 1, 3 * d) if bqkv is not None else None,
        wp8, sp, proj_bias, num_heads=num_heads, eps=eps,
    )


def mlp_sublayer_int8_calib(
    x, ln_scale, ln_bias, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias,
    *, eps: float = 1e-5, gelu_approx: bool = False, with_rows: bool = False,
):
    """Dynamic-int8 MLP sublayer (XLA reference math) that also returns the
    activation amax at the two static-quant sites: (out, xn_amax, h_amax).
    xn is the post-LN input, h the post-GELU hidden — exactly what
    ``fused_mlp_sublayer_int8(static_scales=(xn_amax, h_amax))`` consumes.

    ``with_rows=True`` appends the per-ROW (per-token) amaxes at both sites
    — ``(xn_rows (B, L), h_rows (B, L))`` — the statistic the percentile /
    clip-search calibration modes need: the dynamic path quantizes per row,
    so a static scale's quality damage is governed by the distribution of
    row amaxes it replaces (outlier rows above the clip saturate; the rest
    lose resolution proportional to scale/row_amax).
    """
    hidden = fc1_kernel.shape[1]
    d = x.shape[-1]
    w1_8, s1 = quantize_weight_int8(fc1_kernel)
    w2_8, s2 = quantize_weight_int8(fc2_kernel)
    xv = x.astype(jnp.float32)
    _, _, xn = _ln_fwd(xv, ln_scale.astype(jnp.float32),
                       ln_bias.astype(jnp.float32), eps)
    x8, rs = _quant_rows(xn)
    h = jax.lax.dot_general(
        x8, w1_8, (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32) * (rs * s1)
    h = _gelu_f32(
        h + fc1_bias.astype(jnp.float32).reshape(1, 1, hidden), gelu_approx
    )
    h8, hrs = _quant_rows(h)
    out = jax.lax.dot_general(
        h8, w2_8, (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32) * (hrs * s2)
    out = (
        xv + out + fc2_bias.astype(jnp.float32).reshape(1, 1, d)
    ).astype(x.dtype)
    if with_rows:
        # rs/hrs are the per-row amaxes already divided by 127 (dequant
        # scales); undo the factor so callers see raw activation amaxes
        return (out, jnp.max(jnp.abs(xn)), jnp.max(jnp.abs(h)),
                (rs[..., 0] * 127.0, hrs[..., 0] * 127.0))
    return out, jnp.max(jnp.abs(xn)), jnp.max(jnp.abs(h))


# ---------------------------------------------------------------------------
# Wrappers: quantize the fp32 params at trace time (hoisted out of sampling
# scans) and launch the kernels. Signatures mirror the bf16 fused wrappers.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("num_heads", "eps", "interpret")
)
def fused_attn_sublayer_int8(
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
) -> jax.Array:
    """``x + proj(attention(qkv(layernorm(x))))`` with int8 weight matmuls.

    Takes the same fp32 params as pallas_block.fused_attn_sublayer
    (qkv_kernel (D, 3D) packed "(K H Dh)", reference models/uvit.py:150,159)
    and quantizes them in-trace; the softmax scale is folded into the q
    column SCALES (f32), leaving the int8 values untouched.
    """
    b, l, d = x.shape
    h = num_heads
    dh = d // h
    assert h * dh == d, (d, h)
    dtype = x.dtype
    itemsize = jnp.dtype(dtype).itemsize

    wqkv8, sqkv, bqkv, wp8, sp = _prep_attn_int8(
        qkv_kernel, qkv_bias, proj_kernel, num_heads=h
    )

    if not interpret and not attn_fwd_fits(l, d, itemsize):
        return _attn_sublayer_int8_reference(
            x, ln_scale, ln_bias, wqkv8, sqkv,
            bqkv.reshape(1, 1, 3 * d) if bqkv is not None else None,
            wp8, sp, proj_bias, num_heads=num_heads, eps=eps,
        )

    grp = _group_size_v2(b, l, d, itemsize)
    row = pl.BlockSpec((grp, l, d), lambda i: (i, 0, 0))
    vec = pl.BlockSpec((1, d), lambda i: (0, 0))
    in_specs = [
        row, vec, vec,
        pl.BlockSpec((d, 3 * d), lambda i: (0, 0)),  # wqkv8
        pl.BlockSpec((1, 3 * d), lambda i: (0, 0)),  # sqkv
    ]
    args = [x, ln_scale.reshape(1, d), ln_bias.reshape(1, d), wqkv8, sqkv]
    if bqkv is not None:
        in_specs.append(pl.BlockSpec((1, 3 * d), lambda i: (0, 0)))
        args.append(bqkv)
    in_specs += [
        pl.BlockSpec((d, d), lambda i: (0, 0)),  # wp8
        vec,                                     # sp
        vec,                                     # proj bias
    ]
    args += [wp8, sp, proj_bias.astype(jnp.float32).reshape(1, d)]
    return pl.pallas_call(
        functools.partial(
            _kernel_v2_int8,
            num_heads=h,
            eps=eps,
            has_qkv_bias=qkv_bias is not None,
        ),
        out_shape=jax.ShapeDtypeStruct((b, l, d), dtype),
        grid=(b // grp,),
        in_specs=in_specs,
        out_specs=row,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * l * d * (4 * d + 2 * l),
            bytes_accessed=2 * b * l * d * itemsize,
            transcendentals=b * h * l * l,
        ),
        interpret=interpret,
    )(*args)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "gelu_approx", "interpret"),
)
def fused_mlp_sublayer_int8(
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
    static_scales: "tuple[float, float] | None" = None,
) -> jax.Array:
    """``x + fc2(gelu(fc1(layernorm(x))))`` with int8 weight matmuls.

    ``static_scales=(sx, sh)``: calibrated activation amax for the post-LN
    and post-GELU quant sites (tools/calibrate_int8.py) — skips the dynamic
    per-row quantization (11% faster per call, tools/probe_int8_static.py);
    out-of-range activations saturate at the calibrated amax. The pair is
    TRACED (a pytree argument, not a static one): all depth blocks of a
    model share one jit entry and one Mosaic kernel, with the scales
    delivered as a (1, 2) operand instead of baked literals.
    """
    b, l, d = x.shape
    hidden = fc1_kernel.shape[1]
    dtype = x.dtype
    itemsize = jnp.dtype(dtype).itemsize

    w1_8, s1 = quantize_weight_int8(fc1_kernel)
    w2_8, s2 = quantize_weight_int8(fc2_kernel)
    if static_scales is not None:
        sx_raw, sh_raw = static_scales
        for v in (sx_raw, sh_raw):  # concrete values are checkable here
            assert not isinstance(v, (int, float)) or v > 0, static_scales
        sx = jnp.asarray(sx_raw, jnp.float32)
        sh = jnp.asarray(sh_raw, jnp.float32)
        # fold the static row factors into the weight column scales
        s1 = s1 * (sx / 127.0)
        s2 = s2 * (sh / 127.0)
        static_scales = (sx, sh)
        inv = jnp.stack([127.0 / sx, 127.0 / sh]).reshape(1, 2)
    b1 = fc1_bias.astype(jnp.float32).reshape(1, hidden)
    b2 = fc2_bias.astype(jnp.float32).reshape(1, d)

    if not interpret and not mlp_fwd_fits(l, d, hidden, itemsize):
        return _mlp_int8_reference(
            x, ln_scale, ln_bias, w1_8, s1, b1.reshape(1, 1, hidden),
            w2_8, s2, b2.reshape(1, 1, d), eps=eps, gelu_approx=gelu_approx,
            static_scales=static_scales,
        )

    grp = _group_size_mlp(b, l, d, hidden, itemsize)
    row = pl.BlockSpec((grp, l, d), lambda i: (i, 0, 0))
    vec_d = pl.BlockSpec((1, d), lambda i: (0, 0))
    vec_h = pl.BlockSpec((1, hidden), lambda i: (0, 0))
    in_specs = [
        row, vec_d, vec_d,
        pl.BlockSpec((d, hidden), lambda i: (0, 0)),  # w1_8
        vec_h,                                        # s1
        vec_h,                                        # b1
        pl.BlockSpec((hidden, d), lambda i: (0, 0)),  # w2_8
        vec_d,                                        # s2
        vec_d,                                        # b2
    ]
    args = [x, ln_scale.reshape(1, d), ln_bias.reshape(1, d),
            w1_8, s1, b1, w2_8, s2, b2]
    if static_scales is not None:
        in_specs.append(pl.BlockSpec((1, 2), lambda i: (0, 0)))  # inv
        args.append(inv)
    return pl.pallas_call(
        functools.partial(
            _mlp_kernel_int8, eps=eps, gelu_approx=gelu_approx,
            use_static_scales=static_scales is not None,
        ),
        out_shape=jax.ShapeDtypeStruct((b, l, d), dtype),
        grid=(b // grp,),
        in_specs=in_specs,
        out_specs=row,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * l * d * hidden,
            bytes_accessed=2 * b * l * d * itemsize,
            transcendentals=b * l * hidden,
        ),
        interpret=interpret,
    )(*args)

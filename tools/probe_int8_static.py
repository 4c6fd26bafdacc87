"""Probe: do STATIC (calibrated) activation scales beat the dynamic
per-row quantization inside the int8 sampling kernels?

The W8A8 kernels (ops/pallas_block_int8.py) spend VPU time on per-row
activation quantization: an (L, D) abs + row-max reduce, a per-row
reciprocal, and a rank-1 (row_scale x col_scale) dequant epilogue — four
times per block (post-LN x2, merged-heads, post-GELU). With a static
per-site scale all of that collapses to one fused multiply-round-clip and
a (1, N) column-scale epilogue (the row factor folds into the weight
scales at trace time).

This probe times dynamic-vs-static twins of both fused sublayers at the
flagship sampling geometry (chained fori_loop, delta-of-trip-counts — see
tools/probe_int8.py for why independent-dispatch timing can't be trusted
on axon). It answers "how much step time would calibration buy?" BEFORE
building the calibration machinery.

Run on the real chip:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_int8_static.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duodiff_tpu.ops.pallas_block import _group_size_mlp, _group_size_v2, _ln_fwd  # noqa: E402
from duodiff_tpu.ops.pallas_block_int8 import (  # noqa: E402
    _dot_int8,
    _gelu_f32,
    _quant_rows,
    quantize_weight_int8,
)

B, L, D, HID, H = 128, 257, 512, 2048, 8
EPS = 1e-5


# ---------------------------------------------------------------- MLP twins


def _mlp_kernel_dyn(x_ref, g_ref, b_ref, w1_ref, s1_ref, b1_ref,
                    w2_ref, s2_ref, b2_ref, o_ref):
    g, l, d = x_ref.shape
    for i in range(g):
        xv = x_ref[i].astype(jnp.float32)
        _, _, xn = _ln_fwd(xv, g_ref[0].astype(jnp.float32),
                           b_ref[0].astype(jnp.float32), EPS)
        x8, rs = _quant_rows(xn)
        h = _dot_int8(x8, w1_ref[:]).astype(jnp.float32) * (rs * s1_ref[0])
        h = _gelu_f32(h + b1_ref[0].astype(jnp.float32), True)
        h8, hrs = _quant_rows(h)
        out = _dot_int8(h8, w2_ref[:]).astype(jnp.float32) * (hrs * s2_ref[0])
        o_ref[i] = (xv + out + b2_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _mlp_kernel_static(x_ref, g_ref, b_ref, w1_ref, s1_ref, b1_ref,
                       w2_ref, s2_ref, b2_ref, o_ref,
                       *, inv_x: float, inv_h: float):
    # s1_ref/s2_ref already carry the (scale_x/127) / (scale_h/127) factors
    g, l, d = x_ref.shape
    for i in range(g):
        xv = x_ref[i].astype(jnp.float32)
        _, _, xn = _ln_fwd(xv, g_ref[0].astype(jnp.float32),
                           b_ref[0].astype(jnp.float32), EPS)
        x8 = jnp.clip(jnp.round(xn * inv_x), -127, 127).astype(jnp.int8)
        h = _dot_int8(x8, w1_ref[:]).astype(jnp.float32) * s1_ref[0]
        h = _gelu_f32(h + b1_ref[0].astype(jnp.float32), True)
        h8 = jnp.clip(jnp.round(h * inv_h), -127, 127).astype(jnp.int8)
        out = _dot_int8(h8, w2_ref[:]).astype(jnp.float32) * s2_ref[0]
        o_ref[i] = (xv + out + b2_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def make_mlp(kernel_fn, static: bool):
    grp = _group_size_mlp(B, L, D, HID, 2)
    row = pl.BlockSpec((grp, L, D), lambda i: (i, 0, 0))
    vec_d = pl.BlockSpec((1, D), lambda i: (0, 0))
    vec_h = pl.BlockSpec((1, HID), lambda i: (0, 0))

    def call(x, args):
        return pl.pallas_call(
            kernel_fn,
            out_shape=jax.ShapeDtypeStruct((B, L, D), x.dtype),
            grid=(B // grp,),
            in_specs=[row, vec_d, vec_d,
                      pl.BlockSpec((D, HID), lambda i: (0, 0)), vec_h, vec_h,
                      pl.BlockSpec((HID, D), lambda i: (0, 0)), vec_d, vec_d],
            out_specs=row,
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * B * L * D * HID,
                bytes_accessed=2 * B * L * D * 2,
                transcendentals=B * L * HID,
            ),
        )(x, *args)

    return call


# ---------------------------------------------------------- attention twins


def _attn_kernel_dyn(x_ref, g_ref, b_ref, wqkv_ref, sqkv_ref,
                     wp_ref, sp_ref, bp_ref, o_ref):
    g, l, d = x_ref.shape
    dh = d // H
    bdt = x_ref.dtype
    for i in range(g):
        xv = x_ref[i].astype(jnp.float32)
        _, _, xn = _ln_fwd(xv, g_ref[0].astype(jnp.float32),
                           b_ref[0].astype(jnp.float32), EPS)
        x8, rs = _quant_rows(xn)
        acc = _dot_int8(x8, wqkv_ref[:])
        qkv = (acc.astype(jnp.float32) * (rs * sqkv_ref[0])).astype(bdt)
        heads = []
        for h in range(H):
            q = jax.lax.slice(qkv, (0, h * dh), (l, (h + 1) * dh))
            k = jax.lax.slice(qkv, (0, d + h * dh), (l, d + (h + 1) * dh))
            v = jax.lax.slice(qkv, (0, 2 * d + h * dh), (l, 2 * d + (h + 1) * dh))
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.dot(e.astype(bdt), v, preferred_element_type=jnp.float32)
            heads.append((o / denom).astype(bdt))
        merged = jnp.concatenate(heads, axis=1).astype(jnp.float32)
        m8, mrs = _quant_rows(merged)
        pacc = _dot_int8(m8, wp_ref[:])
        proj = pacc.astype(jnp.float32) * (mrs * sp_ref[0])
        o_ref[i] = (xv + proj + bp_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _attn_kernel_static(x_ref, g_ref, b_ref, wqkv_ref, sqkv_ref,
                        wp_ref, sp_ref, bp_ref, o_ref,
                        *, inv_x: float, inv_m: float):
    g, l, d = x_ref.shape
    dh = d // H
    bdt = x_ref.dtype
    for i in range(g):
        xv = x_ref[i].astype(jnp.float32)
        _, _, xn = _ln_fwd(xv, g_ref[0].astype(jnp.float32),
                           b_ref[0].astype(jnp.float32), EPS)
        x8 = jnp.clip(jnp.round(xn * inv_x), -127, 127).astype(jnp.int8)
        acc = _dot_int8(x8, wqkv_ref[:])
        qkv = (acc.astype(jnp.float32) * sqkv_ref[0]).astype(bdt)
        heads = []
        for h in range(H):
            q = jax.lax.slice(qkv, (0, h * dh), (l, (h + 1) * dh))
            k = jax.lax.slice(qkv, (0, d + h * dh), (l, d + (h + 1) * dh))
            v = jax.lax.slice(qkv, (0, 2 * d + h * dh), (l, 2 * d + (h + 1) * dh))
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.dot(e.astype(bdt), v, preferred_element_type=jnp.float32)
            heads.append((o / denom).astype(bdt))
        merged = jnp.concatenate(heads, axis=1).astype(jnp.float32)
        m8 = jnp.clip(jnp.round(merged * inv_m), -127, 127).astype(jnp.int8)
        pacc = _dot_int8(m8, wp_ref[:])
        proj = pacc.astype(jnp.float32) * sp_ref[0]
        o_ref[i] = (xv + proj + bp_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def make_attn(kernel_fn):
    grp = _group_size_v2(B, L, D, 2)
    row = pl.BlockSpec((grp, L, D), lambda i: (i, 0, 0))
    vec = pl.BlockSpec((1, D), lambda i: (0, 0))

    def call(x, args):
        return pl.pallas_call(
            kernel_fn,
            out_shape=jax.ShapeDtypeStruct((B, L, D), x.dtype),
            grid=(B // grp,),
            in_specs=[row, vec, vec,
                      pl.BlockSpec((D, 3 * D), lambda i: (0, 0)),
                      pl.BlockSpec((1, 3 * D), lambda i: (0, 0)),
                      pl.BlockSpec((D, D), lambda i: (0, 0)), vec, vec],
            out_specs=row,
            cost_estimate=pl.CostEstimate(
                flops=2 * B * L * D * (4 * D + 2 * L),
                bytes_accessed=2 * B * L * D * 2,
                transcendentals=B * H * L * L,
            ),
        )(x, *args)

    return call


# ------------------------------------------------------------------ timing


def chain_time(call, x, args, iters=50):
    @jax.jit
    def run(x):
        def body(_, acc):
            y = call(acc, args)
            return (y * 0.999).astype(x.dtype)
        return lax.fori_loop(0, iters, body, x)

    out = run(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, L, D), jnp.bfloat16)
    gamma = jnp.asarray(rng.randn(1, D).astype(np.float32) * 0.1 + 1.0)
    beta = jnp.asarray(rng.randn(1, D).astype(np.float32) * 0.1)

    # ---- MLP ----
    w1 = rng.randn(D, HID).astype(np.float32) * 0.02
    w2 = rng.randn(HID, D).astype(np.float32) * 0.02
    w1_8, s1 = quantize_weight_int8(jnp.asarray(w1))
    w2_8, s2 = quantize_weight_int8(jnp.asarray(w2))
    b1 = jnp.zeros((1, HID), jnp.float32)
    b2 = jnp.zeros((1, D), jnp.float32)

    scale_x, scale_h = 8.0, 6.0  # representative calibrated amax values
    dyn = make_mlp(_mlp_kernel_dyn, static=False)
    sta = make_mlp(
        functools.partial(_mlp_kernel_static,
                          inv_x=127.0 / scale_x, inv_h=127.0 / scale_h),
        static=True,
    )
    args_dyn = (gamma, beta, w1_8, s1, b1, w2_8, s2, b2)
    args_sta = (gamma, beta, w1_8, s1 * (scale_x / 127.0), b1,
                w2_8, s2 * (scale_h / 127.0), b2)
    t_dyn = chain_time(dyn, x, args_dyn)
    t_sta = chain_time(sta, x, args_sta)
    print(f"MLP  int8 dynamic {t_dyn*1e3:.3f} ms/call   "
          f"static {t_sta*1e3:.3f} ms/call   "
          f"saving {(t_dyn-t_sta)*1e3:.3f} ms ({(1-t_sta/t_dyn)*100:.1f}%)")

    # ---- attention ----
    wqkv = rng.randn(D, 3 * D).astype(np.float32) * 0.02
    wp = rng.randn(D, D).astype(np.float32) * 0.02
    scale = (D // H) ** -0.5
    col_extra = jnp.concatenate(
        [jnp.full((1, D), scale, jnp.float32), jnp.ones((1, 2 * D), jnp.float32)],
        axis=1)
    wqkv8, sqkv = quantize_weight_int8(jnp.asarray(wqkv), extra_col_scale=col_extra)
    wp8, sp = quantize_weight_int8(jnp.asarray(wp))
    bp = jnp.zeros((1, D), jnp.float32)

    scale_xa, scale_m = 8.0, 4.0
    dyn_a = make_attn(_attn_kernel_dyn)
    sta_a = make_attn(functools.partial(
        _attn_kernel_static, inv_x=127.0 / scale_xa, inv_m=127.0 / scale_m))
    args_dyn_a = (gamma, beta, wqkv8, sqkv, wp8, sp, bp)
    args_sta_a = (gamma, beta, wqkv8, sqkv * (scale_xa / 127.0),
                  wp8, sp * (scale_m / 127.0), bp)
    t_dyn_a = chain_time(dyn_a, x, args_dyn_a)
    t_sta_a = chain_time(sta_a, x, args_sta_a)
    print(f"ATTN int8 dynamic {t_dyn_a*1e3:.3f} ms/call   "
          f"static {t_sta_a*1e3:.3f} ms/call   "
          f"saving {(t_dyn_a-t_sta_a)*1e3:.3f} ms ({(1-t_sta_a/t_dyn_a)*100:.1f}%)")

    per_block = (t_dyn - t_sta) + (t_dyn_a - t_sta_a)
    print(f"projected step saving at depth 13: {per_block*13*1e3:.2f} ms "
          f"(int8 step is ~18.4 ms)")


if __name__ == "__main__":
    main()

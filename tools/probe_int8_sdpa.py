"""Probe: is an int8 SDPA core worth adding to the int8 sublayer kernel?

The W8A8 path (ops/pallas_block_int8.py) leaves the SDPA core in bf16:
scores = q k^T (K = Dh = 64, runs the MXU at half rate already) and the
probability-value product e v (K = L = 257). This probe times pallas
kernels of JUST the per-sample sdpa chain at flagship geometry:

  bf16:  s = q k^T; e = exp(s - max); o = (e v) / denom
  int8:  q, k quantized per-row (rank-1 dequant of s), e quantized with the
         exact scale 1/127 (max(e) == 1 by construction), v per-column;
         softmax stays fp32

Quantization of the two contractions is algebraically rank-1-factorable
(see comments), so the int8 variant is semantically a drop-in — the
question is purely whether the MXU int8 rate shows up at these shapes
(K=64 contractions and lane-padded L=257 operands may not benefit).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_int8_sdpa.py

RESULT (2026-08-18, real v5e chip): NEGATIVE — int8 sdpa is 0.66x the bf16
chain (0.818 vs 0.544 ms/call at G=2), with 2.6e-2 rel L2 error (vs ~4e-3
for the weight-only W8A8 path). The per-row quantization of q/k/e/v is all
VPU work on (L, 384-padded-lane) tensors and exceeds what the int8 MXU rate
recovers at these K=64 / K=257 contraction shapes. The W8A8 kernels
therefore keep their SDPA core in bf16 — do not retry without removing the
in-loop quantization cost (e.g. quantizing k/v once per kernel invocation
outside the head loop buys little: q and e must still be quantized per
head).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl


L, DH, H = 257, 64, 8
G = 2          # samples per grid step (G=4 OOMs scoped VMEM with standalone q,k,v,o io blocks; in the fused kernel qkv is a transient)
B = 128


def _sdpa_bf16_kernel(q_ref, k_ref, v_ref, o_ref):
    for i in range(G):
        for h in range(H):
            q = q_ref[i, h]
            k = k_ref[i, h]
            v = v_ref[i, h]
            s = lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.dot(e.astype(jnp.bfloat16), v,
                        preferred_element_type=jnp.float32)
            o_ref[i, h] = (o / denom).astype(jnp.bfloat16)


def _quant_rows(x):
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    inv = jnp.where(amax > 0, 127.0 / amax, 1.0)
    return jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8), amax / 127.0


def _sdpa_int8_kernel(q_ref, k_ref, v_ref, o_ref):
    for i in range(G):
        for h in range(H):
            q = q_ref[i, h].astype(jnp.float32)
            k = k_ref[i, h].astype(jnp.float32)
            v = v_ref[i, h].astype(jnp.float32)
            q8, sq = _quant_rows(q)          # (L, Dh), (L, 1)
            k8, sk = _quant_rows(k)          # per-row of k = per score col
            s32 = lax.dot_general(q8, k8, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
            s = s32.astype(jnp.float32) * (sq * sk[:, 0][None, :])
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)               # max == 1 -> scale exactly 1/127
            denom = jnp.sum(e, axis=-1, keepdims=True)
            e8 = jnp.round(e * 127.0).astype(jnp.int8)
            # v per-column: amax over tokens per feature channel
            vmax = jnp.max(jnp.abs(v), axis=0, keepdims=True)
            vinv = jnp.where(vmax > 0, 127.0 / vmax, 1.0)
            v8 = jnp.clip(jnp.round(v * vinv), -127, 127).astype(jnp.int8)
            o32 = lax.dot_general(e8, v8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
            o = o32.astype(jnp.float32) * ((vmax / 127.0) / 127.0)
            o_ref[i, h] = (o / denom).astype(jnp.bfloat16)


def build(kernel, in_dtype):
    def run(q, k, v):
        spec = pl.BlockSpec((G, H, L, DH), lambda i: (i, 0, 0, 0))
        return pl.pallas_call(
            kernel,
            grid=(B // G,),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, H, L, DH), jnp.bfloat16),
        )(q, k, v)

    @functools.partial(jax.jit, static_argnums=(3,))
    def chain(q, k, v, iters):
        def body(_, qq):
            o = run(qq, k, v)
            return (o * 1.01).astype(jnp.bfloat16)

        return jnp.sum(lax.fori_loop(0, iters, body, q).astype(jnp.float32))

    return chain


def measure(chain, q, k, v, lo=5, hi=45):
    for it in (lo, hi):
        float(chain(q, k, v, it))
    ts = {}
    for it in (lo, hi, lo, hi):
        t0 = time.perf_counter()
        float(chain(q, k, v, it))
        ts.setdefault(it, []).append(time.perf_counter() - t0)
    return (min(ts[hi]) - min(ts[lo])) / (hi - lo)


def main():
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.RandomState(0)
    shp = (B, H, L, DH)
    q = jnp.asarray(rng.randn(*shp), jnp.bfloat16)
    k = jnp.asarray(rng.randn(*shp), jnp.bfloat16)
    v = jnp.asarray(rng.randn(*shp), jnp.bfloat16)

    t_bf = measure(build(_sdpa_bf16_kernel, jnp.bfloat16), q, k, v)
    t_i8 = measure(build(_sdpa_int8_kernel, jnp.int8), q, k, v)
    # per-step sdpa cost across the 13 blocks of the flagship
    print(f"sdpa bf16: {t_bf*1e3:.3f} ms/call ({t_bf*13*1e3:.2f} ms/13-block step)")
    print(f"sdpa int8: {t_i8*1e3:.3f} ms/call ({t_i8*13*1e3:.2f} ms/13-block step)")
    print(f"speedup: {t_bf/t_i8:.2f}x")

    # numerics: int8 vs bf16 sdpa relative error
    out_bf = build(_sdpa_bf16_kernel, jnp.bfloat16)
    # direct single-run comparison via pallas_call (reuse build's run path)
    def single(kernel):
        spec = pl.BlockSpec((G, H, L, DH), lambda i: (i, 0, 0, 0))
        return pl.pallas_call(
            kernel, grid=(B // G,), in_specs=[spec, spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, H, L, DH), jnp.bfloat16),
        )(q, k, v)

    a = np.asarray(single(_sdpa_int8_kernel), np.float32)
    b = np.asarray(single(_sdpa_bf16_kernel), np.float32)
    print("rel l2 err int8 vs bf16:",
          float(np.linalg.norm(a - b) / np.linalg.norm(b)))


if __name__ == "__main__":
    main()

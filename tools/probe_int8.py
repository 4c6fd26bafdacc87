"""Probe: does int8 matmul actually run faster than bf16 on this chip?

Chained-dependency timing (each matmul consumes the previous result via a
lax.fori_loop carry) — independent enqueued dots on the axon remote backend
report unphysical throughput (>17 PF/s), so wall-clock over independent
calls cannot be trusted here.

Measures MXU throughput for bf16 x bf16 -> f32 vs int8 x int8 -> int32 at
square aligned shapes, plus the repo's real sampling shapes. Decides whether
an int8 weight-quantization path for the sampling kernels is worth building.

Run on the real chip:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_int8.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


ITERS = 100


@functools.partial(jax.jit, static_argnums=(2,))
def chain_bf16(a, b, iters):
    # a: (M, K) bf16, b: (K, K) bf16; each dot depends on the previous
    def body(_, x):
        y = jnp.dot(x, b, preferred_element_type=jnp.float32)
        return (y * 1e-3).astype(jnp.bfloat16)

    return lax.fori_loop(0, iters, body, a)


@functools.partial(jax.jit, static_argnums=(2,))
def chain_int8(a, b, iters):
    # a: (M, K) int8, b: (K, K) int8 -> int32 accum, requantize to int8
    def body(_, x):
        y = jnp.dot(x, b, preferred_element_type=jnp.int32)
        return (y >> 12).astype(jnp.int8)

    return lax.fori_loop(0, iters, body, a)


def timeit(f, *args):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS


def main():
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.RandomState(0)

    cases = [
        (4096, 4096),      # square aligned, MXU peak probe
        (32896, 512),      # flagship batch*L x D
        (32896, 1024),     # imagenet256 D
        (2048, 512),       # per-group (G*L rows) flagship
    ]
    for M, K in cases:
        a16 = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
        b16 = jnp.asarray(rng.randn(K, K), jnp.bfloat16)
        a8 = jnp.asarray(rng.randint(-127, 127, (M, K)), jnp.int8)
        b8 = jnp.asarray(rng.randint(-127, 127, (K, K)), jnp.int8)

        t16 = timeit(chain_bf16, a16, b16, ITERS)
        t8 = timeit(chain_int8, a8, b8, ITERS)
        fl = 2 * M * K * K
        print(
            f"M={M} K=N={K}: bf16 {t16*1e3:.3f}ms ({fl/t16/1e12:.1f}TF/s)"
            f"  int8 {t8*1e3:.3f}ms ({fl/t8/1e12:.1f}TOP/s)"
            f"  speedup int8/bf16 = {t16/t8:.2f}x"
        )


if __name__ == "__main__":
    main()

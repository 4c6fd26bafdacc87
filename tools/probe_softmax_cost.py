"""Ablate the softmax inside the fused attention-sublayer kernel to bound
its share of the 0.99ms/block cost (matmul-only floor is ~0.53ms at
CelebA-64 batch 128 — NOTES.md).

Monkeypatches jax.nn.softmax before tracing (numerics become garbage; only
timing matters), so each variant runs in its own interpretation of the same
kernel code. Run on the chip:

    python tools/probe_softmax_cost.py [identity|exp|full]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    from duodiff_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    import jax
    import jax.numpy as jnp

    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    if variant == "identity":
        jax.nn.softmax = lambda x, axis=-1: x
    elif variant == "exp":
        jax.nn.softmax = lambda x, axis=-1: jnp.exp(x)

    from duodiff_tpu.ops.pallas_block import fused_attn_sublayer

    b, h, l, d = 128, 8, 257, 512
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, l, d), jnp.bfloat16)
    ln_s = jnp.ones((d,), jnp.float32)
    ln_b = jnp.zeros((d,), jnp.float32)
    wqkv = 0.02 * jax.random.normal(key, (d, 3 * d), jnp.float32)
    wp = 0.02 * jax.random.normal(key, (d, d), jnp.float32)
    bp = jnp.zeros((d,), jnp.float32)

    fn = jax.jit(lambda x: fused_attn_sublayer(
        x, ln_s, ln_b, wqkv, None, wp, bp, num_heads=h))
    jax.block_until_ready(fn(x))
    t0 = time.perf_counter()
    reps = 50
    for _ in range(reps):
        out = fn(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"fused_attn_sublayer[softmax={variant}]: {dt*1e3:7.3f} ms")


if __name__ == "__main__":
    main()

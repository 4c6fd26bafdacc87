"""Compile/timing probe for the Pallas attention-sublayer backward at
large embed dims.

The backward keeps fp32 dWqkv (D, 3D) + dWp (D, D) accumulators plus bf16
weight copies VMEM-resident for the whole grid: 6.3MB at the flagship D=512,
14.2MB at D=768 (imagenet64), 25.2MB at D=1024 (imagenet256). This probe
answers, on the real chip, whether Mosaic compiles those residents at all
and what the step time is vs the XLA recompute backward — the data behind
attn_bwd_fits. Run on TPU:

    python tools/probe_attn_bwd.py [flagship|imagenet64|imagenet256]
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

    from duodiff_tpu.ops.pallas_block import (
        _attn_sublayer_bwd_impl,
        _attn_sublayer_reference,
    )

    shape = sys.argv[1] if len(sys.argv) > 1 else "imagenet64"
    b, l, d, heads = {
        "flagship": (128, 257, 512, 8),
        "imagenet64": (128, 258, 768, 12),
        "imagenet256": (128, 258, 1024, 16),
    }[shape]
    print(f"shape={shape}: B={b} L={l} D={d} H={heads}")

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (b, l, d), dt)
    dy = jax.random.normal(ks[1], (b, l, d), dt)
    g = jnp.ones((d,), jnp.float32)
    bb = jnp.zeros((d,), jnp.float32)
    wqkv = jax.random.normal(ks[2], (d, 3 * d), jnp.float32) * 0.02
    bqkv = jnp.zeros((3 * d,), jnp.float32)
    wp = jax.random.normal(ks[3], (d, d), jnp.float32) * 0.02
    bp = jnp.zeros((d,), jnp.float32)

    def run(name, fn):
        try:
            t0 = time.time()
            out = fn()
            jax.block_until_ready(out)
            compile_s = time.time() - t0
            t0 = time.time()
            n = 10
            for _ in range(n):
                out = fn()
            jax.block_until_ready(out)
            dt_ms = (time.time() - t0) / n * 1e3
            print(f"{name}: compile {compile_s:.1f}s, {dt_ms:.2f} ms/call")
            return out
        except Exception as e:  # noqa: BLE001 - probing compile failures
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
            return None

    pallas = run(
        "pallas attn bwd",
        jax.jit(lambda: _attn_sublayer_bwd_impl(
            x, dy, g, bb, wqkv, bqkv, wp, num_heads=heads, eps=1e-5,
            interpret=False,
        )),
    )

    import functools

    def xla_bwd():
        _, vjp = jax.vjp(
            functools.partial(
                _attn_sublayer_reference, num_heads=heads, eps=1e-5
            ),
            x, g, bb, wqkv, bqkv, wp, bp,
        )
        return vjp(dy)

    xla = run("xla recompute bwd", jax.jit(xla_bwd))

    def flash_bwd():
        _, vjp = jax.vjp(
            functools.partial(
                _attn_sublayer_reference, num_heads=heads, eps=1e-5,
                sdpa="flash",
            ),
            x, g, bb, wqkv, bqkv, wp, bp,
        )
        return vjp(dy)

    flash = run("flash-core recompute bwd", jax.jit(flash_bwd))
    if flash is not None and xla is not None:
        for name, a, bseq in (("dx", flash[0], xla[0]),
                              ("dwqkv", flash[3], xla[3]),
                              ("dwp", flash[5], xla[5])):
            err = float(jnp.max(jnp.abs(
                a.astype(jnp.float32) - bseq.astype(jnp.float32))))
            print(f"  flash-vs-xla {name}: max abs err {err:.3e}")

    if pallas is not None and xla is not None:
        for name, a, bseq in (
            ("dx", pallas[0], xla[0]),
            ("dwqkv", pallas[3], xla[3]),
            ("dwp", pallas[5], xla[5]),
        ):
            err = float(jnp.max(jnp.abs(
                a.astype(jnp.float32) - bseq.astype(jnp.float32)
            )))
            ref = float(jnp.max(jnp.abs(bseq.astype(jnp.float32)))) or 1.0
            print(f"  {name}: max abs err {err:.3e} (rel {err / ref:.3e})")


if __name__ == "__main__":
    main()

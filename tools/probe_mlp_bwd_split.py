"""On-chip probe: hidden-split Pallas MLP backward vs the XLA recompute
backward at D>=768 shapes (the configs the monolithic kernel can't compile
for). Prints compile + per-call timings and max-abs-err agreement. Run:

    python tools/probe_mlp_bwd_split.py [imagenet64|imagenet256]
"""

import functools
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
        _mlp_bwd_split_config,
        _mlp_reference,
        _mlp_sublayer_bwd_split,
    )

    shape = sys.argv[1] if len(sys.argv) > 1 else "imagenet64"
    b, l, d, hidden = {
        "imagenet64": (128, 258, 768, 3072),
        "imagenet256": (128, 258, 1024, 4096),
    }[shape]
    cfgs = [None]
    if len(sys.argv) > 2:
        cfgs = [tuple(int(v) for v in a.split(",")) for a in sys.argv[2:]]
    print(f"shape={shape}: B={b} L={l} D={d} hidden={hidden} "
          f"auto-cfg={_mlp_bwd_split_config(b, l, d, hidden, 2)}")

    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (b, l, d), dt)
    dy = jax.random.normal(ks[1], (b, l, d), dt)
    g = jnp.ones((d,), jnp.float32)
    bb = jnp.zeros((d,), jnp.float32)
    w1 = jax.random.normal(ks[2], (d, hidden), jnp.float32) * 0.02
    b1 = jnp.zeros((hidden,), jnp.float32)
    w2 = jax.random.normal(ks[3], (hidden, d), jnp.float32) * 0.02
    b2 = jnp.zeros((d,), jnp.float32)

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
            ms = (time.time() - t0) / n * 1e3
            print(f"{name}: compile {compile_s:.1f}s, {ms:.2f} ms/call")
            return out
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
            return None

    def xla_bwd():
        _, vjp = jax.vjp(
            functools.partial(_mlp_reference, eps=1e-5, gelu_approx=False),
            x, g, bb, w1, b1, w2, b2,
        )
        return vjp(dy)

    xla = run("xla recompute bwd", jax.jit(xla_bwd))

    for cfg in cfgs:
        split = run(
            f"split pallas bwd cfg={cfg}",
            jax.jit(lambda cfg=cfg: _mlp_sublayer_bwd_split(
                x, dy, g, bb, w1, b1, w2,
                eps=1e-5, gelu_approx=False, interpret=False, config=cfg,
            )),
        )
        if split is not None and xla is not None:
            for name, a, r in (("dx", split[0], xla[0]),
                               ("dw1", split[3], xla[3]),
                               ("dw2", split[5], xla[5])):
                err = float(jnp.max(jnp.abs(
                    a.astype(jnp.float32) - r.astype(jnp.float32))))
                print(f"  {name}: max abs err vs xla {err:.3e}")


if __name__ == "__main__":
    main()

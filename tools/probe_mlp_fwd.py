"""Probe the fused MLP forward kernel's batch-group size on the chip.

The default _group_size_mlp budget (9MB) lands on grp=1 at flagship shapes
by a 0.06MB margin; the attention kernel measured grp=4 fastest, so this
probes whether a raised budget (grp 2/4) helps the MLP too. One process per
budget (the jit caches the first traced group size).

    python tools/probe_mlp_fwd.py [budget_mb]
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

    from duodiff_tpu.ops import pallas_block as pb

    budget_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 9.0
    orig = pb._group_size_mlp

    def patched(b, l, d, hidden, itemsize, budget_bytes=None):
        return orig(b, l, d, hidden, itemsize,
                    budget_bytes=int(budget_mb * 2**20))

    pb._group_size_mlp = patched

    b, l, d, hidden = 128, 257, 512, 2048
    grp = patched(b, l, d, hidden, 2)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, l, d), jnp.bfloat16)
    ln_s = jnp.ones((d,), jnp.float32)
    ln_b = jnp.zeros((d,), jnp.float32)
    w1 = 0.05 * jax.random.normal(key, (d, hidden), jnp.float32)
    b1 = jnp.zeros((hidden,), jnp.float32)
    w2 = 0.05 * jax.random.normal(key, (hidden, d), jnp.float32)
    b2 = jnp.zeros((d,), jnp.float32)

    fn = jax.jit(lambda x: pb.fused_mlp_sublayer(
        x, ln_s, ln_b, w1, b1, w2, b2, eps=1e-5, gelu_approx=True))
    jax.block_until_ready(fn(x))
    t0 = time.perf_counter()
    reps = 50
    for _ in range(reps):
        out = fn(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"fused_mlp_sublayer[budget={budget_mb}MB grp={grp}]: "
          f"{dt*1e3:7.3f} ms")


if __name__ == "__main__":
    main()

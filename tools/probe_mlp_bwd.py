"""Empirical VMEM/speed probe for the Pallas MLP-sublayer backward kernel.

The kernel keeps fp32 dW1/dW2 accumulators (8.4MB at flagship shapes) plus a
bf16 copy of W1/W2 (4.2MB) VMEM-resident across the whole batch grid, so the
row/hidden tile sizes decide whether the remaining ~3MB fits. The static
model in _mlp_bwd_config is a guess; this probe compiles and times candidate
(group, row_target, hidden_chunk) configs on the real chip at the flagship
shape (B=128, L=257, D=512, hidden=2048, bf16), against the XLA
recompute-backward baseline, and prints a table. Run on TPU:

    python tools/probe_mlp_bwd.py
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
        _mlp_reference,
        _mlp_sublayer_bwd_impl,
        fused_mlp_sublayer,
    )

    shape = sys.argv[1] if len(sys.argv) > 1 else "flagship"
    b, l, d, hidden = {
        "flagship": (128, 257, 512, 2048),      # CelebA/CIFAR configs
        "imagenet64": (128, 258, 768, 3072),    # depth 17, class-cond
        "imagenet256": (128, 258, 1024, 4096),  # depth 21, latent
    }[shape]
    configs = {
        "flagship": [
            (1, 128, 512), (1, 128, 1024), (1, 256, 256), (1, 128, 256),
        ],
        # fixed residents: 28.3MB (768) / 50.3MB (1024) fp32 dW + bf16 W —
        # probe whether the effective VMEM ceiling admits them at all
        "imagenet64": [(1, 128, 256), (1, 64, 128)],
        "imagenet256": [(1, 128, 256), (1, 64, 128)],
    }[shape]
    print(f"shape={shape}: B={b} L={l} D={d} hidden={hidden}")
    dtype = jnp.bfloat16
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(keys[0], (b, l, d), dtype)
    dy = jax.random.normal(keys[7], (b, l, d), dtype)
    ln_s = 1.0 + 0.1 * jax.random.normal(keys[1], (d,))
    ln_b = 0.1 * jax.random.normal(keys[2], (d,))
    w1 = 0.05 * jax.random.normal(keys[3], (d, hidden))
    b1 = 0.05 * jax.random.normal(keys[4], (hidden,))
    w2 = 0.05 * jax.random.normal(keys[5], (hidden, d))
    b2 = 0.05 * jax.random.normal(keys[6], (d,))

    def timeit(fn, reps=20):
        out = jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps, out

    # baseline 1: XLA end-to-end (differentiate the reference math directly,
    # saved activations — what attn_impl="pallas" training uses for the MLP)
    def xla_saved():
        def loss(x, ln_s, ln_b, w1, b1, w2, b2):
            return jnp.sum(
                _mlp_reference(
                    x, ln_s, ln_b, w1, b1, w2, b2,
                    eps=1e-5, gelu_approx=False,
                ).astype(jnp.float32) * dy.astype(jnp.float32)
            )
        return jax.grad(loss, argnums=tuple(range(7)))(
            x, ln_s, ln_b, w1, b1, w2, b2
        )

    # baseline 2: fused fwd kernel + XLA recompute backward (the old
    # attn_impl="fused" training path)
    def recompute_bwd():
        _, vjp = jax.vjp(
            lambda *a: _mlp_reference(*a, eps=1e-5, gelu_approx=False),
            x, ln_s, ln_b, w1, b1, w2, b2,
        )
        return vjp(dy)

    for name, fn in (("xla fwd+bwd (saved acts)", jax.jit(xla_saved)),
                     ("xla recompute bwd only", jax.jit(recompute_bwd))):
        try:
            dt, _ = timeit(fn)
            print(f"{name:34s}: {dt*1e3:7.3f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name:34s}: FAILED {type(e).__name__}: {str(e)[:120]}")

    dt, _ = timeit(lambda: fused_mlp_sublayer(
        x, ln_s, ln_b, w1, b1, w2, b2, eps=1e-5))
    print(f"{'fused fwd kernel':34s}: {dt*1e3:7.3f} ms")

    for cfg in configs:
        def run(cfg=cfg):
            return _mlp_sublayer_bwd_impl(
                x, dy, ln_s, ln_b, w1, b1, w2,
                eps=1e-5, gelu_approx=False, interpret=False, config=cfg,
            )
        label = f"pallas bwd g={cfg[0]} rt={cfg[1]} hc={cfg[2]}"
        try:
            dt, _ = timeit(run)
            print(f"{label:34s}: {dt*1e3:7.3f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{label:34s}: FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()

"""Headline benchmark: U-ViT CelebA-64, 1000-step DDPM sampling throughput.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec/chip", "vs_baseline": N}

Baseline: the reference repo publishes per-image generation times in
demos/scatter_plots.ipynb (BASELINE.md); the CelebA-64 dense-model operating
point is 1.92 s/image on an (unstated, assumed A100-class) GPU
=> 0.5208 samples/sec. vs_baseline is our samples/sec/chip divided by that.

The full 1000-step reverse process runs as one jitted on-device lax.scan
(bf16 U-ViT forward per step); we time the second (cache-warm) invocation.
Batch size is chosen to saturate the MXU (override with BENCH_BATCH).
"""

import json
import os
import sys
import time


def main():
    from duodiff_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    import jax
    import jax.numpy as jnp

    from duodiff_tpu.config import UViTConfig
    from duodiff_tpu.diffusion import NoiseSchedule, ddpm_sample
    from duodiff_tpu.models.uvit import init_uvit

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "1000"))

    cfg = UViTConfig(
        img_size=64, patch_size=4, in_chans=3, embed_dim=512, depth=13,
        num_heads=8, mlp_ratio=4, qkv_bias=False, mlp_time_embed=False,
        num_classes=-1, normalize_timesteps=True,
    )
    model, params = init_uvit(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    schedule = NoiseSchedule.create(steps=steps)
    shape = (batch, 64, 64, 3)

    def apply_fn(x, t, y):
        return model.apply({"params": params}, x, t, y)

    @jax.jit
    def run(key):
        x, _ = ddpm_sample(
            apply_fn, key, schedule=schedule, shape=shape,
            parametrization="predict_noise",
        )
        return x

    print(
        f"bench: compiling {steps}-step scan, batch {batch}, "
        f"backend {jax.default_backend()}...",
        file=sys.stderr,
    )
    t0 = time.time()
    jax.block_until_ready(run(jax.random.PRNGKey(0)))
    print(f"bench: compile+first run {time.time() - t0:.1f}s", file=sys.stderr)

    n_timed = int(os.environ.get("BENCH_REPS", "2"))
    t0 = time.time()
    for i in range(n_timed):
        x = jax.block_until_ready(run(jax.random.PRNGKey(1 + i)))
    elapsed = (time.time() - t0) / n_timed
    assert bool(jnp.all(jnp.isfinite(x))), "non-finite samples"

    n_chips = jax.device_count()
    samples_per_sec_per_chip = batch / elapsed / n_chips
    baseline = 1.0 / 1.92  # s/image from BASELINE.md CelebA dense point

    print(json.dumps({
        "metric": "samples/sec/chip (U-ViT CelebA-64, 1000-step DDPM)",
        "value": round(samples_per_sec_per_chip, 4),
        "unit": "samples/sec/chip",
        "vs_baseline": round(samples_per_sec_per_chip / baseline, 3),
    }))


if __name__ == "__main__":
    main()

"""Microbenchmarks for the hot kernels on the real TPU chip.

Times (a) the full flagship U-ViT forward under each attention impl, (b) the
standalone Pallas attention kernel, (c) the fused attention-sublayer kernel,
and (d) the equivalent unfused XLA sublayer chain — so regressions can be
attributed to the kernel itself vs the surrounding XLA graph (layout copies,
prepacking, fusion breaks).

Usage: python tools/microbench.py [fwd|kernels|all]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timeit(fn, *args, reps=20, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def bench_forward(config_path=None):
    import os

    import jax
    import jax.numpy as jnp

    from duodiff_tpu.config import flagship_config, load_model_config
    from duodiff_tpu.models.uvit import init_uvit
    from duodiff_tpu.utils.profiling import flops_per_uvit_forward

    if config_path:
        cfg, _ = load_model_config(config_path)
    else:
        cfg = flagship_config()
    b = 128
    x = jnp.zeros((b, cfg.img_size, cfg.img_size, cfg.in_chans), jnp.bfloat16)
    t = jnp.full((b,), 500.0, jnp.float32)
    y = jnp.zeros((b,), jnp.int32) if cfg.num_classes > 0 else None
    flops = flops_per_uvit_forward(cfg, b)
    # default tanh: the sampling production setting; MB_GELU=exact for the
    # training-parity form (bench_train defaults the other way around)
    gelu_approx = os.environ.get("MB_GELU", "tanh") == "tanh"
    for impl in ("pallas", "fused", "xla"):
        model, params = init_uvit(
            cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16, attn_impl=impl,
            gelu_approx=gelu_approx,
        )
        fwd = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t, y))
        dt = timeit(fwd, params, x, t)
        print(f"forward[{impl:6s}] gelu={'tanh' if gelu_approx else 'exact'}:"
              f" {dt*1e3:8.2f} ms ({flops/dt/1e12:6.1f} TF/s effective)")


def bench_kernels():
    import jax
    import jax.numpy as jnp

    from duodiff_tpu.models.layers import Block
    from duodiff_tpu.ops.pallas_attention import flash_attention
    from duodiff_tpu.ops.pallas_block import fused_attn_sublayer

    b, h, l, dh = 128, 8, 257, 64
    d = h * dh
    key = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(jax.random.PRNGKey(i), (b, h, l, dh), jnp.bfloat16)
        for i in range(3)
    )
    dt = timeit(flash_attention, q, k, v)
    sdpa_flops = 2 * 2 * b * h * l * l * dh
    print(f"flash_attention:      {dt*1e3:8.2f} ms ({sdpa_flops/dt/1e12:6.1f} TF/s)")

    x = jax.random.normal(key, (b, l, d), jnp.bfloat16)
    ln_s = jnp.ones((d,), jnp.float32)
    ln_b = jnp.zeros((d,), jnp.float32)
    wqkv = jax.random.normal(key, (d, 3 * d), jnp.float32) * 0.02
    wp = jax.random.normal(key, (d, d), jnp.float32) * 0.02
    bp = jnp.zeros((d,), jnp.float32)
    fused = jax.jit(
        lambda x: fused_attn_sublayer(
            x, ln_s, ln_b, wqkv, None, wp, bp, num_heads=h
        )
    )
    dt = timeit(fused, x)
    sub_flops = 2 * b * l * d * 4 * d + sdpa_flops
    print(f"fused_attn_sublayer:  {dt*1e3:8.2f} ms ({sub_flops/dt/1e12:6.1f} TF/s)")

    # unfused equivalent: one Block's attention half via XLA/pallas mix
    for impl in ("pallas", "xla"):
        blk = Block(num_heads=h, mlp_ratio=4, dtype=jnp.bfloat16, attn_impl=impl)
        params = blk.init(jax.random.PRNGKey(0), x)["params"]
        app = jax.jit(lambda p, x: blk.apply({"params": p}, x))
        dt = timeit(app, params, x)
        blk_flops = sub_flops + 2 * 2 * b * l * d * 4 * d
        print(f"full Block[{impl:6s}]:   {dt*1e3:8.2f} ms "
              f"({blk_flops/dt/1e12:6.1f} TF/s)")
    blk = Block(num_heads=h, mlp_ratio=4, dtype=jnp.bfloat16, attn_impl="fused")
    params = blk.init(jax.random.PRNGKey(0), x)["params"]
    app = jax.jit(lambda p, x: blk.apply({"params": p}, x))
    dt = timeit(app, params, x)
    blk_flops = sub_flops + 2 * 2 * b * l * d * 4 * d
    print(f"full Block[fused ]:   {dt*1e3:8.2f} ms ({blk_flops/dt/1e12:6.1f} TF/s)")


def bench_train():
    """Full CelebA-64 train step (fwd+loss+grad+AdamW) per attention impl.
    2026-08-16 v5e results: fused sublayer kernels w/ hand-written Pallas
    backwards (incl. the MLP bwd kernel) 111.9 ms/step, pallas flash-attn
    custom VJP + fused MLP 119.7, + XLA MLP 117.8, pure xla 172.1."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from duodiff_tpu.config import flagship_config
    from duodiff_tpu.diffusion import NoiseSchedule
    from duodiff_tpu.models.early_exit import init_early_exit_uvit
    from duodiff_tpu.models.uvit import init_uvit
    from duodiff_tpu.training.train_state import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    # MB_MODEL=deediff benches the DeeDiff fine-tune step (frozen-free full
    # grad; reference trains 100k of these per model) with the mlp-probe-
    # per-layer classifier — depth output heads + probes on top of the UViT
    model_kind = (
        "deediff_uvit" if os.environ.get("MB_MODEL") == "deediff" else "uvit"
    )
    # MB_CONFIG=configs/uvit_imagenet64.yaml benches other model scales
    # (e.g. D=768 depth 17, whose attention/MLP backwards dispatch to the
    # XLA recompute fallbacks — attn_bwd_fits/mlp_bwd_fits)
    cfg_path = os.environ.get("MB_CONFIG")
    if cfg_path:
        from duodiff_tpu.config import load_model_config

        cfg, _ = load_model_config(cfg_path)
    else:
        cfg = flagship_config()
    sched = NoiseSchedule.create(steps=1000)
    tx = make_optimizer(lr=2e-4, weight_decay=0.03, beta1=0.99, beta2=0.999,
                        max_grad_norm=1.0, num_warmup_steps=1500,
                        num_training_steps=500000)
    bsz = int(os.environ.get("MB_BATCH", "128"))
    batch = {
        "image": jnp.asarray(
            np.random.RandomState(0).randn(
                bsz, cfg.img_size, cfg.img_size, cfg.in_chans
            ),
            jnp.float32,
        ),
        "label": jnp.zeros((bsz,), jnp.int32),
    }
    variants = (
        ("fused", "auto"),     # fused sublayer kernels, hand-written bwds
        ("pallas", "fused"),   # flash-attn VJP + fused MLP w/ Pallas bwd
        ("pallas", "xla"),     # flash-attn VJP + plain XLA MLP (old default)
        ("xla", "xla"),
    )
    only = os.environ.get("MB_ONLY")
    if only:
        variants = tuple(v for v in variants if v[0] in only.split(","))
    gelu_approx = os.environ.get("MB_GELU", "exact") == "tanh"
    # MB_REMAT=1 benches --use_checkpoint (per-block activation remat)
    use_checkpoint = os.environ.get("MB_REMAT") == "1"
    for impl, mlp_impl in variants:
        if model_kind == "deediff_uvit":
            from dataclasses import replace

            model, params = init_early_exit_uvit(
                replace(cfg, classifier_type="mlp_probe_per_layer"),
                jax.random.PRNGKey(0), dtype=jnp.bfloat16, attn_impl=impl,
                gelu_approx=gelu_approx, use_checkpoint=use_checkpoint,
            )
        else:
            model, params = init_uvit(
                cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16, attn_impl=impl,
                mlp_impl=mlp_impl, gelu_approx=gelu_approx,
                use_checkpoint=use_checkpoint,
            )
        state = create_train_state(params, tx)
        step = jax.jit(make_train_step(
            lambda p, x, t, y: model.apply({"params": p}, x, t, y),
            sched, model_kind=model_kind, parametrization="predict_noise",
            has_labels=cfg.num_classes > 0,
        ), donate_argnums=(0,))
        key = jax.random.PRNGKey(1)
        for _ in range(3):
            state, m = step(state, batch, key)
        jax.block_until_ready(m["train_loss"])
        t0 = time.perf_counter()
        n = 20
        for _ in range(n):
            state, m = step(state, batch, key)
        jax.block_until_ready(m["train_loss"])
        dt = (time.perf_counter() - t0) / n
        print(f"train_step[{impl:6s}+mlp:{mlp_impl:5s}] "
              f"gelu={'tanh' if gelu_approx else 'exact'}: {dt*1e3:7.1f} "
              f"ms/step ({1/dt:.2f} steps/s, loss {float(m['train_loss']):.4f})")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    config_path = sys.argv[2] if len(sys.argv) > 2 else None
    from duodiff_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()
    if which in ("fwd", "all"):
        bench_forward(config_path)
    if which in ("kernels", "all"):
        bench_kernels()
    if which in ("train", "all"):
        bench_train()

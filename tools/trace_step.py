"""Capture a device trace of the sampling hot loop and print a per-op-category
time breakdown (the tooling behind NOTES.md's step-time tables).

Runs one compiled 100-step sampling chunk under jax.profiler.trace, then
parses the xplane protobuf with tensorboard_plugin_profile and aggregates
device time by HLO category (fusion / custom-call / copy / convolution / ...),
printing the top ops within each.

Usage: python tools/trace_step.py [--attn fused|pallas|xla] [--batch 128]
       [--steps 20] [--out /tmp/duodiff_trace]
"""

import argparse
import glob
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def capture(args):
    import jax

    if args.rng != "threefry":
        jax.config.update("jax_default_prng_impl", args.rng)
    import jax.numpy as jnp

    from duodiff_tpu.config import flagship_config, load_model_config
    from duodiff_tpu.diffusion import NoiseSchedule
    from duodiff_tpu.diffusion.sampling import make_chunked_ddpm_sampler
    from duodiff_tpu.models.uvit import init_uvit

    if args.config:
        cfg, _ = load_model_config(args.config)
    else:
        cfg = flagship_config()
    model, params = init_uvit(
        cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16, attn_impl=args.attn,
        gelu_approx=args.gelu == "tanh",
    )
    y = jnp.zeros((args.batch,), jnp.int32) if cfg.num_classes > 0 else None
    schedule = NoiseSchedule.create(steps=1000)
    # params ride through the opaque y bundle as traced ARGUMENTS — closing
    # over them bakes >200MB of constants into the MLIR for the imagenet
    # models and the remote-compile endpoint rejects the module (HTTP 413);
    # bundling also matches bench_matrix's program for compile-cache hits
    sample = make_chunked_ddpm_sampler(
        lambda x, t, bundle: model.apply({"params": bundle[1]}, x, t, bundle[0]),
        schedule, parametrization="predict_noise", chunk=args.steps,
    )
    shape = (args.batch, cfg.img_size, cfg.img_size, cfg.in_chans)
    t_start = args.steps - 1  # one chunk's worth of steps
    # warm up / compile outside the trace
    jax.block_until_ready(
        sample(jax.random.PRNGKey(0), shape, t_start=t_start, y=(y, params))
    )
    with jax.profiler.trace(args.out):
        jax.block_until_ready(
            sample(jax.random.PRNGKey(1), shape, t_start=t_start,
                   y=(y, params))
        )
    print(f"trace written to {args.out}", file=sys.stderr)


def capture_train(args):
    """Trace full train steps (fwd+loss+grad+AdamW) instead of sampling."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from duodiff_tpu.config import flagship_config, load_model_config
    from duodiff_tpu.diffusion import NoiseSchedule
    from duodiff_tpu.models.uvit import init_uvit
    from duodiff_tpu.training.train_state import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    if args.config:
        cfg, _ = load_model_config(args.config)
    else:
        cfg = flagship_config()
    model, params = init_uvit(
        cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16, attn_impl=args.attn,
        gelu_approx=args.gelu == "tanh",
    )
    sched = NoiseSchedule.create(steps=1000)
    tx = make_optimizer(lr=2e-4, weight_decay=0.03, beta1=0.99, beta2=0.999,
                        max_grad_norm=1.0, num_warmup_steps=1500,
                        num_training_steps=500000)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(
        lambda p, x, t, y: model.apply({"params": p}, x, t, y),
        sched, model_kind="uvit", parametrization="predict_noise",
    ), donate_argnums=(0,))
    batch = {
        "image": jnp.asarray(
            np.random.RandomState(0).randn(
                args.batch, cfg.img_size, cfg.img_size, cfg.in_chans
            ), jnp.float32
        ),
        "label": jnp.zeros((args.batch,), jnp.int32),
    }
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        state, m = step(state, batch, key)
    jax.block_until_ready(m["train_loss"])
    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            state, m = step(state, batch, key)
        jax.block_until_ready(m["train_loss"])
    print(f"train trace written to {args.out}", file=sys.stderr)


def summarize(out_dir, n_steps, top: int = 15):
    """Aggregate device time by HLO category from the captured xplane.

    Parses the raw xplane protobuf (tensorflow.tsl xplane_pb2 — the
    tensorboard_plugin_profile native bridge is version-mismatched in this
    image) and sums event durations on the TPU device plane.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplanes = glob.glob(f"{out_dir}/**/*.xplane.pb", recursive=True)
    assert xplanes, f"no xplane.pb under {out_dir}"
    xplane = max(xplanes, key=lambda p: Path(p).stat().st_mtime)
    space = xplane_pb2.XSpace()
    space.ParseFromString(Path(xplane).read_bytes())

    for plane in space.planes:
        if not ("TPU" in plane.name or "/device:" in plane.name):
            continue
        ev_meta = plane.event_metadata
        stat_meta = plane.stat_metadata
        by_cat = defaultdict(float)
        by_op = defaultdict(float)
        for line in plane.lines:
            if "step" in line.name.lower():
                continue  # step-markers double-count op time
            for ev in line.events:
                md = ev_meta[ev.metadata_id]
                dur_us = ev.duration_ps / 1e6
                cat = ""
                for st in list(ev.stats) + list(md.stats):
                    name = stat_meta[st.metadata_id].name
                    if name == "hlo_category":
                        cat = st.str_value or stat_meta[st.ref_value].name
                        break
                if not cat:
                    cat = "(uncategorized)"
                by_cat[cat] += dur_us
                by_op[(cat, md.name)] += dur_us
        total = sum(by_cat.values())
        if total == 0:
            continue
        print(f"\nplane {plane.name}: {total/1e3:.2f} ms over {n_steps} steps "
              f"({total/1e3/n_steps:.2f} ms/step)")
        for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
            print(f"  {cat:<28s} {us/1e3:9.2f} ms  ({100*us/total:5.1f}%)  "
                  f"[{us/1e3/n_steps:6.3f} ms/step]")
        print(f"\ntop {top} ops:")
        for (cat, name), us in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {us/1e3:9.2f} ms  {cat:<20s} {name[:90]}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--attn", default="fused")
    p.add_argument("--config", default=None, help="model YAML (default: flagship CelebA-64)")
    p.add_argument("--gelu", default="tanh", choices=["tanh", "exact"])
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--out", default="/tmp/duodiff_trace")
    p.add_argument("--summarize_only", action="store_true")
    p.add_argument("--top", type=int, default=15)
    p.add_argument("--mode", default="sample", choices=["sample", "train"])
    p.add_argument("--rng", default="threefry", choices=["threefry", "rbg"],
                   help="rbg matches bench_matrix's compiled programs")
    args = p.parse_args()
    if not args.summarize_only:
        from duodiff_tpu.utils.runtime import setup_compilation_cache

        setup_compilation_cache()
        if args.mode == "train":
            capture_train(args)
        else:
            capture(args)
    summarize(args.out, args.steps, top=args.top)

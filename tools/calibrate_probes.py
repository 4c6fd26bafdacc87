#!/usr/bin/env python
"""Fit cross-layer probe calibration for adaptive early exit.

Runs one dense early-exit trajectory on a DeeDiff checkpoint, logging each
probe's output against its REALIZED exit error (mse of its head's output vs
the backbone output — the common unit every layer shares), then fits
per-slot affine maps and writes them as JSON beside the checkpoint
(duodiff_tpu.diffusion.calibration). The resulting file enables
``eesampler.py --adaptive_bidirectional --probe_calibration <out>``:
walk decisions in realized-error units instead of raw per-probe scales
(which are not cross-layer comparable — measured, commit 501f462).

Example:

    python tools/calibrate_probes.py \
        --config configs/deediff_celeba.yaml --checkpoint ckpts/deediff \
        --out ckpts/deediff/probe_calibration.json
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, required=True, help="model YAML")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="Orbax checkpoint dir / torch .pth (default: "
                   "random init — smoke-test only)")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--class_id", type=int, default=None,
                   help="conditional models: fixed class (default: "
                   "random labels, as bench_matrix draws them)")
    p.add_argument("--attn_impl", type=str, default=None,
                   choices=["auto", "xla", "pallas", "fused"])
    p.add_argument("--gelu_approx", action="store_true", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from duodiff_tpu.diffusion import NoiseSchedule
    from duodiff_tpu.diffusion.calibration import (
        collect_probe_stats,
        fit_probe_calibration,
        save_probe_calibration,
    )
    from duodiff_tpu.utils.model_loading import load_model_from_config

    model, params, cfg, _ = load_model_from_config(
        args.config, args.checkpoint, early_exit=True, seed=args.seed,
        attn_impl=args.attn_impl, gelu_approx=bool(args.gelu_approx),
    )
    schedule = NoiseSchedule.create(steps=args.steps)
    shape = (args.batch, cfg.img_size, cfg.img_size, cfg.in_chans)

    key = jax.random.PRNGKey(args.seed)
    y = None
    if cfg.num_classes > 0:
        key, ykey = jax.random.split(key)
        if args.class_id is not None:
            y = jnp.full((args.batch,), args.class_id, jnp.int32)
        else:
            y = jax.random.randint(
                ykey, (args.batch,), 1, cfg.num_classes
            )

    print(f"collecting probe stats: {args.steps} steps, batch "
          f"{args.batch}, backend {jax.default_backend()} ...",
          file=sys.stderr)
    u_rows, e_rows = collect_probe_stats(
        lambda x, t, yy: model.apply({"params": params}, x, t, yy),
        schedule, key, shape, y=y,
    )
    calib = fit_probe_calibration(u_rows, e_rows)
    save_probe_calibration(args.out, calib, meta={
        "config": args.config,
        "checkpoint": args.checkpoint,
        "seed": args.seed,
        "batch": args.batch,
        "steps": args.steps,
        "backend": jax.default_backend(),
    })

    print("| slot | mean probe | mean realized err | slope a | "
          "intercept b | corr r |")
    print("|---|---|---|---|---|---|")
    for i in range(len(calib["a"])):
        print(f"| {i} | {float(u_rows[:, i].mean()):.6g} "
              f"| {calib['mean_error'][i]:.6g} | {calib['a'][i]:.6g} "
              f"| {calib['b'][i]:.6g} | {calib['r'][i]:+.3f} |")
    print(f"\nwrote {args.out}; thresholds for "
          "--adaptive_bidirectional are now in mse-vs-backbone units "
          "(pick one between the deep and shallow slots' mean realized "
          "errors above)")


if __name__ == "__main__":
    main()

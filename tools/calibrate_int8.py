"""Calibrate static int8 MLP activation scales for --attn_impl fused_int8.

Runs full reverse DDPM trajectories with the dynamic-int8 CALIBRATION
forward (XLA math whose numerics match the deployed W8A8 kernels; each
Block sows its MLP activation amaxes) and keeps the per-block running max
at the two MLP quant sites (post-LN, post-GELU). The JSON this writes
feeds --int8_scales on sampler.py / eesampler.py / serve.py, switching the
MLP kernels from dynamic per-row quantization to static scales — measured
11% faster per MLP call at the flagship geometry
(tools/probe_int8_static.py; attention measured no win and stays dynamic).

No reference counterpart (the reference samples fp32/AMP eager); this
accelerates the sampling CLIs (reference sampler.py:82-155).

Run on the real chip (or CPU — the calibration forward is pure XLA):

    PYTHONPATH=/root/repo:/root/.axon_site python tools/calibrate_int8.py \
        --config_path configs/uvit_celeba.yaml \
        --checkpoint_path /path/to/orbax/step \
        --output celeba_int8_scales.json
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--checkpoint_path", type=str, default=None)
    p.add_argument("--random_init", action="store_true",
                   help="calibrate on random weights (smoke runs only)")
    p.add_argument("--output", type=str, required=True,
                   help="where to write the scales JSON")
    p.add_argument("--early_exit", action="store_true",
                   help="the config is an EarlyExitUViT (eesampler model)")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_timesteps", type=int, default=1000)
    p.add_argument("--chunk", type=int, default=100,
                   help="scan chunk length (compile-time vs dispatch count)")
    p.add_argument("--margin", type=float, default=1.1,
                   help="headroom multiplier on the calibrated amaxes")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--parametrization", type=str, default="predict_noise",
                   choices=["predict_noise", "predict_original",
                            "predict_previous"])
    p.add_argument("--gelu_approx", action=argparse.BooleanOptionalAction,
                   default=False)
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--fixed_class", type=int, default=None,
                   help="conditional models: calibrate on this class label "
                        "(default: uniform random labels incl. none)")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)

    from duodiff_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    import jax
    import jax.numpy as jnp

    from duodiff_tpu.diffusion import NoiseSchedule
    from duodiff_tpu.utils.int8_calib import (
        calibrate_int8_mlp_scales,
        save_int8_scales,
    )
    from duodiff_tpu.utils.model_loading import load_model_from_config

    if not args.random_init and args.checkpoint_path is None:
        raise SystemExit("--checkpoint_path is required (or --random_init)")

    model, params, cfg, ae_cfg = load_model_from_config(
        args.config_path,
        None if args.random_init else args.checkpoint_path,
        early_exit=args.early_exit,
        seed=args.seed,
        attn_impl="fused_int8",
        gelu_approx=args.gelu_approx,
        use_ema=args.use_ema,
        int8_calibrate=True,
    )
    if ae_cfg is not None:
        # latent models sample in latent space; calibrate there too
        print("latent model: calibrating in the autoencoder latent space")

    schedule = NoiseSchedule.create(steps=args.num_timesteps)
    shape = (args.batch_size, cfg.img_size, cfg.img_size, cfg.in_chans)

    y = None
    if cfg.num_classes > 0:
        if args.fixed_class is not None:
            if not 0 <= args.fixed_class < cfg.num_classes:
                raise SystemExit(
                    f"--fixed_class must be in [0, {cfg.num_classes})"
                )
            y = jnp.full((args.batch_size,), args.fixed_class, jnp.int32)
        else:
            y = jax.random.randint(
                jax.random.PRNGKey(args.seed + 1), (args.batch_size,),
                0, cfg.num_classes,
            )

    print(
        f"calibrating {args.num_timesteps}-step trajectory, "
        f"batch={args.batch_size}, margin={args.margin} ..."
    )
    scales = calibrate_int8_mlp_scales(
        model, params, schedule, jax.random.PRNGKey(args.seed), shape,
        parametrization=args.parametrization, y=y, chunk=args.chunk,
        margin=args.margin,
    )
    for name, (sx, sh) in sorted(scales.items()):
        print(f"  {name:16s} post-LN amax {sx:8.3f}  post-GELU amax {sh:8.3f}")

    save_int8_scales(
        args.output, scales,
        meta={
            "config_path": args.config_path,
            "checkpoint_path": args.checkpoint_path,
            "num_timesteps": args.num_timesteps,
            "batch_size": args.batch_size,
            "margin": args.margin,
            "parametrization": args.parametrization,
            "gelu_approx": args.gelu_approx,
            "seed": args.seed,
            "early_exit": args.early_exit,
            "use_ema": args.use_ema,
        },
    )
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()

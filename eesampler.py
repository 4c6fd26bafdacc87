"""Early-exit (DeeDiff/AdaDiff) sampling CLI.

Same public contract as the reference eesampler.py:114-213 — threshold,
checkpoint, PNG dump, statistics.txt plus the two exit-diagnostics tensors
(error_prediction_by_timestep 1000 x depth, indices_by_timestep 1000 x B) —
with the exit selection vectorized inside a single on-device lax.scan
(duodiff_tpu.diffusion.sampling.early_exit_sample).
"""

import argparse
import time
from pathlib import Path

import numpy as np


def get_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--threshold", type=float, default=None,
                        help="Dynamic exit threshold (required unless "
                             "--static_schedule is given)")
    parser.add_argument("--checkpoint_path", type=str, default=None)
    parser.add_argument("--batch_size", type=int, required=True)
    parser.add_argument("--output_folder", type=str, required=True)
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--class_id", type=int, default=None,
                        help="Enable class-conditional sampling. Unguided: "
                             "random labels in [1, 1001) (reference parity). "
                             "Guided (--guidance_scale): sample this class; "
                             "-1 for uniform random real classes")
    parser.add_argument("--guidance_scale", type=float, default=None,
                        help="Classifier-free guidance weight w: backbone "
                             "and every per-layer head output are guided "
                             "(out_null + w*(out_cond - out_null)); probe "
                             "values gate on the conditional half. Needs "
                             "weights trained with --label_dropout")
    parser.add_argument("--null_class", type=int, default=None,
                        help="Null-label index for guidance (default "
                             "num_classes-1)")
    parser.add_argument("--random_init", action="store_true")
    parser.add_argument("--num_timesteps", type=int, default=1000)
    parser.add_argument("--model_parallel", type=int, default=1,
                        help="Tensor-parallel degree for the dynamic-"
                             "threshold sampler: shard attention heads / "
                             "MLP hidden over a (data, model) mesh "
                             "(Megatron-style 'heads' layout)")
    parser.add_argument("--attn_impl", type=str, default=None,
                        choices=["auto", "xla", "pallas", "fused", "fused_int8"])
    parser.add_argument("--gelu_approx", action="store_true",
                        help="tanh-approx GELU (below bf16 rounding)")
    parser.add_argument("--use_ema", action="store_true",
                        help="Sample with the EMA shadow params from an "
                             "--ema_decay-trained checkpoint")
    parser.add_argument("--int8_scales", type=str, default=None,
                        help="tools/calibrate_int8.py JSON: static MLP "
                             "activation scales for --attn_impl fused_int8")
    parser.add_argument(
        "--static_schedule", type=str, default=None,
        help="Timestep-bucketed static exits, e.g. '999-700:3,699-300:8,"
             "299-0:13' — runs truncated backbones per bucket (REAL compute "
             "savings; the dynamic rule only selects among fully-computed "
             "heads). Derive buckets from a dynamic run's "
             "indices_by_timestep.npy with "
             "duodiff_tpu.diffusion.static_exit.derive_exit_schedule.")
    parser.add_argument(
        "--adaptive_layers", type=str, default=None,
        help="Probe-DRIVEN bucket selection (chunk-level input "
             "adaptivity): comma list of candidate exit layers, e.g. "
             "'3,8,13'. Each --adaptive_chunk-step segment runs ONE "
             "truncated backbone that also accumulates its probe's mean "
             "predicted error; the host moves one bucket deeper/shallower "
             "between chunks against --threshold (hysteresis "
             "--adaptive_margin). Static shapes, one executable per "
             "layer, zero per-sample divergence. Per-layer probe "
             "families only (mlp_probe_per_layer / attention_probe)")
    parser.add_argument("--adaptive_chunk", type=int, default=50,
                        help="steps per adaptive decision chunk")
    parser.add_argument("--adaptive_margin", type=float, default=0.7,
                        help="bidirectional mode only: go shallower when "
                             "mean probe <= threshold * margin")
    parser.add_argument("--adaptive_bidirectional", action="store_true",
                        help="allow shallower moves. Requires "
                             "--probe_calibration: RAW probe scales are "
                             "not comparable across layers (measured: the "
                             "uncalibrated walk oscillates), so "
                             "bidirectional decisions must run on "
                             "calibrated values")
    parser.add_argument(
        "--probe_calibration", type=str, default=None,
        help="Per-layer probe calibration JSON (tools/calibrate_probes.py):"
             " affine maps from probe outputs onto realized exit error, "
             "fitted beside the checkpoint. With it, adaptive walk "
             "decisions (and --threshold) are in mse-vs-backbone units "
             "and cross-layer comparisons become valid")
    parser.add_argument(
        "--derive_schedule_from", type=str, default=None,
        help="Path to a dynamic run's indices_by_timestep.npy: derive the "
             "static bucket schedule from it (--derive_buckets N) and "
             "sample with truncated backbones — the one-command version of "
             "the dynamic-run -> derive -> --static_schedule workflow")
    parser.add_argument("--derive_buckets", type=int, default=4)
    parser.add_argument(
        "--cache_every", type=int, default=None,
        help="Compose training-free block caching into the static-exit "
             "buckets (sampler.py --cache_every semantics: the centered "
             "region of each bucket's truncated backbone recomputes only "
             "on t %% N == 0 anchors). Requires --static_schedule/"
             "--derive_schedule_from")
    parser.add_argument(
        "--cache_schedule", type=str, default=None,
        help="Drift-derived anchor-table JSON "
             "(tools/derive_cache_schedule.py) replacing the uniform "
             "--cache_every rule inside the static-exit buckets (bucket "
             "entry steps still re-anchor). Requires --static_schedule/"
             "--derive_schedule_from; excludes --cache_every")
    parser.add_argument(
        "--cache_outer", type=int, default=None,
        help="Blocks kept live at each end under --cache_every/"
             "--cache_schedule (default ceil(depth/2/3), auto-raised per "
             "bucket to keep the cached region inside the truncation)")
    parser.add_argument(
        "--derive_quantile", type=float, default=0.5,
        help="Per-bucket exit depth = ceil of this quantile of the logged "
             "per-sample exits (0.5 = median, the validated default; the "
             "MEAN is unsafe — see derive_exit_schedule docstring)")
    return parser.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    output_folder = Path(args.output_folder)
    output_folder.mkdir(parents=True, exist_ok=True)

    from duodiff_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    import jax

    from duodiff_tpu.diffusion import ChunkedEarlyExitSampler, NoiseSchedule
    from duodiff_tpu.utils.image import save_samples
    from duodiff_tpu.utils.model_loading import load_model_from_config

    if not args.random_init and args.checkpoint_path is None:
        raise SystemExit("--checkpoint_path is required (or pass --random_init)")
    if args.derive_schedule_from is not None:
        if args.static_schedule is not None:
            raise SystemExit("--derive_schedule_from and --static_schedule "
                             "are mutually exclusive")
        from duodiff_tpu.diffusion.static_exit import derive_exit_schedule

        idx = np.load(args.derive_schedule_from)
        if idx.shape[0] != args.num_timesteps:
            raise SystemExit(
                f"--derive_schedule_from table covers {idx.shape[0]} "
                f"timesteps but --num_timesteps is {args.num_timesteps}"
            )
        buckets = derive_exit_schedule(
            idx, n_buckets=args.derive_buckets,
            quantile=args.derive_quantile,
        )
        args.static_schedule = ",".join(
            f"{hi}-{lo}:{layer}" for hi, lo, layer in buckets
        )
        print(f"Derived static schedule from {args.derive_schedule_from}: "
              f"{args.static_schedule}")
    if args.threshold is None and args.static_schedule is None:
        raise SystemExit("--threshold is required (or pass --static_schedule)")

    if args.adaptive_layers is not None:
        if args.static_schedule is not None:
            raise SystemExit("--adaptive_layers and --static_schedule are "
                             "mutually exclusive")
        if args.threshold is None:
            raise SystemExit("--adaptive_layers needs --threshold (the "
                             "probe exit rule it decides against)")
        if args.cache_every is not None or args.cache_schedule is not None:
            raise SystemExit("--adaptive_layers does not combine with "
                             "block caching yet (bucket switches would "
                             "invalidate the cached delta mid-chunk)")
        if args.guidance_scale is not None:
            raise SystemExit("--adaptive_layers does not combine with "
                             "--guidance_scale")
        if args.adaptive_bidirectional and args.probe_calibration is None:
            raise SystemExit(
                "--adaptive_bidirectional needs --probe_calibration: raw "
                "probe scales are not cross-layer comparable (measured "
                "oscillation, commit 501f462); fit one with "
                "tools/calibrate_probes.py"
            )
    cache_on = args.cache_every is not None or args.cache_schedule is not None
    if cache_on:
        if args.cache_every is not None and args.cache_schedule is not None:
            raise SystemExit("--cache_schedule and --cache_every are "
                             "mutually exclusive")
        if args.static_schedule is None:
            raise SystemExit("--cache_every/--cache_schedule requires "
                             "--static_schedule or --derive_schedule_from "
                             "(the dynamic-threshold path must compute "
                             "every layer — caching would change the probe "
                             "inputs it selects on)")
        if args.guidance_scale is not None:
            raise SystemExit("--cache_every/--cache_schedule does not "
                             "combine with --guidance_scale")
    elif args.cache_outer is not None:
        raise SystemExit("--cache_outer requires --cache_every or "
                         "--cache_schedule")

    mp = max(1, getattr(args, "model_parallel", 1) or 1)
    if mp > 1 and args.adaptive_layers:
        raise SystemExit("--model_parallel does not combine with "
                         "--adaptive_layers")
    if mp > 1 and args.static_schedule:
        # static_exit_sample builds its own per-bucket truncated models in
        # the packed layout; TP sampling is the dynamic-threshold path
        raise SystemExit("--model_parallel does not combine with "
                         "--static_schedule")
    # TP x fused shard_map path (see sampler.py / parallel/tp_fused.py)
    tp_mesh = None
    if mp > 1 and args.attn_impl == "fused":
        from duodiff_tpu.parallel import sampling_mesh

        tp_mesh = sampling_mesh(mp, args.batch_size)
    model, params, cfg, ae_cfg = load_model_from_config(
        args.config_path,
        None if args.random_init else args.checkpoint_path,
        early_exit=True,
        seed=args.seed,
        attn_impl=args.attn_impl,
        gelu_approx=args.gelu_approx,
        qkv_layout="heads" if mp > 1 else "packed",
        use_ema=args.use_ema,
        int8_scales=args.int8_scales,
        tp_mesh=tp_mesh,
    )

    decode_fn = None
    if ae_cfg is not None:
        from duodiff_tpu.models.autoencoder import load_autoencoder

        ae_model, ae_params = load_autoencoder(
            ae_cfg.autoencoder_checkpoint_path, config=ae_cfg
        )
        decode_fn = jax.jit(
            lambda z: ae_model.apply({"params": ae_params}, z, method=ae_model.decode)
        )

    schedule = NoiseSchedule.create(steps=args.num_timesteps)
    shape = (args.batch_size, cfg.img_size, cfg.img_size, cfg.in_chans)

    import jax.numpy as jnp

    key = jax.random.PRNGKey(args.seed)
    y = None
    guidance = None
    if args.guidance_scale is not None:
        if args.class_id is None:
            raise SystemExit("--guidance_scale needs --class_id (labels)")
        null_class = (
            args.null_class
            if args.null_class is not None
            else cfg.num_classes - 1
        )
        if null_class < 1:
            raise SystemExit(
                "--guidance_scale needs a class-conditional model with a "
                f"reserved null slot: num_classes={cfg.num_classes}, "
                f"null_class={null_class} leaves no real classes"
            )
        guidance = (args.guidance_scale, null_class)
    if args.class_id is not None:
        key, ykey = jax.random.split(key)
        if guidance is not None:
            # guided labels must be REAL classes in [0, null_class)
            hi = guidance[1]
            if args.class_id >= 0:
                if args.class_id >= hi:
                    raise SystemExit(
                        f"--class_id {args.class_id} is not a real class: "
                        f"guided labels must lie in [0, {hi})"
                    )
                y = jnp.full((args.batch_size,), args.class_id, jnp.int32)
            else:
                y = jax.random.randint(ykey, (args.batch_size,), 0, hi)
        else:
            y = jax.random.randint(ykey, (args.batch_size,), 1, 1001)

    if args.adaptive_layers is not None:
        from duodiff_tpu.diffusion.static_exit import (
            make_adaptive_exit_sampler,
        )

        layers = [int(v) for v in args.adaptive_layers.split(",")]
        calibration = None
        if args.probe_calibration is not None:
            from duodiff_tpu.diffusion.calibration import (
                load_probe_calibration,
            )

            calibration = load_probe_calibration(args.probe_calibration)
        sampler = make_adaptive_exit_sampler(
            cfg, params, schedule=schedule, layers=layers,
            chunk=args.adaptive_chunk, threshold=args.threshold,
            margin=args.adaptive_margin,
            monotone=not args.adaptive_bidirectional,
            calibration=calibration,
            attn_impl=args.attn_impl
            or ("fused" if jax.default_backend() == "tpu" else "auto"),
            gelu_approx=args.gelu_approx,
        )
        print(f"Adaptive-exit sampling {args.batch_size} images "
              f"(layers={sorted(set(layers))}, chunk={args.adaptive_chunk}, "
              f"threshold={args.threshold})...")
        tic = time.time()
        x, chunk_log = sampler(key, shape, y=y)
        x = jax.block_until_ready(x)
        elapsed = time.time() - tic
        import json as _json

        (output_folder / "adaptive_log.json").write_text(
            _json.dumps(chunk_log, indent=1)
        )
        idx_by_t = np.zeros((schedule.steps, args.batch_size), np.int32)
        for row in chunk_log:
            idx_by_t[row["t_lo"]: row["t_hi"] + 1] = row["layer"]
        # The adaptive sampler only evaluates the ACTIVE layer's probe, so
        # the (steps, depth) diagnostics grid is sparse: fill each chunk's
        # rows at the probed SLOT's column (column i = probe slot i = exit
        # layer i, the dynamic path's convention; exit at full depth probes
        # slot depth-1 — truncated_ee_apply_probed) and leave the
        # unevaluated slots NaN.
        err_by_t = np.full((schedule.steps, cfg.depth), np.nan, np.float32)
        for row in chunk_log:
            slot = min(row["layer"], cfg.depth - 1)
            err_by_t[row["t_lo"]: row["t_hi"] + 1, slot] = (
                row["mean_probe"]
            )
        mean_layer = float(np.mean([r["layer"] for r in chunk_log]))
        print(f"adaptive chunks: {len(chunk_log)}, mean layer "
              f"{mean_layer:.2f}")
    elif args.static_schedule:
        from duodiff_tpu.diffusion.static_exit import (
            parse_exit_schedule,
            static_exit_sample,
        )

        buckets = parse_exit_schedule(args.static_schedule)
        cache_rule = args.cache_every
        if args.cache_schedule is not None:
            from duodiff_tpu.diffusion import load_cache_schedule

            cache_rule = jnp.asarray(load_cache_schedule(
                args.cache_schedule, num_timesteps=args.num_timesteps
            ))
        print(f"Static-exit sampling {args.batch_size} images "
              f"(buckets={buckets}"
              + (f", cache_every={args.cache_every}"
                 if args.cache_every else "")
              + (f", cache_schedule={args.cache_schedule}"
                 if args.cache_schedule else "") + ")...")
        tic = time.time()
        x = static_exit_sample(
            cfg, params, key, schedule=schedule, shape=shape,
            buckets=buckets, y=y,
            attn_impl=args.attn_impl
            or ("fused" if jax.default_backend() == "tpu" else "auto"),
            gelu_approx=args.gelu_approx,
            guidance=guidance,
            cache_every=cache_rule,
            cache_outer=args.cache_outer,
        )
        x = jax.block_until_ready(x)
        elapsed = time.time() - tic
        # diagnostics implied by the schedule
        idx_by_t = np.zeros((schedule.steps, args.batch_size), np.int32)
        for t_hi, t_lo, layer in buckets:
            idx_by_t[t_lo : t_hi + 1] = layer
        err_by_t = np.full((schedule.steps, cfg.depth), np.nan, np.float32)
    else:
        # params-first: threaded through the jitted chunk as a traced
        # argument, not baked into the executable as literals (see
        # ChunkedDDPMSampler docstring)
        def apply_fn(p, x, t, yy):
            return model.apply({"params": p}, x, t, yy)

        if guidance is not None:
            from duodiff_tpu.diffusion import make_guided_apply_ee

            apply_fn = make_guided_apply_ee(apply_fn, *guidance)

        from duodiff_tpu.parallel import setup_sampling_sharding

        batch_shard, (params,) = setup_sampling_sharding(
            mp, args.batch_size, [params], mesh=tp_mesh
        )
        # constructed after the sharding block so the threaded tree is the
        # (possibly mesh-sharded) placement
        sampler = ChunkedEarlyExitSampler(
            apply_fn, schedule, threshold=args.threshold, params=params
        )
        print(f"Early-exit sampling {args.batch_size} images "
              f"(threshold={args.threshold})...")
        tic = time.time()
        x, err_by_t, idx_by_t = sampler.sample(key, shape, y=y,
                                               sharding=batch_shard)
        x = jax.block_until_ready(x)
        elapsed = time.time() - tic

    if decode_fn is not None:
        x = decode_fn(x)
    samples = np.asarray((x + 1.0) / 2.0)

    with open(output_folder / "statistics.txt", "w") as f:
        f.write(f"Elapsed time: {elapsed} s\n")
    np.save(output_folder / "error_prediction_by_timestep.npy", np.asarray(err_by_t))
    np.save(output_folder / "indices_by_timestep.npy", np.asarray(idx_by_t))
    try:  # reference tooling reads .pt files (eesampler.py:108-111)
        import torch

        torch.save(torch.from_numpy(np.asarray(err_by_t)),
                   output_folder / "error_prediction_by_timestep.pt")
        torch.save(torch.from_numpy(np.asarray(idx_by_t, dtype=np.float32)),
                   output_folder / "indices_by_timestep.pt")
    except ImportError:
        pass

    save_samples(samples, output_folder, with_grid=False)
    print(f"Elapsed time: {elapsed:.2f} s -> {output_folder}")
    print(f"mean exit index: {np.asarray(idx_by_t).mean():.2f} "
          f"(depth={cfg.depth})")


if __name__ == "__main__":
    main()

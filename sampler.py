"""Dense / DuoDiff / DDIM sampling CLI.

Same public contract as the reference sampler.py:192-356 — seed, checkpoint
pair, parametrization, DDIM flags, t_switch, intermediate saves, PNG + grid
dump, statistics.txt — but the whole 1000-step reverse process runs as one
jitted on-device lax.scan (duodiff_tpu.diffusion.sampling) instead of a
host-driven loop. Accepts Orbax checkpoint dirs or reference .pth files
(converted on the fly), plus --random_init for smoke/perf runs.
"""

import argparse
import time
from pathlib import Path

import numpy as np


def get_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--checkpoint_path", type=str, default=None,
                        help="Checkpoint of the (early, for DuoDiff) model")
    parser.add_argument("--checkpoint_path_late", type=str, default=None,
                        help="Checkpoint of the model used for the latest steps")
    parser.add_argument("--batch_size", type=int, required=True)
    parser.add_argument("--parametrization", type=str,
                        choices=["predict_noise", "predict_original",
                                 "predict_previous"],
                        required=True)
    parser.add_argument("--output_folder", type=str, required=True)
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--config_path_late", type=str, default=None)
    parser.add_argument("--t_switch", type=int, default=None,
                        help="Sampling timestep at which the late model takes over")
    parser.add_argument("--class_id", type=int, default=None,
                        help="Enable class-conditional sampling. Unguided: "
                             "random labels in [1, 1001) (reference parity; "
                             "the value is ignored). Guided "
                             "(--guidance_scale): sample this class; pass "
                             "-1 for uniform random real classes. Guided "
                             "mode assumes real labels occupy "
                             "[0, null_class)")
    parser.add_argument("--guidance_scale", type=float, default=None,
                        help="Classifier-free guidance weight w (beyond-"
                             "parity): out = out_null + w*(out_cond - "
                             "out_null) via a doubled-batch forward. Needs "
                             "class-conditional weights trained with "
                             "--label_dropout. w=1 == conditional model")
    parser.add_argument("--null_class", type=int, default=None,
                        help="Null-label index for guidance (default "
                             "num_classes-1)")
    parser.add_argument("--fixed_class", type=int, default=None,
                        help="Unguided class-conditional sampling of THIS "
                             "class for every sample (the reference's "
                             "--class_id draws random labels and ignores "
                             "the value, sampler.py:314-318 there — kept "
                             "for parity; this flag is the fixed-label "
                             "variant)")
    parser.add_argument("--model_parallel", type=int, default=1,
                        help="Tensor-parallel degree: shard attention "
                             "heads / MLP hidden over a (data, model) "
                             "mesh (Megatron-style 'heads' layout) "
                             "instead of replicating the model")
    parser.add_argument("--pipeline_parallel", action="store_true",
                        help="DuoDiff pipeline parallelism: place the "
                             "shallow and full models on DISJOINT device "
                             "submeshes and stream the batch through them "
                             "as micro-batches (stage 1 of micro-batch i "
                             "overlaps stage 2 of i-1). Needs --t_switch + "
                             "the late model and >= 2 devices")
    parser.add_argument("--pipeline_microbatch", type=int, default=None,
                        help="Micro-batch size for --pipeline_parallel "
                             "(default: batch_size / 4)")
    parser.add_argument("--interleave_every", type=int, default=None,
                        help="Interleaved heavy-light DDPM (training-free, "
                             "dual-rate family): run the FULL model on "
                             "steps with t %% N == 0 (always incl. t=0) "
                             "and the shallow model (--config_path/"
                             "--checkpoint_path) elsewhere — a uniform "
                             "per-step speedup instead of DuoDiff's single "
                             "switch. Needs the model pair; excludes "
                             "--t_switch/DDIM/DPM")
    parser.add_argument("--cache_every", type=int, default=None,
                        help="Block caching (training-free, Delta-DiT/"
                             "DeepCache family): recompute the middle "
                             "blocks only on anchor steps (t %% N == 0, "
                             "always incl. t=0) and reuse their cached "
                             "residual delta in between — the cached "
                             "steps run only the outer blocks. Plain DDPM "
                             "(single model, or the DuoDiff pair with "
                             "--t_switch: the full model's segment runs "
                             "cached); excludes DDIM/DPM/"
                             "--interleave_every")
    parser.add_argument("--cache_outer", type=int, default=None,
                        help="Blocks recomputed every step at EACH end of "
                             "the network under --cache_every (cached "
                             "region = the centered depth-2*N blocks). "
                             "Default: ceil(depth//2 / 3)")
    parser.add_argument("--cache_schedule", type=str, default=None,
                        help="Drift-derived anchor schedule JSON "
                             "(tools/derive_cache_schedule.py) in place of "
                             "the uniform --cache_every rule: anchors "
                             "exactly the listed timesteps (plus the first "
                             "reverse step). Plain DDPM or the DuoDiff "
                             "pair; excludes --cache_every/DPM")
    parser.add_argument("--use_ddim", action="store_true")
    parser.add_argument("--ddim_steps", type=int, default=50)
    parser.add_argument("--ddim_eta", type=float, default=0.0)
    parser.add_argument("--use_dpm_solver", action="store_true",
                        help="DPM-Solver++ 2M fast ODE sampling (training-"
                             "free; ~20 steps reach near-1000-step quality)")
    parser.add_argument("--dpm_steps", type=int, default=20)
    parser.add_argument("--dpm_order", type=int, default=2, choices=[1, 2])
    parser.add_argument("--timesteps_save", type=int, nargs="+", default=[])
    parser.add_argument("--random_init", action="store_true",
                        help="Skip checkpoint loading (random weights)")
    parser.add_argument("--num_timesteps", type=int, default=1000)
    parser.add_argument("--attn_impl", type=str, default=None,
                        choices=["auto", "xla", "pallas", "fused", "fused_int8"],
                        help="Attention path (default: fused Pallas sublayer "
                             "kernel on TPU, XLA elsewhere)")
    parser.add_argument("--gelu_approx", action="store_true",
                        help="tanh-approx GELU (below bf16 rounding, ~20%% "
                             "faster steps on TPU)")
    parser.add_argument("--use_ema", action="store_true",
                        help="Sample with the EMA shadow params from an "
                             "--ema_decay-trained checkpoint (both models "
                             "for DuoDiff)")
    parser.add_argument("--int8_scales", type=str, default=None,
                        help="tools/calibrate_int8.py JSON: static MLP "
                             "activation scales for --attn_impl fused_int8 "
                             "(skips dynamic per-row quantization)")
    parser.add_argument("--int8_scales_late", type=str, default=None,
                        help="int8 scales JSON for the DuoDiff late model")
    return parser.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    output_folder = Path(args.output_folder)
    output_folder.mkdir(parents=True, exist_ok=True)

    from duodiff_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    import jax
    import jax.numpy as jnp

    from duodiff_tpu.diffusion import (
        ChunkedDDPMSampler,
        NoiseSchedule,
        ddim_sample,
        dpm_solver_sample,
    )
    from duodiff_tpu.utils.image import save_samples
    from duodiff_tpu.utils.model_loading import load_model_from_config

    if not args.random_init and args.checkpoint_path is None:
        raise SystemExit("--checkpoint_path is required (or pass --random_init)")

    mp = max(1, args.model_parallel or 1)
    qkv_layout = "heads" if mp > 1 else "packed"
    # TP x fused: with an explicit --attn_impl fused the Blocks run the
    # shard_map sublayers on head-sharded weight shards (zero per-step
    # weight collectives, parallel/tp_fused.py) — the mesh must exist at
    # model build time
    tp_mesh = None
    if mp > 1 and args.attn_impl == "fused":
        from duodiff_tpu.parallel import sampling_mesh

        tp_mesh = sampling_mesh(mp, args.batch_size)
    model, params, cfg, ae_cfg = load_model_from_config(
        args.config_path,
        None if args.random_init else args.checkpoint_path,
        seed=args.seed,
        attn_impl=args.attn_impl,
        gelu_approx=args.gelu_approx,
        qkv_layout=qkv_layout,
        use_ema=args.use_ema,
        int8_scales=args.int8_scales,
        tp_mesh=tp_mesh,
    )

    late = None
    if args.config_path_late or args.checkpoint_path_late:
        late_model, late_params, late_cfg, _ = load_model_from_config(
            args.config_path_late or args.config_path,
            None if args.random_init else args.checkpoint_path_late,
            seed=args.seed + 1,
            attn_impl=args.attn_impl,
            gelu_approx=args.gelu_approx,
            qkv_layout=qkv_layout,
            use_ema=args.use_ema,
            int8_scales=args.int8_scales_late,
            tp_mesh=tp_mesh,
        )
        late = (late_model, late_params)

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

    key = jax.random.PRNGKey(args.seed)
    y = None
    if args.fixed_class is not None:
        if args.class_id is not None or args.guidance_scale is not None:
            raise SystemExit("--fixed_class is the unguided fixed-label "
                             "mode; don't combine with --class_id/"
                             "--guidance_scale (guided sampling already "
                             "honors --class_id)")
        if not 0 <= args.fixed_class < cfg.num_classes:
            raise SystemExit(
                f"--fixed_class must be in [0, {cfg.num_classes})"
            )
        y = jnp.full((args.batch_size,), args.fixed_class, jnp.int32)
    if args.class_id is not None:
        key, ykey = jax.random.split(key)
        if args.guidance_scale is not None:
            # guided sampling uses REAL class labels in [0, null_class) so
            # no sample conditions on the null token (which would make
            # cond == uncond, zero guidance). --class_id N samples class N;
            # --class_id -1 draws uniform random real classes.
            hi = (
                args.null_class
                if args.null_class is not None
                else cfg.num_classes - 1
            )
            if hi < 1:
                raise SystemExit(
                    "--guidance_scale needs a class-conditional model with "
                    f"a reserved null slot: num_classes={cfg.num_classes}, "
                    f"null_class={hi} leaves no real classes"
                )
            if args.class_id >= 0:
                if args.class_id >= hi:
                    raise SystemExit(
                        f"--class_id {args.class_id} is not a real class: "
                        f"guided labels must lie in [0, {hi}) "
                        "(null_class and above are reserved)"
                    )
                y = jnp.full((args.batch_size,), args.class_id, jnp.int32)
            else:
                y = jax.random.randint(ykey, (args.batch_size,), 0, hi)
        else:
            # reference parity: random labels in [1, 1001) when --class_id
            # is given (reference sampler.py:314-318)
            y = jax.random.randint(ykey, (args.batch_size,), 1, 1001)

    # params-first signature: the weight trees are threaded through the
    # jitted samplers as traced arguments, not closure constants — a closure
    # would embed them in the compiled executable as HLO literals (385MB
    # serialized for the flagship; see ChunkedDDPMSampler docstring)
    def apply_early(p, x, t, yy):
        return model.apply({"params": p}, x, t, yy)

    def apply_late(p, x, t, yy):
        late_model, _ = late
        return late_model.apply({"params": p}, x, t, yy)

    if args.guidance_scale is not None:
        from duodiff_tpu.diffusion import make_guided_apply

        if y is None:
            raise SystemExit("--guidance_scale needs --class_id (labels)")
        null_class = (
            args.null_class
            if args.null_class is not None
            else cfg.num_classes - 1
        )
        apply_early = make_guided_apply(
            apply_early, args.guidance_scale, null_class
        )
        if late is not None:
            apply_late = make_guided_apply(
                apply_late, args.guidance_scale, null_class
            )

    timesteps_save = tuple(args.timesteps_save)
    steps = schedule.steps

    # Anchor rule for block caching: the uniform --cache_every period, or a
    # drift-derived boolean table (--cache_schedule) — both ride the same
    # stateful scan (make_block_cached_apply accepts either).
    cache_rule = args.cache_every
    if args.cache_schedule is not None:
        if args.cache_every is not None:
            raise SystemExit(
                "--cache_schedule and --cache_every are mutually exclusive"
            )
        from duodiff_tpu.diffusion import load_cache_schedule

        cache_rule = jnp.asarray(
            load_cache_schedule(args.cache_schedule, num_timesteps=steps)
        )
    cache_on = cache_rule is not None

    # Multi-chip: shard the sample batch over the mesh "data" axis (DDPM
    # sampling is embarrassingly parallel over the batch) and, with
    # --model_parallel N, the attention heads / MLP hidden over "model"
    # (heads layout: zero-all-gather Megatron sharding). jit propagates the
    # layouts through every scan chunk — zero code changes in the samplers
    # beyond the initial placement.
    from duodiff_tpu.parallel import setup_sampling_sharding

    trees = [params] + ([late[1]] if late is not None else [])
    batch_shard, trees = setup_sampling_sharding(
        mp, args.batch_size, trees, mesh=tp_mesh
    )
    params = trees[0]
    if late is not None:
        late = (late[0], trees[1])

    def run_ddim(key, y):
        x_init = None
        if batch_shard is not None:
            ik = jax.random.fold_in(key, 777)
            x_init = jax.device_put(
                jax.random.normal(ik, shape, jnp.float32), batch_shard
            )
        x, inter = jax.jit(lambda p, pl, k, yy, xi: ddim_sample(
            lambda xx, tt, yy2: apply_early(p, xx, tt, yy2),
            k, schedule=schedule, shape=shape,
            ddim_steps=args.ddim_steps, eta=args.ddim_eta, y=yy,
            timesteps_save=timesteps_save,
            late_apply_fn=(
                (lambda xx, tt, yy2: apply_late(pl, xx, tt, yy2))
                if late else None
            ),
            t_switch=args.t_switch if late else None,
            x_init=xi,
        ))(params, late[1] if late else None, key, y, x_init)
        return x, list(inter)

    def cache_n_outer(model_cfg):
        k_half = model_cfg.depth // 2
        n_outer = (
            args.cache_outer
            if args.cache_outer is not None
            else max(1, -(-k_half // 3))
        )
        if not 1 <= n_outer <= k_half:
            raise SystemExit(
                f"--cache_outer must be in [1, {k_half}] for depth "
                f"{model_cfg.depth}, got {n_outer}"
            )
        return n_outer

    def cache_fns(p, n_outer):
        """(anchor, cached, init_state) closures over params ``p`` for the
        block-cache model pair (UViT.forward_anchor / forward_cached)."""
        anchor = lambda xx, tt, yy2: model.apply(  # noqa: E731
            {"params": p}, xx, tt, yy2, n_outer=n_outer,
            method=model.forward_anchor,
        )
        cached = lambda xx, tt, yy2, d: model.apply(  # noqa: E731
            {"params": p}, xx, tt, yy2, n_outer=n_outer, delta=d,
            method=model.forward_cached,
        )
        token_len = cfg.extras + cfg.num_patches
        init_state = lambda xx: jnp.zeros(  # noqa: E731
            (xx.shape[0], token_len, cfg.embed_dim), model.dtype
        )
        return anchor, cached, init_state

    def run_dpm(key, y):
        x_init = None
        if batch_shard is not None:
            ik = jax.random.fold_in(key, 778)
            x_init = jax.device_put(
                jax.random.normal(ik, shape, jnp.float32), batch_shard
            )

        def sample(p, k, yy, xi):
            cache = None
            if args.cache_every is not None:
                # block caching composed into the solver: anchors every
                # --cache_every TRANSITIONS (index-based; see
                # dpm_solver_sample's cache contract)
                anchor, cached, init_state = cache_fns(
                    p, cache_n_outer(cfg)
                )
                cache = (anchor, cached, args.cache_every, init_state)
            return dpm_solver_sample(
                lambda xx, tt, yy2: apply_early(p, xx, tt, yy2),
                k, schedule=schedule, shape=shape,
                dpm_steps=args.dpm_steps, order=args.dpm_order,
                parametrization=args.parametrization
                if args.parametrization != "predict_previous"
                else "predict_noise",
                y=yy, x_init=xi, cache=cache,
            )

        x = jax.jit(sample)(params, key, y, x_init)
        return x, []

    def run_ddpm(key, y):
        """DDPM / DuoDiff via chunked scans (bounded compile time; one
        compiled chunk-step scan reused across segments). Segments split at
        the DuoDiff handoff t = steps - t_switch (reference sampler.py:135)
        and at each intermediate-save point (sampler.py:138). With
        --cache_every, the late (full) model's segment runs block-cached —
        that segment is where the compute goes (the shallow model is cheap
        and stays dense); its entry step anchors, the delta rides the scan
        carry."""
        early_sampler = ChunkedDDPMSampler(
            apply_early, schedule, parametrization=args.parametrization,
            params=params,
        )
        late_sampler = None
        late_init_state = None
        if late is not None and args.t_switch is not None:
            if cache_on:
                from duodiff_tpu.diffusion import make_block_cached_apply

                late_model = late[0]
                lcfg = late_model.config
                lk_half = lcfg.depth // 2
                l_outer = (
                    args.cache_outer
                    if args.cache_outer is not None
                    else max(1, -(-lk_half // 3))
                )
                if not 1 <= l_outer <= lk_half:
                    raise SystemExit(
                        f"--cache_outer must be in [1, {lk_half}] for the "
                        f"late model's depth {lcfg.depth}, got {l_outer}"
                    )
                late_entry = steps - args.t_switch - 1  # first late step

                def apply_late_cached(p, state, x, t, yy):
                    inner = make_block_cached_apply(
                        lambda xx, tt, yy2: late_model.apply(
                            {"params": p}, xx, tt, yy2, n_outer=l_outer,
                            method=late_model.forward_anchor,
                        ),
                        lambda xx, tt, yy2, d: late_model.apply(
                            {"params": p}, xx, tt, yy2, n_outer=l_outer,
                            delta=d, method=late_model.forward_cached,
                        ),
                        cache_rule, late_entry,
                    )
                    return inner(state, x, t, yy)

                l_tokens = lcfg.extras + lcfg.num_patches

                def late_init_state(x):
                    return jnp.zeros(
                        (x.shape[0], l_tokens, lcfg.embed_dim),
                        late_model.dtype,
                    )

                late_sampler = ChunkedDDPMSampler(
                    apply_late_cached, schedule,
                    parametrization=args.parametrization,
                    params=late[1], init_state_fn=late_init_state,
                )
            else:
                late_sampler = ChunkedDDPMSampler(
                    apply_late, schedule,
                    parametrization=args.parametrization,
                    params=late[1],
                )
        handoff = steps - args.t_switch if late_sampler is not None else None

        # boundaries: after the update at t we may save (elapsed = steps - t;
        # valid elapsed values are 1..steps, reference sampler.py:138)
        save_ts = sorted(
            {steps - s for s in timesteps_save if 1 <= s <= steps},
            reverse=True,
        )
        boundaries = sorted(set(save_ts + ([handoff] if handoff else [])),
                            reverse=True)

        x, key = early_sampler.init(key, shape, sharding=batch_shard)
        sampler = early_sampler
        seg_state = None  # block-cache delta of the cached late segment

        def seg_run(x, key, t_hi, t_lo):
            nonlocal seg_state
            if sampler is late_sampler and late_init_state is not None:
                if seg_state is None:  # segment entry (anchors at t_hi)
                    seg_state = late_init_state(x)
                x, key, seg_state = sampler.run(
                    x, key, t_hi, t_lo, y, state=seg_state
                )
                return x, key
            return sampler.run(x, key, t_hi, t_lo, y)

        t_hi = steps - 1
        snapshots = {}
        for b in boundaries:
            x, key = seg_run(x, key, t_hi, b)
            if b in save_ts:
                snapshots[b] = x
            if handoff is not None and b == handoff:
                sampler = late_sampler
            t_hi = b - 1
        if t_hi >= 0:
            x, key = seg_run(x, key, t_hi, 0)
        # ordered like --timesteps_save: the dump zips the two directly
        inter = [
            snapshots[steps - s]
            for s in timesteps_save
            if steps - s in snapshots
        ]
        return x, inter

    def run_pipeline(key, y):
        """DuoDiff over two disjoint device submeshes (shallow on A, full
        on B), micro-batched so stage 1 of micro-batch i overlaps stage 2
        of micro-batch i-1 (duodiff_tpu.diffusion.pipeline)."""
        from duodiff_tpu.diffusion import DuoDiffPipeline

        mb = args.pipeline_microbatch or max(1, args.batch_size // 4)
        if args.batch_size % mb:
            raise SystemExit(
                f"--batch_size {args.batch_size} must be a multiple of "
                f"--pipeline_microbatch {mb}"
            )
        n_micro = args.batch_size // mb
        pipe = DuoDiffPipeline(
            apply_early, params, apply_late, late[1], schedule,
            t_switch=args.t_switch, parametrization=args.parametrization,
        )
        keys = list(jax.random.split(key, n_micro))
        ys = (
            [y[i * mb : (i + 1) * mb] for i in range(n_micro)]
            if y is not None else None
        )
        outs = pipe.sample(keys, (mb,) + shape[1:], ys)
        return jnp.concatenate(outs, axis=0), []

    def run_block_cached(key, y):
        """Block caching (Delta-DiT/DeepCache family, training-free): the
        middle depth-2*n_outer blocks recompute only on anchor steps
        (t %% cache_every == 0, plus the first reverse step); between
        anchors their cached token-space residual delta substitutes, so a
        cached step costs ~2*n_outer/depth of the block FLOPs
        (UViT.forward_anchor / forward_cached; long-skip pairing makes the
        centered region self-contained)."""
        from duodiff_tpu.diffusion import make_block_cached_apply

        n_outer = cache_n_outer(cfg)

        def apply_fn(p, state, x, t, yy):
            anchor, cached, _ = cache_fns(p, n_outer)
            inner = make_block_cached_apply(
                anchor, cached, cache_rule, steps - 1
            )
            return inner(state, x, t, yy)

        init_state = cache_fns(params, n_outer)[2]

        sampler = ChunkedDDPMSampler(
            apply_fn, schedule, parametrization=args.parametrization,
            params=params, init_state_fn=init_state,
        )
        x = sampler.sample(key, shape, y=y, sharding=batch_shard)
        return x, []

    def run_interleaved(key, y):
        """Heavy-light interleaving: full model on t % N == 0, shallow
        elsewhere (make_interleaved_apply) — both weight trees threaded
        through one chunked scan."""
        from duodiff_tpu.diffusion import make_interleaved_apply

        apply = make_interleaved_apply(
            apply_late, apply_early, args.interleave_every
        )
        sampler = ChunkedDDPMSampler(
            apply, schedule, parametrization=args.parametrization,
            params={"full": late[1], "shallow": params},
        )
        x = sampler.sample(key, shape, y=y, sharding=batch_shard)
        return x, []

    if args.pipeline_parallel:
        if late is None or args.t_switch is None:
            raise SystemExit("--pipeline_parallel needs the DuoDiff pair "
                             "(--config_path_late/--checkpoint_path_late "
                             "and --t_switch)")
        if mp > 1:
            raise SystemExit("--pipeline_parallel does not combine with "
                             "--model_parallel")
        if args.use_ddim or args.use_dpm_solver or timesteps_save:
            raise SystemExit("--pipeline_parallel supports plain DDPM "
                             "sampling (no DDIM/DPM/--timesteps_save)")
    if args.interleave_every is not None:
        if late is None:
            raise SystemExit("--interleave_every needs the model pair "
                             "(--config_path_late/--checkpoint_path_late)")
        if (args.t_switch is not None or args.use_ddim
                or args.use_dpm_solver or args.pipeline_parallel
                or timesteps_save):
            raise SystemExit("--interleave_every supports plain DDPM "
                             "sampling (no --t_switch/DDIM/DPM/pipeline/"
                             "--timesteps_save)")
    if cache_on:
        if args.cache_every is not None and args.cache_every < 1:
            raise SystemExit("--cache_every must be >= 1")
        if (args.use_ddim or args.pipeline_parallel
                or args.interleave_every is not None or timesteps_save
                or args.guidance_scale is not None):
            raise SystemExit("--cache_every/--cache_schedule supports "
                             "plain DDPM or DPM-Solver sampling (single "
                             "model, or the DuoDiff pair with --t_switch — "
                             "the full model's segment runs cached; no "
                             "DDIM/pipeline/--interleave_every/"
                             "--timesteps_save/--guidance_scale)")
        if args.use_dpm_solver and args.cache_schedule is not None:
            raise SystemExit("--cache_schedule is t-indexed; the solver's "
                             "anchors are transition-indexed — use "
                             "--cache_every with --use_dpm_solver")
        if args.use_dpm_solver and late is not None:
            raise SystemExit("--cache_every with --use_dpm_solver supports "
                             "the single-model solver only")
        if late is not None and args.t_switch is None:
            raise SystemExit("--cache_every/--cache_schedule with a late "
                             "model needs --t_switch (the cached segment "
                             "starts at the DuoDiff handoff)")
    elif args.cache_outer is not None:
        raise SystemExit("--cache_outer requires --cache_every or "
                         "--cache_schedule")

    print(f"Sampling {args.batch_size} images on {jax.devices()[0].platform}...")
    tic = time.time()
    if cache_on and late is None and not args.use_dpm_solver:
        x, intermediates = run_block_cached(key, y)
    elif args.interleave_every is not None:
        x, intermediates = run_interleaved(key, y)
    elif args.pipeline_parallel:
        x, intermediates = run_pipeline(key, y)
    elif args.use_dpm_solver:
        if args.parametrization == "predict_previous":
            raise SystemExit(
                "--use_dpm_solver supports predict_noise/predict_original"
            )
        x, intermediates = run_dpm(key, y)
    elif args.use_ddim:
        x, intermediates = run_ddim(key, y)
    else:
        x, intermediates = run_ddpm(key, y)
    x = jax.block_until_ready(x)
    elapsed = time.time() - tic

    def finish(z):
        if decode_fn is not None:
            z = decode_fn(z)
        return np.asarray((z + 1.0) / 2.0)

    samples = finish(x)
    with open(output_folder / "statistics.txt", "w") as f:
        f.write(f"Elapsed time: {elapsed} s\n")
    save_samples(samples, output_folder)

    for ts, inter in zip(args.timesteps_save, intermediates):
        save_samples(finish(inter), output_folder, timestep=ts)

    print(f"Elapsed time: {elapsed:.2f} s -> {output_folder}")


if __name__ == "__main__":
    main()

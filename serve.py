"""Production serving endpoint for trained diffusion models.

TPU-native serving design: requests are padded onto a FIXED batch bucket so
exactly ONE executable is compiled (XLA static shapes — a new batch size
would trigger a multi-minute remote compile mid-request), the executable is
warmed at startup (and lands in the persistent compile cache), weights are
threaded as traced jit arguments (weight-free executable, cache-friendly),
and a single worker thread owns the device while stdlib HTTP threads queue
requests. Defaults to DPM-Solver++ 2M 20-step sampling — measured 37.9 ms
single-image latency for the CelebA-64 flagship on one v5e chip
(README "Measured performance").

``--slots N`` switches to MIXED-TIMESTEP CONTINUOUS BATCHING (the diffusion
analogue of LLM in-flight batching): one compiled step executable over N
slots where each slot carries its own timestep, so concurrent requests
share every device step instead of serializing whole trajectories, and new
requests join free slots between dispatches. Per-request outputs are
bit-identical to the bucket-1 sequential path for the same seed (tested).
See duodiff_tpu/diffusion/continuous.py.

The reference has no serving story (its samplers are batch CLIs,
sampler.py:192-252); this is a beyond-parity component.

    python serve.py --config_path configs/uvit_celeba.yaml \
        --checkpoint_path <ckpt> --port 8861 [--method dpm|ddpm|ddim]

    curl -s localhost:8861/healthz
    curl -s -X POST localhost:8861/sample -d '{"n": 2, "seed": 7}' \
        | python -c 'import json,sys,base64; \
            [open(f"s{i}.png","wb").write(base64.b64decode(im)) \
             for i, im in enumerate(json.load(sys.stdin)["images"])]'
"""

import argparse
import base64
import collections
import concurrent.futures
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--checkpoint_path", type=str, default=None)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8861)
    p.add_argument("--method", type=str, default="dpm",
                   choices=["dpm", "ddpm", "ddim"])
    p.add_argument("--steps", type=int, default=None,
                   help="model calls per image (default: 20 dpm / "
                        "num_timesteps ddpm / 50 ddim)")
    p.add_argument("--num_timesteps", type=int, default=1000)
    p.add_argument("--bucket", type=int, default=1,
                   help="compiled batch size; requests are padded/chunked "
                        "onto it (one executable, no mid-request compiles)")
    p.add_argument("--parametrization", type=str, default="predict_noise")
    p.add_argument("--guidance_scale", type=float, default=None,
                   help="classifier-free guidance weight (needs a "
                        "class-conditional model trained with "
                        "--label_dropout; requests must pass class_id)")
    p.add_argument("--null_class", type=int, default=None,
                   help="null-label index for guidance "
                        "(default num_classes-1)")
    p.add_argument("--attn_impl", type=str, default=None,
                   choices=["auto", "xla", "pallas", "fused", "fused_int8"])
    p.add_argument("--gelu_approx", action="store_true")
    p.add_argument("--use_ema", action="store_true",
                   help="serve the EMA shadow params from an "
                        "--ema_decay-trained checkpoint")
    p.add_argument("--int8_scales", type=str, default=None,
                   help="tools/calibrate_int8.py JSON: static MLP "
                        "activation scales for --attn_impl fused_int8")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="tensor-parallel degree for bucket/continuous "
                        "serving: shard attention heads / MLP hidden over "
                        "the mesh 'model' axis (sampler.py's TP; heads "
                        "qkv layout, converted on load). Remaining "
                        "devices form the 'data' axis the bucket/slot "
                        "batch shards over")
    p.add_argument("--warmup", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--slots", type=int, default=0,
                   help="enable mixed-timestep continuous batching with "
                        "this many slots (0 = fixed-bucket serving); "
                        "concurrent requests then share device steps")
    p.add_argument("--steps_per_poll", type=int, default=5,
                   help="continuous mode: device steps per host poll — "
                        "amortizes the host round-trip; finished slots "
                        "wait at most this many extra steps")
    p.add_argument("--cache_every", type=int, default=None,
                   help="training-free block caching (sampler.py's "
                        "--cache_every): recompute the centered blocks "
                        "only on anchor steps. dpm/ddpm methods; in "
                        "continuous mode admissions are phase-aligned so "
                        "the whole slot batch anchors together")
    p.add_argument("--cache_outer", type=int, default=None,
                   help="blocks per side recomputed every step under "
                        "--cache_every (default ceil(depth/2 / 3))")
    p.add_argument("--cache_schedule", type=str, default=None,
                   help="drift-derived anchor-table JSON "
                        "(tools/derive_cache_schedule.py) in place of the "
                        "uniform --cache_every period (ddpm). In --slots "
                        "mode the table must fold to a periodic wave "
                        "pattern (mixed-timestep slots need a slot-uniform "
                        "anchor decision; aperiodic tables are rejected "
                        "with the structural reason)")
    p.add_argument("--cache_pattern", type=str, default=None,
                   help="periodic anchor pattern like '1,0,0,1,0' (1 = "
                        "anchor): the slots-mode form of a non-uniform "
                        "anchor schedule (ddpm; pattern[0] must be 1). In "
                        "fixed-bucket mode it is expanded to the "
                        "equivalent absolute-t table")
    p.add_argument("--static_schedule", type=str, default=None,
                   help="serve the static-exit family: timestep-bucketed "
                        "truncated backbones from an EarlyExitUViT "
                        "checkpoint (eesampler.py --static_schedule "
                        "format, e.g. '999-700:3,699-0:13'). ddpm "
                        "fixed-bucket mode; composes with --cache_every/"
                        "--cache_schedule/--attn_impl fused_int8 — the "
                        "best measured CelebA-64 operating points")
    return p.parse_args(argv)


class _ServiceBase:
    """Model loading, guidance wrapping, method/steps resolution, and
    request validation shared by the two serving modes."""

    def __init__(self, args):
        from duodiff_tpu.utils.runtime import setup_compilation_cache

        setup_compilation_cache()

        import jax
        import jax.numpy as jnp

        from duodiff_tpu.diffusion import NoiseSchedule
        from duodiff_tpu.utils.model_loading import load_model_from_config

        self.jax, self.jnp = jax, jnp
        if not args.random_init and args.checkpoint_path is None:
            raise SystemExit(
                "--checkpoint_path is required (or pass --random_init)"
            )
        self.static_buckets = None
        if getattr(args, "static_schedule", None):
            if args.method != "ddpm":
                raise SystemExit(
                    "--static_schedule serves the ddpm static-exit family "
                    f"(got --method {args.method})"
                )
            if args.slots:
                raise SystemExit(
                    "--static_schedule is fixed-bucket only: each bucket "
                    "is a different truncated executable, and mixed-"
                    "timestep slots would need per-slot depths (SPMD "
                    "computes both branches — zero savings)"
                )
            if args.parametrization != "predict_noise":
                raise SystemExit(
                    "static-exit serving is predict_noise only (the "
                    "output heads are trained under it)"
                )
            from duodiff_tpu.diffusion.static_exit import (
                parse_exit_schedule,
            )

            self.static_buckets = parse_exit_schedule(args.static_schedule)

        # Multi-chip serving (sampler.py's sampling parallelism behind the
        # server): --model_parallel N shards heads/hidden over the mesh
        # "model" axis (Megatron heads layout; TP x fused shard_map kernels
        # when --attn_impl fused) and the bucket/slot batch shards over
        # "data"; without TP, a divisible bucket/slot batch still shards
        # over all devices. Values are sharding-independent (noise drawn
        # first, then placed) — multi-chip serving is bit-identical to
        # single-chip for the same request (tested on the CPU mesh).
        mp = max(1, getattr(args, "model_parallel", 1) or 1)
        self._mp = mp
        batch_n = args.slots if args.slots else args.bucket
        qkv_layout = "heads" if mp > 1 else "packed"
        serve_mesh = None
        tp_mesh = None
        if mp > 1:
            if self.static_buckets is not None:
                raise SystemExit(
                    "--model_parallel does not compose with "
                    "--static_schedule yet (each truncated bucket would "
                    "need its own head-sharded executable); serve "
                    "static-exit single-chip or shard the batch only"
                )
            from duodiff_tpu.parallel import sampling_mesh

            serve_mesh = sampling_mesh(mp, batch_n)
            if args.attn_impl == "fused":
                # TP x fused needs the mesh at module-build time
                tp_mesh = serve_mesh
        model, params, cfg, ae_cfg = load_model_from_config(
            args.config_path,
            None if args.random_init else args.checkpoint_path,
            early_exit=self.static_buckets is not None,
            attn_impl=args.attn_impl,
            gelu_approx=args.gelu_approx,
            qkv_layout=qkv_layout,
            use_ema=args.use_ema,
            int8_scales=args.int8_scales,
            tp_mesh=tp_mesh,
        )
        self.batch_shard = None
        self.serve_mesh = None
        if self.static_buckets is None:
            from duodiff_tpu.parallel import setup_sampling_sharding
            from duodiff_tpu.parallel.mesh import create_mesh

            self.batch_shard, (params,) = setup_sampling_sharding(
                mp, batch_n, [params], mesh=serve_mesh
            )
            self.serve_mesh = serve_mesh
            if mp == 1 and self.batch_shard is not None:
                self.serve_mesh = create_mesh()
        # else: the truncated-bucket static-exit sampler has no sharding
        # path — keep placement single-chip and report it honestly in
        # /healthz rather than advertising a mesh serving never uses
        self.model = model
        self.params = params
        self.cfg = cfg
        self.args = args
        self.requests_served = 0

        self.decode_fn = None
        if ae_cfg is not None:
            from duodiff_tpu.models.autoencoder import load_autoencoder

            ae_model, ae_params = load_autoencoder(
                ae_cfg.autoencoder_checkpoint_path, config=ae_cfg
            )
            self.decode_fn = jax.jit(
                lambda z: ae_model.apply(
                    {"params": ae_params}, z, method=ae_model.decode
                )
            )

        self.schedule = NoiseSchedule.create(steps=args.num_timesteps)

        def apply_fn(p, x, t, y):
            return model.apply({"params": p}, x, t, y)

        self.guidance_null = None
        if args.guidance_scale is not None:
            null_class = (
                args.null_class if args.null_class is not None
                else cfg.num_classes - 1
            )
            if null_class < 1:
                raise SystemExit(
                    "--guidance_scale needs a class-conditional model with "
                    f"a reserved null slot (num_classes={cfg.num_classes})"
                )
            from duodiff_tpu.diffusion.sampling import make_guided_apply

            self.guidance_null = null_class
            # params-first signatures pass through the wrapper untouched;
            # static-exit serving guides per truncated bucket instead
            # (make_static_exit_sampler(guidance=...))
            if self.static_buckets is None:
                apply_fn = make_guided_apply(
                    apply_fn, args.guidance_scale, null_class
                )
        self.apply_fn = apply_fn

        method = args.method
        if method == "dpm" and args.parametrization == "predict_previous":
            raise SystemExit("dpm supports predict_noise/predict_original")
        if method == "ddim" and args.parametrization != "predict_noise":
            raise SystemExit("ddim serving supports predict_noise only")
        if method == "dpm":
            steps = args.steps or 20
        elif method == "ddim":
            steps = args.steps or 50
        else:  # ddpm
            if args.steps is not None and args.steps != args.num_timesteps:
                raise SystemExit(
                    "ddpm runs the full reverse process "
                    f"(--num_timesteps={args.num_timesteps}); --steps only "
                    "applies to dpm/ddim — for fewer ddpm steps shorten "
                    "--num_timesteps (and retrain: the beta range is "
                    "schedule-length dependent)"
                )
            steps = args.num_timesteps
        self.steps = steps
        self.method = method

        # training-free block caching (see sampler.py run_block_cached /
        # dpm_solver_sample's cache contract): params-first anchor/cached
        # closures over the loaded model, shared by both serving modes
        self.cache = None
        self.cache_rule = None
        n_cache_args = sum(
            a is not None for a in (args.cache_every, args.cache_schedule,
                                    getattr(args, "cache_pattern", None))
        )
        if n_cache_args > 1:
            raise SystemExit(
                "pass ONE of --cache_every / --cache_schedule / "
                "--cache_pattern"
            )
        if args.cache_pattern is not None:
            import numpy as np

            from duodiff_tpu.diffusion.continuous import (
                periodic_pattern_table,
            )

            if method != "ddpm":
                raise SystemExit(
                    "--cache_pattern is t-indexed ddpm caching (dpm "
                    "anchors on its own grid indices: use --cache_every)"
                )
            try:
                pattern = np.asarray(
                    [int(v) for v in args.cache_pattern.split(",")], bool
                )
            except ValueError:
                raise SystemExit(
                    f"--cache_pattern {args.cache_pattern!r}: expected a "
                    "comma list of 0/1"
                ) from None
            if pattern.size < 1 or not pattern[0]:
                raise SystemExit(
                    "--cache_pattern[0] must be 1 (a fresh trajectory's "
                    "first step needs a real delta)"
                )
            # slots mode consumes the wave-index pattern natively; the
            # fixed bucket runs the equivalent absolute-t table
            args_rule = (
                pattern if args.slots
                else jnp.asarray(
                    periodic_pattern_table(pattern, self.schedule.steps)
                )
            )
        elif args.cache_schedule is not None:
            from duodiff_tpu.diffusion import load_cache_schedule

            if method != "ddpm":
                raise SystemExit(
                    "--cache_schedule is a t-indexed ddpm anchor table "
                    "(dpm anchors on grid indices: use --cache_every)"
                )
            table = load_cache_schedule(
                args.cache_schedule, num_timesteps=self.schedule.steps
            )
            if args.slots:
                from duodiff_tpu.diffusion.continuous import (
                    fold_table_to_pattern,
                )

                pattern = fold_table_to_pattern(table)
                if pattern is None:
                    raise SystemExit(
                        "--cache_schedule table is aperiodic (or its "
                        "t=T-1 entry is not an anchor): mixed-timestep "
                        "slots need a slot-uniform anchor decision, so "
                        "only wave-periodic schedules can ride continuous "
                        "batching (an arbitrary t-keyed table would make "
                        "slots at different t disagree, and a per-slot "
                        "branch under SPMD computes both paths — zero "
                        "savings). Serve this table in fixed-bucket mode "
                        "(--slots 0), or pass a periodic --cache_pattern"
                    )
                args_rule = pattern
            else:
                args_rule = jnp.asarray(table)
        else:
            args_rule = args.cache_every
        if args_rule is not None:
            if args.cache_every is not None and args.cache_every < 1:
                raise SystemExit("--cache_every must be >= 1")
            if method not in ("dpm", "ddpm"):
                raise SystemExit(
                    "--cache_every serving supports dpm/ddpm methods"
                )
            if args.guidance_scale is not None:
                raise SystemExit(
                    "--cache_every does not compose with --guidance_scale"
                )
            k_half = cfg.depth // 2
            n_outer = (
                args.cache_outer if args.cache_outer is not None
                else max(1, -(-k_half // 3))
            )
            if not 1 <= n_outer <= k_half:
                raise SystemExit(
                    f"--cache_outer must be in [1, {k_half}] for depth "
                    f"{cfg.depth}, got {n_outer}"
                )
            token_len = cfg.extras + cfg.num_patches
            self.cache_rule = args_rule
            if self.static_buckets is not None:
                # static-exit serving threads the rule into each bucket's
                # truncated backbone (make_static_exit_sampler) instead of
                # the whole-model anchor/cached closures below
                return

            def cache_anchor(p, x, t, y):
                return model.apply(
                    {"params": p}, x, t, y, n_outer=n_outer,
                    method=model.forward_anchor,
                )

            def cache_cached(p, x, t, y, d):
                return model.apply(
                    {"params": p}, x, t, y, n_outer=n_outer, delta=d,
                    method=model.forward_cached,
                )

            def cache_init(x):
                return jnp.zeros(
                    (x.shape[0], token_len, cfg.embed_dim), model.dtype
                )

            self.cache = (cache_anchor, cache_cached, args_rule, cache_init)
        elif args.cache_outer is not None:
            raise SystemExit("--cache_outer requires --cache_every")

    def _resolve_labels(self, seed, class_id, count):
        """Validate class_id and return a (count,) int32 label array, or
        None for unconditional models. Identical semantics in both serving
        modes — the random-label draw is keyed only by the request seed, so
        bucket-1 and continuous serving produce the same labels."""
        jnp = self.jnp
        if self.guidance_null is not None and class_id is None:
            raise ValueError("guided server: requests must pass class_id")
        if class_id is not None and self.cfg.num_classes <= 0:
            raise ValueError("model is unconditional; class_id invalid")
        if self.cfg.num_classes <= 0:
            return None
        hi = (self.guidance_null if self.guidance_null is not None
              else self.cfg.num_classes)
        if class_id is not None:
            if not 0 <= int(class_id) < hi:
                raise ValueError(f"class_id must be in [0, {hi})")
            return jnp.full((count,), int(class_id), jnp.int32)
        # conditional model, no class requested: draw random labels so y is
        # ALWAYS an array — a None<->array flip would change the jit
        # signature and trigger a mid-request compile. The draw covers
        # every real class; the top slot is excluded only when the user
        # declared it reserved via --null_class (a guided server requires
        # class_id and never gets here). Drawn on the CPU backend: threefry
        # is platform-deterministic (same values), and a device-side draw
        # would cost a synchronous accelerator round-trip per request on
        # remote-dispatch backends.
        top = (self.args.null_class
               if self.args.null_class is not None else hi)
        with self.jax.default_device(self.jax.devices("cpu")[0]):
            return self.jax.random.randint(
                self.jax.random.PRNGKey(seed ^ 0x5EED),
                (count,), 0, max(top, 1),
            )

    def warmup(self):
        tic = time.time()
        self.sample(
            n=1, seed=0,
            class_id=0 if self.guidance_null is not None else None,
        )
        return time.time() - tic

    def info(self):
        return {
            "status": "ok",
            "backend": self.jax.default_backend(),
            "devices": self.jax.device_count(),
            "mesh": (dict(self.serve_mesh.shape)
                     if self.serve_mesh is not None else None),
            "model_parallel": self._mp,
            "method": self.method,
            "steps": self.steps,
            "img_size": self.cfg.img_size,
            "num_classes": self.cfg.num_classes,
            "latent": self.decode_fn is not None,
            "guidance_scale": self.args.guidance_scale,
            "requests_served": self.requests_served,
        }

    def close(self):
        pass


class SamplerService(_ServiceBase):
    """Fixed-bucket serving: one compiled bucket-sized sampler + a lock.
    Requests are padded/chunked onto the bucket and run whole trajectories
    back to back."""

    def __init__(self, args):
        super().__init__(args)
        jax = self.jax
        cfg, params, schedule, apply_fn = (
            self.cfg, self.params, self.schedule, self.apply_fn
        )
        self.bucket = args.bucket
        self.shape = (args.bucket, cfg.img_size, cfg.img_size, cfg.in_chans)
        self.lock = threading.Lock()

        from duodiff_tpu.diffusion import (
            ChunkedDDPMSampler,
            ddim_sample,
            dpm_solver_sample,
        )

        if self.static_buckets is not None:
            # static-exit serving: per-bucket truncated executables behind
            # the bucket server (the best measured CelebA-64 operating
            # points — static exits + derived anchors + int8). The sampler
            # callable owns its jitted per-bucket chunks; rebuild-per-call
            # would re-trace (see make_static_exit_sampler docstring).
            from duodiff_tpu.diffusion.static_exit import (
                make_static_exit_sampler,
            )

            guidance = (
                (args.guidance_scale, self.guidance_null)
                if args.guidance_scale is not None else None
            )
            static_sampler = make_static_exit_sampler(
                cfg, params, schedule=schedule,
                buckets=self.static_buckets,
                dtype=self.model.dtype,
                attn_impl=self.model.attn_impl,
                gelu_approx=args.gelu_approx,
                guidance=guidance,
                cache_every=self.cache_rule,
                cache_outer=args.cache_outer,
            )
            # NOTE: params are closure-bound inside make_static_exit_sampler
            # (the `p` argument is unused here) — re-placing/swapping
            # self.params would not reach this path; rebuild the sampler
            # instead if that pattern is ever needed.
            self._run = lambda p, k, y: static_sampler(k, self.shape, y=y)
            return

        cache = self.cache

        def sharded_x_init(k):
            """Pre-draw x_T exactly as dpm/ddim would internally (their
            first key split), then commit it to the batch sharding —
            multi-chip runs stay bit-identical to single-chip."""
            if self.batch_shard is None:
                return None
            init_key = jax.random.split(k)[1]
            import jax.numpy as jnp

            return jax.device_put(
                jax.random.normal(init_key, self.shape, jnp.float32),
                self.batch_shard,
            )

        if self.method == "dpm":
            def run_dpm(p, k, y, xi):
                c = None
                if cache is not None:
                    c = (lambda xx, tt, yy: cache[0](p, xx, tt, yy),
                         lambda xx, tt, yy, d: cache[1](p, xx, tt, yy, d),
                         cache[2], cache[3])
                return dpm_solver_sample(
                    lambda xx, tt, yy: apply_fn(p, xx, tt, yy), k,
                    schedule=schedule, shape=self.shape,
                    dpm_steps=self.steps,
                    parametrization=args.parametrization, y=y, cache=c,
                    x_init=xi,
                )

            jit_dpm = jax.jit(run_dpm)
            self._run = lambda p, k, y: jit_dpm(p, k, y, sharded_x_init(k))
        elif self.method == "ddim":
            # ddim_sample is predict_noise-form (reference sampler.py:103-126)
            jit_ddim = jax.jit(lambda p, k, y, xi: ddim_sample(
                lambda xx, tt, yy: apply_fn(p, xx, tt, yy), k,
                schedule=schedule, shape=self.shape, ddim_steps=self.steps,
                eta=0.0, y=y, x_init=xi,
            )[0])
            self._run = lambda p, k, y: jit_ddim(p, k, y, sharded_x_init(k))
        else:  # ddpm
            if cache is not None:
                from duodiff_tpu.diffusion import make_block_cached_apply

                def cached_apply(p, state, x, t, y):
                    inner = make_block_cached_apply(
                        lambda xx, tt, yy: cache[0](p, xx, tt, yy),
                        lambda xx, tt, yy, d: cache[1](p, xx, tt, yy, d),
                        cache[2], schedule.steps - 1,
                    )
                    return inner(state, x, t, y)

                sampler = ChunkedDDPMSampler(
                    cached_apply, schedule,
                    parametrization=args.parametrization, params=params,
                    init_state_fn=cache[3],
                )
            else:
                sampler = ChunkedDDPMSampler(
                    apply_fn, schedule,
                    parametrization=args.parametrization, params=params,
                )
            # params already threaded at construction; sample returns x
            self._run = lambda p, k, y: sampler.sample(
                k, self.shape, y=y, sharding=self.batch_shard
            )

    def sample(self, n=1, seed=None, class_id=None):
        jax = self.jax
        if seed is None:
            seed = int(time.time_ns()) % (2**31)
        y_val = self._resolve_labels(seed, class_id, self.bucket)
        imgs = []
        with self.lock:
            done = 0
            while done < n:
                key = jax.random.fold_in(jax.random.PRNGKey(seed), done)
                x = jax.block_until_ready(self._run(self.params, key, y_val))
                if self.decode_fn is not None:
                    x = jax.block_until_ready(self.decode_fn(x))
                import numpy as np

                batch = np.asarray((x + 1.0) / 2.0)
                take = min(self.bucket, n - done)
                imgs.extend(batch[:take])
                done += take
            self.requests_served += 1
        return imgs

    def info(self):
        return {**super().info(), "mode": "bucket", "bucket": self.bucket}


class ContinuousSamplerService(_ServiceBase):
    """Mixed-timestep continuous batching: a device-loop thread advances
    all in-flight requests one shared compiled step at a time; HTTP threads
    enqueue jobs and wait on futures. Outputs are bit-identical to the
    bucket-1 path for the same (seed, n) request (tested)."""

    def __init__(self, args):
        super().__init__(args)
        from duodiff_tpu.diffusion.continuous import (
            ContinuousDiffusionBatcher,
        )

        cfg = self.cfg
        self.slots = args.slots
        self.batcher = ContinuousDiffusionBatcher(
            self.apply_fn, self.schedule,
            img_shape=(cfg.img_size, cfg.img_size, cfg.in_chans),
            slots=args.slots, params=self.params, method=self.method,
            parametrization=args.parametrization,
            ddim_steps=self.steps, dpm_steps=self.steps,
            steps_per_poll=args.steps_per_poll,
            conditional=cfg.num_classes > 0,
            mesh=self.serve_mesh,
            cache=self.cache,
        )
        self._cv = threading.Condition()
        self._queue = collections.deque()  # (key, y_scalar, future)
        self._slot_jobs = {}  # slot -> future (device-loop thread only)
        self._stopped = False
        self._thread = threading.Thread(target=self._device_loop, daemon=True)
        self._thread.start()

    def _device_loop(self):
        """The only thread that touches the batcher. One iteration = admit
        free slots from the queue, advance steps_per_poll device steps,
        deliver finished slots. Slot progress is mirrored host-side
        (deterministic), so advance() dispatches pipeline on the device
        with no per-iteration round-trip. The one blocking transfer — the
        finished-image fetch — is DEFERRED one iteration: begin_finish()
        starts it async and frees the slots, the next iteration re-admits
        and dispatches its advance, and only then does materialize() block,
        so the ~tens-of-ms host copy rides under device compute instead of
        idling the chip between advances."""
        batcher = self.batcher
        deferred = None  # (futures, materialize) from last iteration
        try:
            while True:
                with self._cv:
                    while (not self._stopped and not self._queue
                           and not self._slot_jobs and deferred is None):
                        self._cv.wait()
                    if self._stopped:
                        if deferred is not None:
                            for fut, img in zip(deferred[0], deferred[1]()):
                                fut.set_result(img)
                            deferred = None
                        # fail (never silently abandon) queued requests and
                        # mid-trajectory slots: their waiters get a
                        # RuntimeError, which the HTTP handler maps to 503
                        err = RuntimeError("server is shutting down")
                        for _, _, fut in self._queue:
                            fut.set_exception(err)
                        self._queue.clear()
                        for fut in self._slot_jobs.values():
                            fut.set_exception(err)
                        self._slot_jobs.clear()
                        return
                    wave = {}
                    # cached batcher: admissions only on phase-aligned
                    # waves (every in-flight slot must share the anchor
                    # phase); held requests wait at most every-1 waves
                    if batcher.can_admit_cached():
                        for slot in batcher.free_slots():
                            if not self._queue:
                                break
                            key, y, fut = self._queue.popleft()
                            wave[slot] = (key, y)
                            self._slot_jobs[slot] = fut
                    batcher.admit_many(wave)
                    # queued-but-unadmitted requests (no free slot, or
                    # phase-blocked admission) need the advance below to
                    # make progress — without it a phase-blocked idle
                    # batcher would spin forever at the same phase
                    queued = bool(self._queue)
                if self._slot_jobs or queued:
                    batcher.advance()
                if deferred is not None:
                    for fut, img in zip(deferred[0], deferred[1]()):
                        fut.set_result(img)
                    deferred = None
                done = batcher.finished()
                if done:
                    futs = [self._slot_jobs.pop(slot) for slot in done]
                    deferred = (futs, batcher.begin_finish(done))
        except BaseException as e:  # noqa: BLE001 — sole device thread:
            # an escaped error (backend OOM, compile failure, ...) must
            # fail every waiter, or they block in fut.result() for an hour
            with self._cv:
                self._stopped = True
                waiters = [f for _, _, f in self._queue]
                waiters += list(self._slot_jobs.values())
                if deferred is not None:
                    waiters += list(deferred[0])
                self._queue.clear()
                self._slot_jobs.clear()
                for fut in waiters:
                    if not fut.done():
                        fut.set_exception(e)
            raise

    def sample(self, n=1, seed=None, class_id=None):
        import numpy as np

        if seed is None:
            seed = int(time.time_ns()) % (2**31)
        y_val = self._resolve_labels(seed, class_id, 1)
        y_scalar = None if y_val is None else int(y_val[0])
        jax = self.jax
        # per-image keys computed on the CPU backend: same threefry values
        # as the bucket-1 path's device-side fold_in, but admit_many's
        # np.asarray(key) stays a local copy instead of a ~30ms synchronous
        # accelerator fetch PER JOB on remote-dispatch backends (measured —
        # it capped throughput before batched admission)
        with jax.default_device(jax.devices("cpu")[0]):
            keys = [
                np.asarray(jax.random.fold_in(jax.random.PRNGKey(seed), j))
                for j in range(n)
            ]
        futures = []
        with self._cv:
            if self._stopped:
                raise ValueError("server is shutting down")
            for key in keys:
                # same per-image key stream as the bucket-1 sequential path
                fut = concurrent.futures.Future()
                self._queue.append((key, y_scalar, fut))
                futures.append(fut)
            self._cv.notify()
        imgs = []
        for fut in futures:
            x = fut.result(timeout=3600)[None]  # (1, H, W, C)
            if self.decode_fn is not None:
                x = jax.block_until_ready(self.decode_fn(jax.numpy.asarray(x)))
            imgs.append(np.asarray((x + 1.0) / 2.0)[0])
        with self._cv:  # many HTTP threads run sample() concurrently
            self.requests_served += 1
        return imgs

    def info(self):
        return {
            **super().info(),
            "mode": "continuous",
            "slots": self.slots,
            "steps_per_poll": self.args.steps_per_poll,
            "in_flight": len(self._slot_jobs) + len(self._queue),
        }

    def close(self):
        with self._cv:
            self._stopped = True
            self._cv.notify_all()
        self._thread.join(timeout=60)


def _png_b64(img) -> str:
    import numpy as np
    from PIL import Image

    arr = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def make_handler(service: SamplerService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet by default
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, service.info())
            else:
                self._json(200, {
                    "usage": "POST /sample {n, seed, class_id} ; GET /healthz"
                })

        def do_POST(self):
            if self.path != "/sample":
                self._json(404, {"error": "unknown endpoint"})
                return
            try:
                length = int(self.headers.get("Content-Length") or 0)
                req = json.loads(self.rfile.read(length) or b"{}")
                if not isinstance(req, dict):
                    raise ValueError("request body must be a JSON object")
                n = int(req.get("n", 1))
                if not 1 <= n <= 64:
                    raise ValueError("n must be in [1, 64]")
                seed = req.get("seed")
                class_id = req.get("class_id")
                tic = time.time()
                imgs = service.sample(
                    n=n,
                    seed=None if seed is None else int(seed),
                    class_id=None if class_id is None else int(class_id),
                )
                elapsed_ms = (time.time() - tic) * 1e3
                self._json(200, {
                    "images": [_png_b64(im) for im in imgs],
                    "elapsed_ms": round(elapsed_ms, 2),
                    "method": service.method,
                    "steps": service.steps,
                })
            except (ValueError, KeyError, TypeError,
                    json.JSONDecodeError) as e:
                self._json(400, {"error": str(e)})
            except RuntimeError as e:
                # device-loop failure or shutdown propagated through the
                # request future: tell the client instead of dropping the
                # connection
                self._json(503, {"error": str(e)})

    return Handler


def main(argv=None, *, ready_event=None, server_box=None):
    args = get_args(argv)
    if args.slots > 0:
        service = ContinuousSamplerService(args)
        mode = f"{args.slots}-slot continuous"
    else:
        service = SamplerService(args)
        mode = f"bucket-{args.bucket}"
    if args.warmup:
        dt = service.warmup()
        print(f"warmup: compiled + first {service.method}-{service.steps} "
              f"{mode} sample in {dt:.1f}s")
    httpd = ThreadingHTTPServer(
        (args.host, args.port), make_handler(service)
    )
    if server_box is not None:
        server_box.append((httpd, service))
    print(f"serving on http://{args.host}:{httpd.server_address[1]} "
          f"({service.info()})")
    if ready_event is not None:
        ready_event.set()
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
        service.close()


if __name__ == "__main__":
    main()

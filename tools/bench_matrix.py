"""Sampling-throughput matrix across the reference's operating points.

Measures per-image generation time on the real chip for every method x
dataset combination BASELINE.md publishes (FID, time) pairs for — dense
DDPM, DuoDiff t_switch, DDIM, and bucketed static-exit — with random-init
weights (wall time is weight-independent). Writes JSON and prints a
markdown table for the README.

Usage: python tools/bench_matrix.py [--rows celeba,cifar10,...] [--batch 128]
       [--output bench_matrix.json]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def time_sampler(fn, key, reps=1):
    import jax

    jax.block_until_ready(fn(key))  # compile + warm
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--rows", type=str, default=(
        "celeba,celeba_int8,celeba_duodiff,celeba_duodiff_int8,"
        "celeba_duodiff_cache3,celeba_duodiff_cache3_int8,"
        "celeba_duodiff_cache_derived_int8,"
        "celeba_interleave2,celeba_cache3,imagenet64_cache3,"
        "celeba_cache3_int8,celeba_cache_derived_int8,celeba_ddim,"
        "celeba_static_exit,celeba_static_exit_int8,"
        "celeba_static_exit_cache3,celeba_static_exit_cache3_int8,"
        "celeba_static_exit_cache_derived_int8,"
        "celeba_ee_threshold,celeba_dpm20,celeba_dpm20_int8,"
        "celeba_dpm20_cache3,cifar10,cifar10_int8,cifar10_cache3,"
        "imagenet64,imagenet256,"
        "imagenet256_decoded,imagenet256_int8,imagenet64_int8,"
        "imagenet64_cache3_int8,imagenet64_cache_derived_int8,"
        "imagenet256_cache3_int8,imagenet256_cache_derived_int8"
    ))
    p.add_argument("--output", type=str, default="bench_matrix.json")
    args = p.parse_args(argv)

    from duodiff_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")

    from duodiff_tpu.diffusion import ChunkedDDPMSampler, NoiseSchedule, ddim_sample
    from duodiff_tpu.utils.model_loading import load_model_from_config

    schedule = NoiseSchedule.create(steps=args.steps)
    b = args.batch

    # Params ride through the samplers' opaque ``y`` bundle as traced
    # ARGUMENTS — closing over them bakes the weights into the MLIR as
    # constants, and the remote-compile endpoint rejects >~200MB modules
    # (HTTP 413 on the 131M-param imagenet64 model).
    def load(cfg_path, seed=0, attn_impl=None):
        model, params, cfg, _ = load_model_from_config(
            f"configs/{cfg_path}", None, seed=seed, gelu_approx=True,
            attn_impl=attn_impl,
        )

        def apply_fn(x, t, bundle):
            labels, p = bundle
            return model.apply({"params": p}, x, t, labels)

        return apply_fn, params, cfg

    def dense_fn(cfg_name, attn_impl=None):
        apply_fn, params, cfg = load(cfg_name, attn_impl=attn_impl)
        sampler = ChunkedDDPMSampler(
            apply_fn, schedule, parametrization="predict_noise"
        )
        shape = (b, cfg.img_size, cfg.img_size, cfg.in_chans)
        y = None
        if cfg.num_classes > 0:
            y = jax.random.randint(jax.random.PRNGKey(7), (b,), 0,
                                   cfg.num_classes)
        return lambda key: sampler.sample(key, shape, y=(y, params))

    rows = {}

    # derived-schedule rows need their on-chip-derived asset; skip (with a
    # note) instead of crashing a default-row run on a machine without it.
    # The DuoDiff row prefers the composition-aware late-segment derivation
    # (derive_cache_schedule --t_switch mode) over the transferred
    # dense-trajectory table when that asset has been committed.
    _duo_asset = "assets/cache_schedule_celeba_duodiff.json"
    if not Path(_duo_asset).exists():
        _duo_asset = "assets/cache_schedule_celeba_flagship.json"
    _SCHED_ASSETS = {
        "celeba_cache_derived_int8":
            "assets/cache_schedule_celeba_flagship.json",
        "celeba_duodiff_cache_derived_int8": _duo_asset,
        "celeba_static_exit_cache_derived_int8":
            "assets/cache_schedule_celeba_flagship.json",
        "imagenet64_cache_derived_int8":
            "assets/cache_schedule_imagenet64.json",
        "imagenet256_cache_derived_int8":
            "assets/cache_schedule_imagenet256.json",
    }

    def run(name, fn_builder):
        if name not in args.rows.split(","):
            return
        asset = _SCHED_ASSETS.get(name)
        if asset and not Path(asset).exists():
            print(f"--- {name}: SKIPPED (missing {asset}; derive it with "
                  "tools/derive_cache_schedule.py + probe_cache_gamma.py)",
                  file=sys.stderr)
            return
        print(f"--- {name} (batch {b}, {args.steps} steps)", file=sys.stderr)
        dt = time_sampler(fn_builder(), jax.random.PRNGKey(0))
        rows[name] = {
            "s_per_image": round(dt / b, 5),
            "samples_per_sec_chip": round(b / dt, 3),
        }
        print(f"{name}: {dt/b*1e3:.2f} ms/image "
              f"({b/dt:.2f} samples/s)", file=sys.stderr)

    run("celeba", lambda: dense_fn("uvit_celeba.yaml"))
    # W8A8 int8 weight matmuls (opt-in --attn_impl fused_int8; see
    # ops/pallas_block_int8.py) — value-changing, quality measured in
    # trajectory_parity.json + the trained-model quality matrix
    run("celeba_int8",
        lambda: dense_fn("uvit_celeba.yaml", attn_impl="fused_int8"))
    run("cifar10", lambda: dense_fn("uvit_cifar10.yaml"))
    run("cifar10_int8",
        lambda: dense_fn("uvit_cifar10.yaml", attn_impl="fused_int8"))
    run("imagenet64", lambda: dense_fn("uvit_imagenet64.yaml"))
    run("imagenet256", lambda: dense_fn("uvit_imagenet256.yaml"))
    # int8 at D=1024: the weight matmuls are an even larger step fraction
    # (94% of device time, NOTES trace attribution), so W8A8 pays off more
    run("imagenet256_int8",
        lambda: dense_fn("uvit_imagenet256.yaml", attn_impl="fused_int8"))
    run("imagenet64_int8",
        lambda: dense_fn("uvit_imagenet64.yaml", attn_impl="fused_int8"))

    def imagenet256_decoded_fn():
        # latent sampling + the frozen-KL decode to 256x256 pixels (the
        # reference timings include the decode; random-init weights — the
        # decode cost is weight-independent)
        import jax.numpy as jnp

        from duodiff_tpu.models.autoencoder import init_autoencoder

        sample_latents = dense_fn("uvit_imagenet256.yaml")
        ae, ae_params = init_autoencoder(dtype=jnp.bfloat16)

        decode = jax.jit(lambda p, z: ae.apply(
            {"params": p}, z, method=ae.decode
        ))

        def sample(key):
            z = sample_latents(key)
            return decode(ae_params, z)

        return sample

    run("imagenet256_decoded", imagenet256_decoded_fn)

    def duodiff_fn(attn_impl=None):
        early_apply, early_params, cfg = load(
            "uvit_celeba_3.yaml", attn_impl=attn_impl
        )
        late_apply, late_params, _ = load(
            "uvit_celeba.yaml", seed=1, attn_impl=attn_impl
        )
        early = ChunkedDDPMSampler(early_apply, schedule,
                                   parametrization="predict_noise")
        late = ChunkedDDPMSampler(late_apply, schedule,
                                  parametrization="predict_noise")
        shape = (b, 64, 64, 3)
        t_switch = 300  # shallow steps (duodiff_sample convention)
        handoff = args.steps - t_switch

        def sample(key):
            x, key = early.init(key, shape)
            x, key = early.run(x, key, schedule.steps - 1, handoff,
                               (None, early_params))
            x, _ = late.run(x, key, handoff - 1, 0, (None, late_params))
            return x

        return sample

    run("celeba_duodiff", duodiff_fn)
    # knob composition: DuoDiff's shallow/full handoff with int8 weight
    # matmuls in both models
    run("celeba_duodiff_int8", lambda: duodiff_fn(attn_impl="fused_int8"))

    def interleave_fn():
        # heavy-light alternation (full on t % 2 == 0): both weight trees
        # threaded through one chunked scan; see make_interleaved_apply
        from duodiff_tpu.diffusion import make_interleaved_apply

        m_s, p_s, _, _ = load_model_from_config(
            "configs/uvit_celeba_3.yaml", None, seed=0, gelu_approx=True
        )
        m_f, p_f, _, _ = load_model_from_config(
            "configs/uvit_celeba.yaml", None, seed=1, gelu_approx=True
        )
        apply = make_interleaved_apply(
            lambda p, x, t, y: m_f.apply({"params": p}, x, t, y),
            lambda p, x, t, y: m_s.apply({"params": p}, x, t, y),
            every=2,
        )
        sampler = ChunkedDDPMSampler(
            apply, schedule, parametrization="predict_noise",
            params={"full": p_f, "shallow": p_s},
        )
        shape = (b, 64, 64, 3)
        return lambda key: sampler.sample(key, shape)

    run("celeba_interleave2", interleave_fn)

    def duodiff_cache_fn(every=3, attn_impl=None, sched_path=None):
        # DuoDiff with the late (full) model's segment block-cached
        # (sampler.py --t_switch + --cache_every, or --cache_schedule when
        # sched_path names a derived anchor table) — the shallow segment is
        # cheap and stays dense
        import jax.numpy as jnp

        from duodiff_tpu.diffusion import make_block_cached_apply

        rule = every
        if sched_path is not None:
            from duodiff_tpu.diffusion import load_cache_schedule

            rule = jnp.asarray(
                load_cache_schedule(sched_path, num_timesteps=args.steps))
        early_apply, early_params, _ = load(
            "uvit_celeba_3.yaml", attn_impl=attn_impl
        )
        model, late_params, lcfg, _ = load_model_from_config(
            "configs/uvit_celeba.yaml", None, seed=1, gelu_approx=True,
            attn_impl=attn_impl,
        )
        n_outer = max(1, -(-(lcfg.depth // 2) // 3))
        t_switch = 300
        handoff = args.steps - t_switch

        def late_apply(p, state, x, t, y):
            inner = make_block_cached_apply(
                lambda xx, tt, yy: model.apply(
                    {"params": p}, xx, tt, yy, n_outer=n_outer,
                    method=model.forward_anchor,
                ),
                lambda xx, tt, yy, d: model.apply(
                    {"params": p}, xx, tt, yy, n_outer=n_outer, delta=d,
                    method=model.forward_cached,
                ),
                rule, handoff - 1,
            )
            return inner(state, x, t, y)

        token_len = lcfg.extras + lcfg.num_patches

        def init_state(x):
            return jnp.zeros(
                (x.shape[0], token_len, lcfg.embed_dim), model.dtype
            )

        early = ChunkedDDPMSampler(early_apply, schedule,
                                   parametrization="predict_noise")
        late_s = ChunkedDDPMSampler(
            late_apply, schedule, parametrization="predict_noise",
            params=late_params, init_state_fn=init_state,
        )
        shape = (b, 64, 64, 3)

        def sample(key):
            x, key = early.init(key, shape)
            x, key = early.run(x, key, schedule.steps - 1, handoff,
                               (None, early_params))
            x, _, _ = late_s.run(x, key, handoff - 1, 0, None,
                                 state=init_state(x))
            return x

        return sample

    run("celeba_duodiff_cache3", duodiff_cache_fn)
    run("celeba_duodiff_cache3_int8",
        lambda: duodiff_cache_fn(attn_impl="fused_int8"))
    run("celeba_duodiff_cache_derived_int8",
        lambda: duodiff_cache_fn(
            attn_impl="fused_int8", sched_path=_duo_asset))

    def cache_fn(cfg_name, every=3, attn_impl=None, sched_path=None):
        # training-free block caching (Delta-DiT/DeepCache family): middle
        # blocks recompute only on t % every == 0 anchors, their residual
        # delta substitutes in between — single model, no second training
        # run (contrast celeba_interleave2). See make_block_cached_apply.
        import jax.numpy as jnp

        from duodiff_tpu.diffusion import make_block_cached_apply

        rule = every
        if sched_path:
            # drift-derived anchor table (tools/derive_cache_schedule.py)
            from duodiff_tpu.diffusion import load_cache_schedule

            rule = jnp.asarray(
                load_cache_schedule(sched_path, num_timesteps=args.steps))
        model, params, cfg, _ = load_model_from_config(
            f"configs/{cfg_name}", None, seed=0, gelu_approx=True,
            attn_impl=attn_impl,
        )
        k_half = cfg.depth // 2
        n_outer = max(1, -(-k_half // 3))  # sampler.py --cache_outer default

        def apply_fn(p, state, x, t, y):
            inner = make_block_cached_apply(
                lambda xx, tt, yy: model.apply(
                    {"params": p}, xx, tt, yy, n_outer=n_outer,
                    method=model.forward_anchor,
                ),
                lambda xx, tt, yy, d: model.apply(
                    {"params": p}, xx, tt, yy, n_outer=n_outer, delta=d,
                    method=model.forward_cached,
                ),
                rule, args.steps - 1,
            )
            return inner(state, x, t, y)

        token_len = cfg.extras + cfg.num_patches

        def init_state(x):
            return jnp.zeros(
                (x.shape[0], token_len, cfg.embed_dim), model.dtype
            )

        sampler = ChunkedDDPMSampler(
            apply_fn, schedule, parametrization="predict_noise",
            params=params, init_state_fn=init_state,
        )
        shape = (b, cfg.img_size, cfg.img_size, cfg.in_chans)
        y = None
        if cfg.num_classes > 0:
            y = jax.random.randint(jax.random.PRNGKey(7), (b,), 0,
                                   cfg.num_classes)
        return lambda key: sampler.sample(key, shape, y=y)

    run("celeba_cache3", lambda: cache_fn("uvit_celeba.yaml"))
    run("cifar10_cache3", lambda: cache_fn("uvit_cifar10.yaml"))
    run("imagenet64_cache3", lambda: cache_fn("uvit_imagenet64.yaml"))
    # caching composes with the W8A8 kernels (same block modules under
    # forward_anchor/forward_cached): anchors + outer blocks run int8
    run("celeba_cache3_int8",
        lambda: cache_fn("uvit_celeba.yaml", attn_impl="fused_int8"))
    # staler-delta sweep point (quality_matrix cache5 row gates it)
    run("celeba_cache5_int8",
        lambda: cache_fn("uvit_celeba.yaml", every=5,
                         attn_impl="fused_int8"))
    # the big models benefit most: cached steps skip 13 of 17 (imagenet64)
    # / 15 of 21 (imagenet256) blocks
    # bench.py's headline composition: the committed drift-derived anchor
    # schedule (114 anchors at uniform-3's measured PSNR) + int8 W8A8
    run("celeba_cache_derived_int8",
        lambda: cache_fn(
            "uvit_celeba.yaml", attn_impl="fused_int8",
            sched_path="assets/cache_schedule_celeba_flagship.json"))
    run("imagenet64_cache3_int8",
        lambda: cache_fn("uvit_imagenet64.yaml", attn_impl="fused_int8"))
    # imagenet64's derived table beats uniform-3 on BOTH axes (70.0 dB at
    # 208 anchors vs 66.5 at 334, tools/probe_cache_gamma.py)
    run("imagenet64_cache_derived_int8",
        lambda: cache_fn(
            "uvit_imagenet64.yaml", attn_impl="fused_int8",
            sched_path="assets/cache_schedule_imagenet64.json"))
    run("imagenet256_cache3_int8",
        lambda: cache_fn("uvit_imagenet256.yaml", attn_impl="fused_int8"))
    # i256 drift-derived anchors (derive+gate per tools/probe_cache_gamma)
    run("imagenet256_cache_derived_int8",
        lambda: cache_fn(
            "uvit_imagenet256.yaml", attn_impl="fused_int8",
            sched_path="assets/cache_schedule_imagenet256.json"))

    def ddim_fn():
        apply_fn, params, cfg = load("uvit_celeba.yaml")
        shape = (b, 64, 64, 3)
        fn = jax.jit(lambda key, p: ddim_sample(
            apply_fn, key, schedule=schedule, shape=shape, ddim_steps=50,
            eta=0.0, y=(None, p),
        )[0])
        return lambda key: fn(key, params)

    run("celeba_ddim", ddim_fn)

    def dpm_fn(attn_impl=None, cache_every=None):
        from duodiff_tpu.diffusion import dpm_solver_sample

        model, params, cfg, _ = load_model_from_config(
            "configs/uvit_celeba.yaml", None, seed=0, gelu_approx=True,
            attn_impl=attn_impl,
        )
        shape = (b, 64, 64, 3)
        k_half = cfg.depth // 2
        n_outer = max(1, -(-k_half // 3))
        import jax.numpy as jnp

        token_len = cfg.extras + cfg.num_patches

        def run_one(key, p):
            apply = lambda xx, tt, yy: model.apply({"params": p}, xx, tt, yy)
            c = None
            if cache_every is not None:
                # index-anchored dpm caching (the dpm20_cache3 serving row)
                c = (
                    lambda xx, tt, yy: model.apply(
                        {"params": p}, xx, tt, yy, n_outer=n_outer,
                        method=model.forward_anchor,
                    ),
                    lambda xx, tt, yy, d: model.apply(
                        {"params": p}, xx, tt, yy, n_outer=n_outer,
                        delta=d, method=model.forward_cached,
                    ),
                    cache_every,
                    lambda xx: jnp.zeros(
                        (xx.shape[0], token_len, cfg.embed_dim),
                        model.dtype,
                    ),
                )
            return dpm_solver_sample(
                apply, key, schedule=schedule, shape=shape, dpm_steps=20,
                order=2, y=None, cache=c,
            )

        fn = jax.jit(run_one)
        return lambda key: fn(key, params)

    run("celeba_dpm20", dpm_fn)
    # the serving-latency headline composed with int8 / block caching
    run("celeba_dpm20_int8", lambda: dpm_fn(attn_impl="fused_int8"))
    run("celeba_dpm20_cache3", lambda: dpm_fn(cache_every=3))

    def static_exit_fn(attn_impl="fused", cache_every=None, sched_path=None):
        from duodiff_tpu.diffusion.static_exit import make_static_exit_sampler
        from duodiff_tpu.models.early_exit import init_early_exit_uvit
        from duodiff_tpu.config import UViTConfig
        from duodiff_tpu.config import load_config

        raw = load_config("configs/deediff_celeba.yaml")
        cfg = UViTConfig.from_dict(raw["model_params"])
        import jax.numpy as jnp

        if sched_path is not None:
            from duodiff_tpu.diffusion import load_cache_schedule

            cache_every = jnp.asarray(
                load_cache_schedule(sched_path, num_timesteps=args.steps))

        _, params = init_early_exit_uvit(
            cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16,
            attn_impl=attn_impl, gelu_approx=True,
        )
        # the paper's exit-vs-timestep shape: shallow early, deep late
        t = args.steps
        buckets = [
            (t - 1, int(t * 0.7), 3),
            (int(t * 0.7) - 1, int(t * 0.3), 8),
            (int(t * 0.3) - 1, 0, 13),
        ]
        shape = (b, 64, 64, 3)
        sampler = make_static_exit_sampler(
            cfg, params, schedule=schedule, buckets=buckets,
            attn_impl=attn_impl, gelu_approx=True, cache_every=cache_every,
        )
        return lambda key: sampler(key, shape)

    run("celeba_static_exit", static_exit_fn)
    # knob composition: bucketed static exits + int8 weight matmuls
    run("celeba_static_exit_int8",
        lambda: static_exit_fn(attn_impl="fused_int8"))
    # triple composition: static exits + block caching inside each deep
    # bucket (+ int8) — the deepest bucket's cached step runs 4 of 13
    # blocks, the layer-8 bucket's 5 of 8, the layer-3 bucket uncached
    run("celeba_static_exit_cache3",
        lambda: static_exit_fn(cache_every=3))
    run("celeba_static_exit_cache3_int8",
        lambda: static_exit_fn(attn_impl="fused_int8", cache_every=3))
    # quadruple composition: static exits + drift-derived anchor table +
    # int8 — the derived table holds uniform-3's staleness budget at ~1/3
    # the anchors, so the deep buckets anchor far less often
    run("celeba_static_exit_cache_derived_int8",
        lambda: static_exit_fn(
            attn_impl="fused_int8",
            sched_path="assets/cache_schedule_celeba_flagship.json"))

    def ee_threshold_fn():
        # dynamic-threshold AdaDiff parity mode: every layer + every probe/
        # head computed each step, exits SELECTED per sample (reference
        # eesampler.py:62-68 semantics — the reference saves no compute
        # either; static-exit above is the variant with real savings)
        import jax.numpy as jnp

        from duodiff_tpu.config import UViTConfig, load_config
        from duodiff_tpu.diffusion import ChunkedEarlyExitSampler
        from duodiff_tpu.models.early_exit import init_early_exit_uvit

        raw = load_config("configs/deediff_celeba.yaml")
        cfg = UViTConfig.from_dict(raw["model_params"])
        model, params = init_early_exit_uvit(
            cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16,
            attn_impl="fused", gelu_approx=True,
        )

        def apply_fn(x, t, bundle):
            _, p = bundle
            return model.apply({"params": p}, x, t, None)

        sampler = ChunkedEarlyExitSampler(apply_fn, schedule, threshold=0.08)
        shape = (b, 64, 64, 3)
        return lambda key: sampler.sample(key, shape, y=(None, params))[0]

    run("celeba_ee_threshold", ee_threshold_fn)

    out_path = Path(args.output)
    if out_path.exists():
        # --rows subsets MERGE into the existing matrix instead of dropping
        # the unselected rows
        prior = json.loads(out_path.read_text())
        rows = {**prior, **rows}
    out_path.write_text(json.dumps(rows, indent=2))
    print(f"\nwritten {args.output}\n")
    print("| Operating point | ms/image | samples/sec/chip |")
    print("|---|---|---|")
    for name, r in rows.items():
        print(f"| {name} | {r['s_per_image']*1e3:.2f} | "
              f"{r['samples_per_sec_chip']} |")
    return rows


if __name__ == "__main__":
    main()

"""Headline benchmark: U-ViT CelebA-64, 1000-step DDPM sampling throughput.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec/chip", "vs_baseline": N,
   "dense_int8_value": ..., "bf16_value": ...}

Baseline: the reference repo publishes per-image generation times in
demos/scatter_plots.ipynb (BASELINE.md); the CelebA-64 dense-model operating
point is 1.92 s/image on an (unstated, assumed A100-class) GPU
=> 0.5208 samples/sec. vs_baseline is our samples/sec/chip divided by that.

The 1000-step reverse process runs as chunked on-device lax.scans (one
compiled 100-step scan with a dynamic timestep vector, invoked 10x — bounded
compile time on remote-compile TPU backends, bit-identical results) with the
bf16 U-ViT forward using the Pallas VMEM-resident attention kernel.

The TPU headline leg composes the serving knobs that pass the textured
FD-rand quality gate (assets/quality/fd_table_textured.json, round-5
re-scored at n=512 where two fresh draws of the REAL distribution score
fd 47.4 against each other): the DuoDiff shallow/full handoff (reference
sampler.py:135-136) with the late segment block-cached on the committed
composition-aware derived schedule
(assets/cache_schedule_celeba_duodiff.json) and int8 W8A8 kernels with
clip-searched STATIC activation scales
(assets/int8_scales_celeba_flagship.json). Round 4 measured this
composition failing its gate at fd-vs-dense 95.6 with a 3k-step distilled
shallow model and static scales at ~20-21 under raw amax*1.1 calibration;
round 5 retrained the shallow 30k steps (fd 1.38 plain, 1.54 composed on
the default-budget 160-anchor schedule, 2.31 on the shipped 80-anchor
tight schedule whose 11.4% late-segment anchor density matches the
single-model validated rate) and replaced amax with a PSNR-scored
percentile clip search (p99.5: fd 1.72-2.70) — every knob sits far
inside the real distribution's own n=512 sampling noise.
BENCH_DUODIFF=0 restores the single-model cached headline;
BENCH_INT8_SCALES= (empty) restores dynamic activation quantization.
Single-model cached, dense-int8 and bf16 parity-numerics legs are
reported alongside.
Overridables: BENCH_BATCH, BENCH_STEPS, BENCH_CHUNK, BENCH_ATTN(xla|pallas),
BENCH_REPS, BENCH_CACHE_EVERY (uniform block-cache anchor period replacing
the derived schedule; 0 disables caching), BENCH_CACHE_SCHEDULE (a
tools/derive_cache_schedule.py JSON overriding the committed asset; empty
disables the derived table), BENCH_INT8_SCALES (a tools/calibrate_int8.py
JSON — static MLP activation scales, quality-regressing, off by default),
BENCH_DUODIFF (0 disables the asset-gated DuoDiff legs), BENCH_T_SWITCH
(shallow steps; default = the asset's derivation value).
"""

import json
import os
import sys
import time


def main():
    from duodiff_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    # rbg is ~1% faster than threefry for the per-step noise draws and still
    # fully deterministic (a different fixed stream); override with
    # BENCH_RNG=threefry or JAX_DEFAULT_PRNG_IMPL.
    import jax

    if "JAX_DEFAULT_PRNG_IMPL" not in os.environ:
        jax.config.update(
            "jax_default_prng_impl", os.environ.get("BENCH_RNG", "rbg")
        )
    import jax.numpy as jnp

    from duodiff_tpu.config import flagship_config
    from duodiff_tpu.diffusion import NoiseSchedule
    from duodiff_tpu.diffusion.sampling import make_chunked_ddpm_sampler
    from duodiff_tpu.models.uvit import init_uvit

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "1000"))
    chunk = int(os.environ.get("BENCH_CHUNK", "100"))
    on_tpu = jax.default_backend() == "tpu"
    # Default legs on TPU, headline first: int8 + block-cache (the best
    # single-model serving point, both knobs quality-validated in README),
    # dense int8, and the bf16 parity-numerics path. BENCH_ATTN=<impl>
    # measures just that impl (dense); BENCH_CACHE_EVERY tunes/disables
    # the cache leg.
    cache_every = int(os.environ.get("BENCH_CACHE_EVERY", "3"))
    # The headline leg defaults to the committed drift-derived anchor table
    # (tools/derive_cache_schedule.py + tools/probe_cache_gamma.py, measured
    # on-chip at uniform-3's PSNR with ~1/3 the anchors — see the asset's
    # "meta"). BENCH_CACHE_SCHEDULE=<path> overrides; BENCH_CACHE_SCHEDULE=
    # (empty) falls back to the uniform BENCH_CACHE_EVERY period.
    default_sched = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "assets", "cache_schedule_celeba_flagship.json")
    sched_path = os.environ.get(
        "BENCH_CACHE_SCHEDULE",
        default_sched if os.path.exists(default_sched) else "") or None
    if "BENCH_CACHE_EVERY" in os.environ and \
            "BENCH_CACHE_SCHEDULE" not in os.environ:
        sched_path = None  # an explicit uniform period wins over the default
    head_cache = "sched" if sched_path else (cache_every or None)
    # DuoDiff headline: promoted when the composition-aware late-segment
    # schedule asset is committed (it only lands quality-gated: the fd
    # table in README scores the composition on the trained textured
    # benchmark). BENCH_DUODIFF=0 forces the single-model headline.
    duo_sched_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "assets", "cache_schedule_celeba_duodiff.json")
    # an explicit cache override (non-empty BENCH_CACHE_SCHEDULE or any
    # BENCH_CACHE_EVERY) means the user is steering the single-model cache
    # knobs — the DuoDiff composition would silently ignore them
    duo_on = (
        os.environ.get("BENCH_DUODIFF", "1") == "1"
        and os.path.exists(duo_sched_path)
        and not os.environ.get("BENCH_CACHE_SCHEDULE")
        and "BENCH_CACHE_EVERY" not in os.environ
        # an explicit BENCH_ATTN request measures that single-model leg —
        # never silently rerouted to the DuoDiff composition
        and "BENCH_ATTN" not in os.environ
    )
    if "BENCH_ATTN" in os.environ:
        legs = [(os.environ["BENCH_ATTN"],
                 head_cache if ("BENCH_CACHE_EVERY" in os.environ
                                or sched_path) else None)]
    elif on_tpu:
        legs = [("fused_int8", head_cache),
                ("fused_int8", None), ("fused", None)]
        if head_cache is None:
            legs = legs[1:]
        if duo_on:
            legs = [("fused_int8", "duodiff")] + legs
    else:
        legs = [("xla", None)]
    # tanh-approx GELU: below bf16 rounding, saves the VPU-bound erf
    # polynomial (~0.7 ms/block; duodiff_tpu.models.layers.Mlp docstring)
    gelu_approx = os.environ.get("BENCH_GELU", "tanh") == "tanh"

    cfg = flagship_config()
    schedule = NoiseSchedule.create(steps=steps)
    sched_table = None
    if sched_path:
        from duodiff_tpu.diffusion import load_cache_schedule

        sched_table = jnp.asarray(
            load_cache_schedule(sched_path, num_timesteps=steps)
        )
    duo_table = None
    t_switch = None
    if duo_on:
        from duodiff_tpu.diffusion import load_cache_schedule

        table, duo_meta = load_cache_schedule(
            duo_sched_path, num_timesteps=steps, with_meta=True
        )
        duo_table = jnp.asarray(table)
        # the asset's derivation t_switch is the composition it was gated
        # at; BENCH_T_SWITCH overrides (with a warning: the shallow-covered
        # placeholder rows of the table are forced-dense)
        t_switch = int(os.environ.get(
            "BENCH_T_SWITCH", duo_meta.get("t_switch", 300)
        ))
        if not 1 <= t_switch <= steps - 1:
            raise SystemExit(
                f"BENCH_T_SWITCH={t_switch} is out of range: the "
                f"shallow/full handoff needs 1 <= t_switch <= "
                f"steps-1 ({steps - 1}) — a value outside that range "
                "would index the schedule with negative timesteps"
            )
        if t_switch != duo_meta.get("t_switch", t_switch):
            print(
                f"bench: BENCH_T_SWITCH={t_switch} differs from the "
                f"asset's derivation t_switch={duo_meta.get('t_switch')} "
                "— the late segment will consult placeholder anchor rows",
                file=sys.stderr,
            )
    shape = (batch, 64, 64, 3)
    baseline = 1.0 / 1.92  # s/image from BASELINE.md CelebA dense point
    n_chips = jax.device_count()
    n_timed = int(os.environ.get("BENCH_REPS", "2"))

    # static MLP activation scales for the int8 legs (+4.6% over dynamic
    # quantization). Round 4 measured the raw amax*1.1 calibration at
    # fd-vs-dense ~20-21 and demoted static scales to opt-in; the round-5
    # percentile CLIP SEARCH (tools/calibrate_int8.py --mode search,
    # p99.5 winner, +3.9 dB trajectory PSNR over amax) passes the quality
    # gate — fd-vs-dense 1.72 static vs 0.93 dynamic at n=512 where two
    # fresh real draws score 47.4 against each other
    # (assets/quality/fd_table_textured.json) — so the searched committed
    # calibration is the DEFAULT when present. BENCH_INT8_SCALES=<path>
    # overrides; BENCH_INT8_SCALES= (empty) opts out to dynamic
    # quantization.
    scales_tuple = None
    default_scales = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "assets", "int8_scales_celeba_flagship.json")
    scales_path = os.environ.get(
        "BENCH_INT8_SCALES",
        default_scales if os.path.exists(default_scales) else "")
    if scales_path:
        try:
            from duodiff_tpu.utils.int8_calib import (
                load_int8_scales,
                scales_dict_to_tuple,
            )

            scales_tuple = scales_dict_to_tuple(
                load_int8_scales(scales_path), cfg.depth
            )
        except Exception as e:  # noqa: BLE001 - fall back to dynamic quant
            print(f"bench: no static int8 scales ({e!r}); "
                  "using dynamic activation quantization", file=sys.stderr)

    def make_cached_sampler(model, params, rule, t_first):
        """ChunkedDDPMSampler over a block-cached apply (sampler.py
        --cache_every/--cache_schedule semantics): the centered blocks
        recompute on anchor steps, their residual delta rides the scan
        carry in between. Shared by the single-model cache leg and the
        DuoDiff late segment."""
        from duodiff_tpu.diffusion import make_block_cached_apply
        from duodiff_tpu.diffusion.sampling import ChunkedDDPMSampler

        n_outer = max(1, -(-(cfg.depth // 2) // 3))

        def apply(p, state, x, t, y):
            inner = make_block_cached_apply(
                lambda xx, tt, yy: model.apply(
                    {"params": p}, xx, tt, yy, n_outer=n_outer,
                    method=model.forward_anchor,
                ),
                lambda xx, tt, yy, d: model.apply(
                    {"params": p}, xx, tt, yy, n_outer=n_outer, delta=d,
                    method=model.forward_cached,
                ),
                rule, t_first,
            )
            return inner(state, x, t, y)

        token_len = cfg.extras + cfg.num_patches

        def init_state(x):
            return jnp.zeros(
                (x.shape[0], token_len, cfg.embed_dim), jnp.bfloat16
            )

        sampler = ChunkedDDPMSampler(
            apply, schedule, parametrization="predict_noise",
            chunk=chunk, params=params, init_state_fn=init_state,
        )
        return sampler, init_state

    def measure_duodiff(attn):
        """DuoDiff composition (reference sampler.py:135-136 semantics):
        depth-3 shallow model for the first t_switch steps, the full model
        — late segment block-cached on the committed composition-aware
        derived schedule — for the rest. Mirrors
        tools/bench_matrix.py's celeba_duodiff_cache_derived_int8 row."""
        from duodiff_tpu.config import load_model_config
        from duodiff_tpu.diffusion.sampling import ChunkedDDPMSampler

        shallow_cfg, _ = load_model_config(os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "configs", "uvit_celeba_3.yaml"))
        early_model, early_params = init_uvit(
            shallow_cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16,
            attn_impl=attn, gelu_approx=gelu_approx,
        )
        model, params = init_uvit(
            cfg, jax.random.PRNGKey(1), dtype=jnp.bfloat16, attn_impl=attn,
            gelu_approx=gelu_approx,
            int8_mlp_scales=scales_tuple if attn == "fused_int8" else None,
        )
        handoff = steps - t_switch
        early = ChunkedDDPMSampler(
            lambda p, x, t, y: early_model.apply({"params": p}, x, t, y),
            schedule, parametrization="predict_noise", chunk=chunk,
            params=early_params,
        )
        late, init_state = make_cached_sampler(
            model, params, duo_table, handoff - 1
        )

        def sample(key):
            x, key = early.init(key, shape)
            x, key = early.run(x, key, steps - 1, handoff)
            x, _, _ = late.run(x, key, handoff - 1, 0, None,
                               state=init_state(x))
            return x

        print(
            f"bench: {steps}-step DuoDiff (t_switch={t_switch}) in "
            f"{chunk}-step chunks, batch {batch}, attn={attn}, late-cached "
            f"derived schedule, backend {jax.default_backend()}...",
            file=sys.stderr,
        )
        t0 = time.time()
        jax.block_until_ready(sample(jax.random.PRNGKey(0)))
        print(f"bench[{attn},duodiff]: compile+first run "
              f"{time.time() - t0:.1f}s", file=sys.stderr)
        t0 = time.time()
        for i in range(n_timed):
            x = jax.block_until_ready(sample(jax.random.PRNGKey(1 + i)))
        elapsed = (time.time() - t0) / n_timed
        assert bool(jnp.all(jnp.isfinite(x))), "non-finite samples"
        return batch / elapsed / n_chips * steps / 1000.0

    def measure(attn, cache=None):
        if cache == "duodiff":
            return measure_duodiff(attn)
        model, params = init_uvit(
            cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16, attn_impl=attn,
            gelu_approx=gelu_approx,
            int8_mlp_scales=scales_tuple if attn == "fused_int8" else None,
        )
        # params threaded as a traced jit argument (NOT a closure
        # constant): keeps the ~90MB of weights out of the serialized
        # executable, which cuts cold compile and the persistent-cache
        # entry from 385MB to a few MB (see ChunkedDDPMSampler docstring)
        if cache:
            rule = sched_table if cache == "sched" else cache
            sample = make_cached_sampler(model, params, rule,
                                         steps - 1)[0].sample
        else:
            sample = make_chunked_ddpm_sampler(
                lambda p, x, t, y: model.apply({"params": p}, x, t, y),
                schedule,
                parametrization="predict_noise",
                chunk=chunk,
                params=params,
            )
        print(
            f"bench: {steps}-step DDPM in {chunk}-step chunks, "
            f"batch {batch}, attn={attn}, cache_every={cache}, "
            f"backend {jax.default_backend()}...",
            file=sys.stderr,
        )
        t0 = time.time()
        jax.block_until_ready(sample(jax.random.PRNGKey(0), shape))
        print(f"bench[{attn},{cache}]: compile+first run "
              f"{time.time() - t0:.1f}s", file=sys.stderr)
        t0 = time.time()
        for i in range(n_timed):
            x = jax.block_until_ready(
                sample(jax.random.PRNGKey(1 + i), shape)
            )
        elapsed = (time.time() - t0) / n_timed
        assert bool(jnp.all(jnp.isfinite(x))), "non-finite samples"
        sps = batch / elapsed / n_chips
        # normalize to the 1000-step headline when BENCH_STEPS overrides
        return sps * steps / 1000.0

    rates = {legs[0]: measure(*legs[0])}
    for leg in legs[1:]:
        # secondary paths are best-effort: a flaky remote-compile on the
        # non-headline leg must not lose the headline measurement
        try:
            rates[leg] = measure(*leg)
        except Exception as e:  # noqa: BLE001
            print(f"bench{leg}: FAILED ({e!r})", file=sys.stderr)
    head_attn, head_cache0 = legs[0]
    if head_cache0 == "duodiff":
        cache_label = (f", DuoDiff t_switch={t_switch} + late-segment "
                       "derived cache")
    elif head_cache0 == "sched":
        n_anchors = int(jnp.sum(sched_table))
        cache_label = (f", block-cache derived schedule "
                       f"({n_anchors} anchors)")
    elif head_cache0:
        cache_label = f", block-cache every {head_cache0}"
    else:
        cache_label = ""
    label = f"attn={head_attn}" + cache_label
    result = {
        "metric": "samples/sec/chip (U-ViT CelebA-64, 1000-step DDPM, "
                  f"{label})",
        "value": round(rates[legs[0]], 4),
        "unit": "samples/sec/chip",
        "vs_baseline": round(rates[legs[0]] / baseline, 3),
    }
    if (("fused_int8", head_cache) in rates
            and legs[0] == ("fused_int8", "duodiff")
            and head_cache is not None):
        # the single-model cached-int8 point (round-3's headline)
        r = rates[("fused_int8", head_cache)]
        result["single_model_value"] = round(r, 4)
        result["single_model_vs_baseline"] = round(r / baseline, 3)
    if ("fused_int8", None) in rates and legs[0] != ("fused_int8", None):
        # the dense (uncached) int8 serving point
        r = rates[("fused_int8", None)]
        result["dense_int8_value"] = round(r, 4)
        result["dense_int8_vs_baseline"] = round(r / baseline, 3)
    if ("fused", None) in rates and legs[0] != ("fused", None):
        # the bf16 parity-numerics path, for the FID-parity claim
        r = rates[("fused", None)]
        result["bf16_value"] = round(r, 4)
        result["bf16_vs_baseline"] = round(r / baseline, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

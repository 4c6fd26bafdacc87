"""Derive a drift-adaptive block-cache anchor schedule from a measured run.

The uniform ``--cache_every N`` anchors ignore WHERE the cached residual
actually drifts. This tool runs one dense reverse trajectory with the
anchor forward (full model every step), records the per-step delta drift
``d(t) = ||delta_t - delta_{t+1}||_F``, and greedily places anchors so the
accumulated drift between anchors never exceeds a budget:

  - ``--budget_from_every N`` (default 3): budget = the worst accumulated
    drift any cached step already tolerates under the quality-validated
    uniform-N schedule -> equal worst-case staleness, fewer anchors.
  - ``--num_anchors K``: bisect the budget to hit <= K anchors -> the
    best-placed K-anchor schedule (compare against uniform steps/K).

Writes a JSON schedule consumed by ``sampler.py --cache_schedule`` /
``bench.py BENCH_CACHE_SCHEDULE`` (duodiff_tpu.diffusion.cache_schedule),
with the measured drift curve and staleness stats in "meta".

Run on-chip (drift is a property of the model + trajectory; use the same
weights/knobs the schedule will serve):

    python tools/derive_cache_schedule.py --out assets/cache_schedule.json \
        [--config configs/uvit_celeba.yaml] [--checkpoint ckpt] \
        [--budget_from_every 3 | --num_anchors 240]

Composition-aware modes (VERDICT r3 #2: the drift a COMPOSED sampler sees
differs from the dense full-model trajectory the plain mode measures):

- **DuoDiff** (``--t_switch N --shallow_config YAML [--shallow_checkpoint
  C]``): the shallow model runs its segment dense (it is never cached),
  then the full model's drift is measured from the handoff state down —
  anchors are derived over the LATE segment only (early rows are written
  as anchors: that segment is dense by construction), with the budget
  taken from uniform-N staleness on the late segment.
- **Static-exit buckets** (``--static_schedule '999-700:3,...'`` with an
  EarlyExitUViT checkpoint): each bucket's truncated backbone measures its
  own drift, accumulation resets at bucket entries (the composed sampler
  re-anchors there), non-cacheable buckets (exit at/inside the mid block)
  run dense; anchors are derived per bucket under a shared budget = the
  worst bucket-local uniform-N staleness.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=None,
                        help="model YAML (default: the flagship CelebA-64 "
                             "config bench.py uses)")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="Orbax checkpoint dir (default: PRNGKey(seed) "
                             "random init — matches bench.py's model)")
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--chunk", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cache_outer", type=int, default=None)
    parser.add_argument("--budget_from_every", type=int, default=3)
    parser.add_argument("--num_anchors", type=int, default=None,
                        help="override --budget_from_every: bisect the "
                             "budget to <= K anchors")
    parser.add_argument("--attn_impl", type=str, default=None,
                        choices=["auto", "xla", "pallas", "fused"])
    parser.add_argument("--gelu_approx", action="store_true", default=None)
    parser.add_argument("--t_switch", type=int, default=None,
                        help="DuoDiff mode: shallow model (--shallow_"
                             "config) runs t >= steps - t_switch dense; "
                             "drift is measured on the full model's late "
                             "segment only")
    parser.add_argument("--shallow_config", type=str, default=None)
    parser.add_argument("--shallow_checkpoint", type=str, default=None)
    parser.add_argument("--full_seed", type=int, default=None,
                        help="random-init DuoDiff mode: init the FULL "
                             "model from this seed instead of --seed "
                             "(bench.py pairs shallow PRNGKey(0) with "
                             "full PRNGKey(1) — derive on that exact "
                             "pair)")
    parser.add_argument("--label_max", type=int, default=None,
                        help="conditional models: draw the drift-batch "
                             "labels in [0, label_max) instead of the full "
                             "class range (synthetic benchmarks train only "
                             "the first few class embeddings)")
    parser.add_argument("--static_schedule", type=str, default=None,
                        help="static-exit mode: bucket schedule "
                             "'999-700:3,699-300:8,299-0:13' over an "
                             "EarlyExitUViT checkpoint (--config/"
                             "--checkpoint); per-bucket drift with "
                             "bucket-entry anchor resets")
    args = parser.parse_args(argv)
    if (args.t_switch is None) != (args.shallow_config is None):
        raise SystemExit("--t_switch and --shallow_config go together")
    if args.t_switch is not None and args.static_schedule is not None:
        raise SystemExit("--t_switch and --static_schedule are mutually "
                         "exclusive")
    if args.static_schedule is not None and args.config is None:
        raise SystemExit("--static_schedule needs --config (the DeeDiff "
                         "YAML of the EarlyExitUViT checkpoint)")

    from duodiff_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from duodiff_tpu.config import flagship_config
    from duodiff_tpu.diffusion import ChunkedDDPMSampler, NoiseSchedule
    from duodiff_tpu.diffusion.cache_schedule import (
        budget_for_count,
        derive_anchor_table,
        save_cache_schedule,
        segment_staleness,
        uniform_budget,
        uniform_table,
    )

    on_tpu = jax.default_backend() == "tpu"
    attn = args.attn_impl or ("fused" if on_tpu else "xla")
    gelu = bool(args.gelu_approx) if args.gelu_approx is not None else on_tpu

    full_seed = args.seed if args.full_seed is None else args.full_seed
    if args.full_seed is not None and (
            args.checkpoint is not None or args.t_switch is None):
        raise SystemExit("--full_seed is for the random-init DuoDiff mode "
                         "only (no --checkpoint, with --t_switch)")
    if args.config:
        from duodiff_tpu.utils.model_loading import load_model_from_config

        model, params, cfg, _ = load_model_from_config(
            args.config, args.checkpoint,
            early_exit=args.static_schedule is not None,
            seed=full_seed, attn_impl=attn, gelu_approx=gelu,
        )
    else:
        from duodiff_tpu.models.uvit import init_uvit

        cfg = flagship_config()
        model, params = init_uvit(
            cfg, jax.random.PRNGKey(full_seed), dtype=jnp.bfloat16,
            attn_impl=attn, gelu_approx=gelu,
        )

    k_half = cfg.depth // 2
    n_outer = (args.cache_outer if args.cache_outer is not None
               else max(1, -(-k_half // 3)))
    if not 1 <= n_outer <= k_half:
        raise SystemExit(f"--cache_outer must be in [1, {k_half}]")
    y = None
    if cfg.num_classes > 0:
        # class-conditional model: fixed random labels (the same draw
        # tools/bench_matrix.py measures with) — drift is averaged over
        # the batch, so a label mix is what the schedule should see
        hi = cfg.num_classes
        if args.label_max is not None:
            if not 1 <= args.label_max <= cfg.num_classes:
                raise SystemExit(
                    f"--label_max must be in [1, {cfg.num_classes}]"
                )
            hi = args.label_max
        y = jax.random.randint(jax.random.PRNGKey(7), (args.batch,), 0, hi)

    schedule = NoiseSchedule.create(steps=args.steps)
    shape = (args.batch, cfg.img_size, cfg.img_size, cfg.in_chans)
    token_len = cfg.extras + cfg.num_patches

    def make_drift_apply(anchor_apply):
        """Wrap an ``(p, x, t, y) -> (out, delta)`` anchor forward so the
        scan state carries the previous step's delta and the aux rows emit
        the per-step drift directly."""
        def apply_fn(p, prev_delta, x, t, y):
            out, delta = anchor_apply(p, x, t, y)
            d32 = delta.astype(jnp.float32)
            drift_sq = jnp.sum((d32 - prev_delta.astype(jnp.float32)) ** 2)
            norm_sq = jnp.sum(d32 ** 2)
            return (out, (drift_sq, norm_sq)), delta

        return apply_fn

    def zeros_delta(x):
        return jnp.zeros(
            (x.shape[0], token_len, cfg.embed_dim), model.dtype
        )

    def drift_sampler(anchor_apply, p0):
        return ChunkedDDPMSampler(
            make_drift_apply(anchor_apply), schedule,
            parametrization="predict_noise", chunk=args.chunk, params=p0,
            aux_fn=lambda mo: (mo[0], mo[1]), init_state_fn=zeros_delta,
        )

    # drift[t] = ||delta_t - delta_{t+1}||; each cacheable segment's top
    # row is vs a zero init and never consulted (the composed samplers
    # anchor segment entries). Non-cacheable rows stay 0 and are excluded
    # from budget/derivation via `segments`.
    drift = np.zeros((args.steps,), np.float64)
    norm = np.zeros((args.steps,), np.float64)
    segments = []  # (t_hi, t_lo) inclusive, cacheable
    mode_meta = {}
    key = jax.random.PRNGKey(args.seed)

    if args.t_switch is not None:
        # --- DuoDiff mode: dense shallow prefix, full-model drift on the
        # late segment the cache actually serves (sampler.py run_ddpm) ---
        from duodiff_tpu.utils.model_loading import load_model_from_config

        if not 1 <= args.t_switch <= args.steps - 1:
            raise SystemExit(
                f"--t_switch must be in [1, {args.steps - 1}]"
            )
        early_model, early_params, ecfg, _ = load_model_from_config(
            args.shallow_config, args.shallow_checkpoint, seed=args.seed,
            attn_impl=attn, gelu_approx=gelu,
        )
        if (ecfg.img_size, ecfg.in_chans) != (cfg.img_size, cfg.in_chans):
            raise SystemExit("shallow/full image shapes differ")
        handoff = args.steps - args.t_switch
        early_sampler = ChunkedDDPMSampler(
            lambda p, x, t, yy: early_model.apply({"params": p}, x, t, yy),
            schedule, parametrization="predict_noise", chunk=args.chunk,
            params=early_params,
        )
        print(f"measuring DuoDiff late-segment drift: shallow dense "
              f"t={args.steps - 1}..{handoff}, full anchors "
              f"t={handoff - 1}..0, batch {args.batch}, attn={attn}, "
              f"n_outer={n_outer}, backend {jax.default_backend()} ...",
              file=sys.stderr)
        x, key = early_sampler.init(key, shape)
        x, key = early_sampler.run(x, key, args.steps - 1, handoff, y)
        late = drift_sampler(
            lambda p, x, t, yy: model.apply(
                {"params": p}, x, t, yy, n_outer=n_outer,
                method=model.forward_anchor,
            ),
            params,
        )
        x, key, _, (drift_sq, norm_sq) = late.run(
            x, key, handoff - 1, 0, y, state=zeros_delta(x)
        )
        drift[0:handoff] = np.sqrt(np.asarray(drift_sq, np.float64))[::-1]
        norm[0:handoff] = np.sqrt(np.asarray(norm_sq, np.float64))[::-1]
        segments.append((handoff - 1, 0))
        mode_meta = {
            "mode": "duodiff",
            "t_switch": args.t_switch,
            "shallow_config": args.shallow_config,
            "shallow_checkpoint": args.shallow_checkpoint,
            "full_seed": full_seed,
        }
    elif args.static_schedule is not None:
        # --- static-exit mode: per-bucket truncated-backbone drift with
        # bucket-entry resets (eesampler --static_schedule composition) ---
        from duodiff_tpu.diffusion.static_exit import (
            cache_outer_for,
            parse_exit_schedule,
            truncated_ee_apply,
            truncated_ee_apply_cached,
        )

        buckets = parse_exit_schedule(args.static_schedule)
        if buckets[0][0] != args.steps - 1 or buckets[-1][1] != 0:
            raise SystemExit(
                f"--static_schedule must cover t={args.steps - 1}..0"
            )
        print(f"measuring per-bucket drift: {args.static_schedule}, batch "
              f"{args.batch}, attn={attn}, backend "
              f"{jax.default_backend()} ...", file=sys.stderr)
        x = None
        bucket_meta = []
        for t_hi, t_lo, layer in buckets:
            p_outer = cache_outer_for(cfg.depth, layer, args.cache_outer)
            if p_outer is not None:
                anchor_fn, _cached_fn, p0 = truncated_ee_apply_cached(
                    cfg, params, layer, p_outer, dtype=model.dtype,
                    attn_impl=attn, gelu_approx=gelu,
                )
                s = drift_sampler(anchor_fn, p0)
                if x is None:
                    x, key = s.init(key, shape)
                x, key, _, (drift_sq, norm_sq) = s.run(
                    x, key, t_hi, t_lo, y, state=zeros_delta(x)
                )
                drift[t_lo:t_hi + 1] = np.sqrt(
                    np.asarray(drift_sq, np.float64)
                )[::-1]
                norm[t_lo:t_hi + 1] = np.sqrt(
                    np.asarray(norm_sq, np.float64)
                )[::-1]
                segments.append((t_hi, t_lo))
            else:
                dense_fn, p0 = truncated_ee_apply(
                    cfg, params, layer, dtype=model.dtype, attn_impl=attn,
                    gelu_approx=gelu,
                )
                s = ChunkedDDPMSampler(
                    lambda p, xx, tt, yy, fn=dense_fn: fn(p, xx, tt, yy),
                    schedule, parametrization="predict_noise",
                    chunk=args.chunk, params=p0,
                )
                if x is None:
                    x, key = s.init(key, shape)
                x, key = s.run(x, key, t_hi, t_lo, y)
            bucket_meta.append({
                "t_hi": t_hi, "t_lo": t_lo, "layer": layer,
                "n_outer": p_outer,
                "cacheable": p_outer is not None,
            })
        if not segments:
            raise SystemExit(
                "no bucket is cacheable (every exit is at/inside the mid "
                "block) — nothing to derive"
            )
        mode_meta = {
            "mode": "static_exit",
            "static_schedule": args.static_schedule,
            "buckets": bucket_meta,
        }
    else:
        # --- plain mode: dense run, anchor forward every step ---
        s = drift_sampler(
            lambda p, x, t, yy: model.apply(
                {"params": p}, x, t, yy, n_outer=n_outer,
                method=model.forward_anchor,
            ),
            params,
        )
        print(f"measuring drift: {args.steps} steps, batch {args.batch}, "
              f"attn={attn}, n_outer={n_outer}, backend "
              f"{jax.default_backend()} ...", file=sys.stderr)
        _, (drift_sq, norm_sq) = s.sample(key, shape, y=y)
        drift[:] = np.sqrt(np.asarray(drift_sq, np.float64))[::-1]
        norm[:] = np.sqrt(np.asarray(norm_sq, np.float64))[::-1]
        segments.append((args.steps - 1, 0))
        mode_meta = {"mode": "dense"}

    def seg_staleness_max(tab):
        worst, mean_acc, n = 0.0, 0.0, 0
        for hi, lo in segments:
            st = segment_staleness(drift[lo:hi + 1], tab[lo:hi + 1])
            worst = max(worst, float(st.max()))
            mean_acc += float(st.sum())
            n += st.shape[0]
        return worst, mean_acc / max(n, 1)

    def derive_segmented(budget):
        # non-cacheable rows are written as anchors: those steps run dense
        # in the composed sampler, so "anchor" is the faithful table value
        table = np.ones((args.steps,), dtype=bool)
        for hi, lo in segments:
            table[lo:hi + 1] = derive_anchor_table(
                drift[lo:hi + 1], budget, anchor_zero=(lo == 0)
            )
        return table

    in_seg = np.zeros((args.steps,), dtype=bool)
    for hi, lo in segments:
        in_seg[lo:hi + 1] = True

    def seg_anchor_count(tab):
        return int(tab[in_seg].sum())

    if args.num_anchors is not None:
        if mode_meta["mode"] == "dense":
            budget = budget_for_count(drift, args.num_anchors)
        else:  # bisect over the segmented greedy (same monotonicity)
            lo_b, hi_b = 0.0, float(drift.sum()) or 1.0
            for _ in range(60):
                mid = 0.5 * (lo_b + hi_b)
                if seg_anchor_count(derive_segmented(mid)) <= args.num_anchors:
                    hi_b = mid
                else:
                    lo_b = mid
            budget = hi_b
        mode = f"num_anchors<={args.num_anchors}"
    else:
        budget = max(
            uniform_budget(drift[lo:hi + 1], args.budget_from_every)
            for hi, lo in segments
        )
        mode = f"budget_from_every={args.budget_from_every}"
    table = derive_segmented(budget)

    report = {"derived": table, }
    for every in sorted({args.budget_from_every, 3, 5}):
        report[f"uniform_{every}"] = uniform_table(every, args.steps)
    norm_seg = norm[in_seg]
    print(f"\nbudget: {budget:.4f} ({mode}); mean |delta| over cacheable "
          f"t: {norm_seg.mean():.3f}")
    print("| schedule | anchors (cacheable t) | anchor frac | "
          "max staleness | mean staleness |")
    print("|---|---|---|---|---|")
    for name, tab in report.items():
        st_max, st_mean = seg_staleness_max(tab)
        frac = seg_anchor_count(tab) / max(int(in_seg.sum()), 1)
        print(f"| {name} | {seg_anchor_count(tab)} | {frac:.3f} "
              f"| {st_max:.4f} | {st_mean:.4f} |")

    stale_max, stale_mean = seg_staleness_max(table)
    meta = {
        "config": args.config or "flagship (uvit_celeba)",
        "checkpoint": args.checkpoint,
        "seed": args.seed,
        "batch": args.batch,
        "attn_impl": attn,
        "gelu_approx": gelu,
        "n_outer": n_outer,
        "budget": budget,
        "budget_mode": mode,
        "backend": jax.default_backend(),
        "max_staleness": stale_max,
        "mean_staleness": stale_mean,
        "drift": [round(float(v), 5) for v in drift],
        "delta_norm_mean": float(norm_seg.mean()),
        **mode_meta,
    }
    save_cache_schedule(args.out, table, meta)
    print(f"\nwrote {args.out}: {int(table.sum())} anchors total, "
          f"{seg_anchor_count(table)} over cacheable steps "
          f"({seg_anchor_count(table) / max(int(in_seg.sum()), 1):.1%})",
          file=sys.stderr)


if __name__ == "__main__":
    main()

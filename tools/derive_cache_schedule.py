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
    args = parser.parse_args(argv)

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

    if args.config:
        from duodiff_tpu.utils.model_loading import load_model_from_config

        model, params, cfg, _ = load_model_from_config(
            args.config, args.checkpoint, seed=args.seed, attn_impl=attn,
            gelu_approx=gelu,
        )
    else:
        from duodiff_tpu.models.uvit import init_uvit

        cfg = flagship_config()
        model, params = init_uvit(
            cfg, jax.random.PRNGKey(args.seed), dtype=jnp.bfloat16,
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
        y = jax.random.randint(jax.random.PRNGKey(7), (args.batch,), 0,
                               cfg.num_classes)

    schedule = NoiseSchedule.create(steps=args.steps)
    shape = (args.batch, cfg.img_size, cfg.img_size, cfg.in_chans)
    token_len = cfg.extras + cfg.num_patches

    # Dense run with the anchor forward every step; the state carries the
    # previous step's delta so the scan emits the per-step drift directly.
    def apply_fn(p, prev_delta, x, t, y):
        out, delta = model.apply(
            {"params": p}, x, t, y, n_outer=n_outer,
            method=model.forward_anchor,
        )
        d32 = delta.astype(jnp.float32)
        drift_sq = jnp.sum((d32 - prev_delta.astype(jnp.float32)) ** 2)
        norm_sq = jnp.sum(d32 ** 2)
        return (out, (drift_sq, norm_sq)), delta

    sampler = ChunkedDDPMSampler(
        apply_fn, schedule, parametrization="predict_noise",
        chunk=args.chunk, params=params,
        aux_fn=lambda mo: (mo[0], mo[1]),
        init_state_fn=lambda x: jnp.zeros(
            (x.shape[0], token_len, cfg.embed_dim), model.dtype
        ),
    )
    print(f"measuring drift: {args.steps} steps, batch {args.batch}, "
          f"attn={attn}, n_outer={n_outer}, backend "
          f"{jax.default_backend()} ...", file=sys.stderr)
    _, (drift_sq, norm_sq) = sampler.sample(
        jax.random.PRNGKey(args.seed), shape, y=y
    )
    # rows follow ts = steps-1 .. 0; reindex by t. drift[t] for
    # t < steps-1 is ||delta_t - delta_{t+1}||; row 0 (t = steps-1) is vs
    # the zero init and is never consulted (the first step always anchors).
    drift = np.sqrt(np.asarray(drift_sq, np.float64))[::-1]
    norm = np.sqrt(np.asarray(norm_sq, np.float64))[::-1]

    if args.num_anchors is not None:
        budget = budget_for_count(drift, args.num_anchors)
        mode = f"num_anchors<={args.num_anchors}"
    else:
        budget = uniform_budget(drift, args.budget_from_every)
        mode = f"budget_from_every={args.budget_from_every}"
    table = derive_anchor_table(drift, budget)
    stale = segment_staleness(drift, table)

    report = {"derived": table, }
    for every in sorted({args.budget_from_every, 3, 5}):
        report[f"uniform_{every}"] = uniform_table(every, args.steps)
    print(f"\nbudget: {budget:.4f} ({mode}); mean |delta| over t: "
          f"{norm[:-1].mean():.3f}")
    print("| schedule | anchors | anchor frac | max staleness | "
          "mean staleness |")
    print("|---|---|---|---|---|")
    for name, tab in report.items():
        st = segment_staleness(drift, tab)
        print(f"| {name} | {int(tab.sum())} | {tab.mean():.3f} "
              f"| {st.max():.4f} | {st.mean():.4f} |")

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
        "max_staleness": float(stale.max()),
        "mean_staleness": float(stale.mean()),
        "drift": [round(float(v), 5) for v in drift],
        "delta_norm_mean": float(norm[:-1].mean()),
    }
    save_cache_schedule(args.out, table, meta)
    print(f"\nwrote {args.out}: {int(table.sum())} anchors "
          f"({table.mean():.1%} of steps)", file=sys.stderr)


if __name__ == "__main__":
    main()

"""Empirically pick the cache-schedule drift weighting on-chip.

derive_cache_schedule's greedy uses a per-step signal s(t) = drift(t) *
w(t)^gamma, where w(t) is the first-order linear error-to-terminal
amplification of an eps error injected at step t (beta_t / (sqrt(1-abar_t)
sqrt(alpha_t) sqrt(abar_{t-1}))). gamma=0 trusts raw drift (optimal if the
denoiser contracts injected errors — the trained-model regime DeepCache
assumes); gamma=1 trusts the linear model (optimal if the model's Jacobian
is neutral — closer to the random-init regime the parity harness measures).
Neither proxy is exact, so this probe MEASURES the terminal deviation of
each candidate schedule against the dense trajectory.

One compiled executable serves every candidate: the anchor table rides the
jitted chunk as a TRACED boolean operand (threaded inside the params tree),
so N schedules cost N runs, not N compiles.

    python tools/probe_cache_gamma.py --drift_json /tmp/sched.json \
        [--gammas 0,0.25,0.5,1] [--budget_from_every 3] [--batch 128]

Prints a markdown table: anchors / max gap / terminal max-err / PSNR per
candidate (plus uniform-3/5 baselines).
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--drift_json", type=str, required=True,
                    help="a derive_cache_schedule.py output (its meta.drift "
                         "is the measured per-step drift curve)")
    ap.add_argument("--config", type=str, default=None,
                    help="model YAML (default: the flagship CelebA-64 "
                         "config; use the drift_json's model)")
    ap.add_argument("--checkpoint", type=str, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--gammas", type=str, default="0,0.25,0.5,0.75,1")
    ap.add_argument("--budget_from_every", type=int, default=3)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--cache_outer", type=int, default=None)
    ap.add_argument("--ref_every", type=int, default=3,
                    help="the uniform schedule whose measured PSNR gates "
                         "--out (the quality-validated operating point)")
    ap.add_argument("--out", type=str, default=None,
                    help="write the best (fewest anchors among PSNR >= "
                         "uniform-<ref_every>'s) schedule JSON here")
    args = ap.parse_args(argv)

    from duodiff_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from duodiff_tpu.config import flagship_config
    from duodiff_tpu.diffusion import ChunkedDDPMSampler, NoiseSchedule
    from duodiff_tpu.diffusion.cache_schedule import (
        derive_anchor_table,
        save_cache_schedule,
        uniform_budget,
        uniform_table,
    )
    from duodiff_tpu.models.uvit import init_uvit

    meta = json.load(open(args.drift_json))["meta"]
    drift = np.asarray(meta["drift"], np.float64)
    T = args.steps
    assert drift.shape[0] == T, (drift.shape, T)

    # first-order linear amplification of an eps error injected at step t
    sched_np = NoiseSchedule.create(steps=T)
    betas = np.asarray(sched_np.betas, np.float64)
    alphas = 1.0 - betas
    abar = np.cumprod(alphas)
    abar_prev = abar / alphas
    w = betas / np.sqrt(1 - abar) / np.sqrt(alphas) / np.sqrt(abar_prev)

    candidates = {}
    for every in sorted({args.budget_from_every, args.ref_every, 5}):
        candidates[f"uniform_{every}"] = uniform_table(every, T)
    for g in [float(x) for x in args.gammas.split(",")]:
        signal = drift * np.power(w, g)
        budget = uniform_budget(signal, args.budget_from_every)
        candidates[f"gamma_{g:g}"] = derive_anchor_table(signal, budget)

    on_tpu = jax.default_backend() == "tpu"
    attn = "fused" if on_tpu else "xla"
    if args.config:
        from duodiff_tpu.utils.model_loading import load_model_from_config

        model, params, cfg, _ = load_model_from_config(
            args.config, args.checkpoint, seed=args.seed, attn_impl=attn,
            gelu_approx=False,
        )
    else:
        cfg = flagship_config()
        model, params = init_uvit(
            cfg, jax.random.PRNGKey(args.seed), dtype=jnp.bfloat16,
            attn_impl=attn, gelu_approx=False,
        )
    k_half = cfg.depth // 2
    n_outer = (args.cache_outer if args.cache_outer is not None
               else max(1, -(-k_half // 3)))
    token_len = cfg.extras + cfg.num_patches
    schedule = NoiseSchedule.create(steps=T)
    shape = (args.batch, cfg.img_size, cfg.img_size, cfg.in_chans)

    # table rides the params tree -> traced -> one executable for all
    def apply_fn(pt, state, x, t, y):
        p, table = pt["p"], pt["table"]
        t0 = jnp.asarray(t, jnp.int32).reshape(-1)[0]
        use_anchor = table[t0] | (t0 == T - 1)

        def anchor(_s):
            return model.apply(
                {"params": p}, x, t, y, n_outer=n_outer,
                method=model.forward_anchor,
            )

        def cached(s):
            return model.apply(
                {"params": p}, x, t, y, n_outer=n_outer, delta=s,
                method=model.forward_cached,
            ), s

        return jax.lax.cond(use_anchor, anchor, cached, state)

    sampler = ChunkedDDPMSampler(
        apply_fn, schedule, parametrization="predict_noise",
        chunk=args.chunk,
        params={"p": params, "table": jnp.zeros((T,), jnp.bool_)},
        init_state_fn=lambda x: jnp.zeros(
            (x.shape[0], token_len, cfg.embed_dim), model.dtype
        ),
    )
    key = jax.random.PRNGKey(0)
    y = None
    if cfg.num_classes > 0:
        # same fixed label draw as tools/derive_cache_schedule.py
        y = jax.random.randint(jax.random.PRNGKey(7), (args.batch,), 0,
                               cfg.num_classes)

    def run(table):
        sampler.params = {"p": params, "table": jnp.asarray(table)}
        return np.asarray(sampler.sample(key, shape, y=y), np.float64)

    print("dense reference (all-anchor table) ...", file=sys.stderr)
    dense = run(np.ones((T,), bool))

    def psnr(a, b):
        mse = float(np.mean((a - b) ** 2))
        peak = float(b.max() - b.min()) or 2.0
        return 10.0 * np.log10(peak * peak / mse) if mse else float("inf")

    rows = {}
    print("| schedule | anchors | max gap | terminal max-err | PSNR (dB) |")
    print("|---|---|---|---|---|")
    for name, table in candidates.items():
        x = run(table)
        a = np.flatnonzero(table)
        gaps = np.diff(np.sort(np.append(a, T - 1)))
        err = float(np.max(np.abs(x - dense)))
        p = psnr(x, dense)
        rows[name] = {"anchors": int(table.sum()), "max_err": err,
                      "psnr": p, "table": table}
        print(f"| {name} | {int(table.sum())} | {int(gaps.max())} "
              f"| {err:.3e} | {p:.1f} |", flush=True)

    if args.out:
        ref = rows[f"uniform_{args.ref_every}"]["psnr"]
        ok = {n: r for n, r in rows.items()
              if n.startswith("gamma_") and r["psnr"] >= ref}
        if not ok:
            print(f"no gamma candidate reaches uniform-"
                  f"{args.ref_every}'s {ref:.1f} dB; not writing "
                  f"--out", file=sys.stderr)
            return
        best = min(ok.items(), key=lambda kv: kv[1]["anchors"])
        save_cache_schedule(args.out, best[1]["table"], meta={
            **{k: meta[k] for k in ("config", "seed", "attn_impl",
                                    "gelu_approx", "n_outer")
               if k in meta},
            "probe": best[0],
            "psnr_vs_dense": best[1]["psnr"],
            "uniform_ref_psnr": ref,
            "batch": args.batch,
        })
        print(f"wrote {args.out}: {best[0]} "
              f"({best[1]['anchors']} anchors, {best[1]['psnr']:.1f} dB)",
              file=sys.stderr)


if __name__ == "__main__":
    main()

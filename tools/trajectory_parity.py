"""On-chip trajectory parity for every sampling speed knob.

For each performance knob the framework ships, run the FULL reverse
trajectory on the real chip and quantify the deviation it introduces
against the parity baseline — the strongest FID-parity proxy available
without trained weights (VERDICT round 1, next #5). Knobs:

  - attn_impl: fused / pallas vs xla     (kernel numerics, same RNG stream)
  - gelu: tanh approx vs exact erf       (activation numerics)
  - RNG: rbg vs threefry                 (different stream BY DESIGN —
                                          reported for completeness; the
                                          meaningful check is per-stream
                                          determinism, also asserted)
  - DPM-Solver++ 20 steps vs DDPM-1000   (fast ODE solver vs the full
                                          ancestral baseline, shared
                                          x_init; the DDPM side is
                                          stochastic so this bounds the
                                          whole solver+stochasticity gap)
  - static-exit buckets vs dynamic thr.  (algorithmic early-exit change)

Metrics: max-abs-err at every 100-step chunk boundary (trajectory), plus
terminal max-abs-err and PSNR (peak-to-peak 2.0 in model output space).
Weights are seed-0 random init — kernel/activation deviations are weight-
independent numerics measurements; solver/exit rows measure truncation on
that model's vector field (flagged in the table).

Run on TPU (compiles hit the persistent cache from bench_matrix shapes):

    python tools/trajectory_parity.py [--batch 128] [--steps 1000]

Writes trajectory_parity.json next to this file and prints a markdown
table for the README.
"""

import argparse
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def psnr(a, b) -> float:
    """PSNR with the TRUE peak-to-peak range of the reference side — with
    random-init weights the reverse process is unbounded (no trained
    denoiser contracting toward the data manifold), so a fixed [-1, 1]
    range would misstate agreement by ~50 dB."""
    import numpy as np

    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    peak = float(b.max() - b.min()) or 2.0
    return 10.0 * np.log10(peak * peak / mse)


def max_err(a, b) -> float:
    import numpy as np

    return float(np.max(np.abs(np.asarray(a, np.float64)
                               - np.asarray(b, np.float64))))


def rel_err(a, b) -> float:
    import numpy as np

    denom = float(np.max(np.abs(np.asarray(b, np.float64)))) or 1.0
    return max_err(a, b) / denom


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--chunk", type=int, default=100)
    parser.add_argument("--threshold", type=float, default=0.08)
    parser.add_argument("--smoke", action="store_true",
                        help="CPU smoke mode: xla baseline, no fused/pallas "
                             "kernel rows (they run interpret-mode off-TPU "
                             "and would take hours at flagship shapes)")
    parser.add_argument("--only", type=str, default=None,
                        help="substring filter: run only matching rows and "
                             "MERGE them into the existing json (the dense "
                             "baseline still runs when a dense row matches)")
    parser.add_argument("--cache_schedule", type=str, default=None,
                        help="derived anchor-table JSON "
                             "(tools/derive_cache_schedule.py): adds "
                             "'block-cache derived' rows")
    args = parser.parse_args(argv)

    def selected(name: str) -> bool:
        return args.only is None or args.only.lower() in name.lower()

    from duodiff_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    import jax
    import jax.numpy as jnp

    from duodiff_tpu.config import UViTConfig, flagship_config, load_config
    from duodiff_tpu.diffusion import (
        ChunkedDDPMSampler,
        ChunkedEarlyExitSampler,
        NoiseSchedule,
        dpm_solver_sample,
    )
    from duodiff_tpu.models.uvit import init_uvit

    cfg = flagship_config()
    base_attn = "xla" if args.smoke else "fused"
    ee_attn = "xla" if args.smoke else "fused"
    schedule = NoiseSchedule.create(steps=args.steps)
    shape = (args.batch, 64, 64, 3)
    key = jax.random.PRNGKey(0)
    results = {}
    t_wall = time.time()

    def dense_trajectory(attn, gelu_approx, key_impl=None):
        model, params = init_uvit(
            cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16,
            attn_impl=attn, gelu_approx=gelu_approx,
        )
        sampler = ChunkedDDPMSampler(
            lambda x, t, y: model.apply({"params": params}, x, t, y),
            schedule, parametrization="predict_noise", chunk=args.chunk,
        )
        # typed keys carry their impl through split/normal (bench.py flips
        # the global default instead; same streams)
        k = (jax.random.key(0, impl=key_impl) if key_impl
             else jax.random.PRNGKey(0))
        x, k = sampler.init(k, shape)
        snaps = []
        t_hi = args.steps - 1
        while t_hi >= 0:
            t_lo = max(0, t_hi - args.chunk + 1)
            x, k = sampler.run(x, k, t_hi, t_lo)
            snaps.append(jax.device_get(x))
            t_hi = t_lo - 1
        return snaps

    import numpy as np

    def row(a, b, kind, traj=None):
        return {
            "traj_max_err": traj,
            "terminal_max_err": max_err(a, b),
            "terminal_rel_err": rel_err(a, b),
            "terminal_psnr": psnr(a, b),
            "ref_abs_max": float(np.max(np.abs(np.asarray(b, np.float64)))),
            "kind": kind,
        }

    variant_rows = (
        ("attn xla vs fused", "xla", False, "numerics"),
        ("attn pallas vs fused", "pallas", False, "numerics"),
        ("gelu tanh vs exact (fused)", "fused", True, "numerics"),
        # int8 weight+activation quantization: value-changing BY DESIGN;
        # this row quantifies how far the W8A8 trajectory drifts
        ("attn fused_int8 vs fused", "fused_int8", False, "quantization"),
    ) if not args.smoke else (
        ("gelu tanh vs exact (xla)", "xla", True, "numerics"),
    )
    variant_rows = [r for r in variant_rows if selected(r[0])]
    det_name = f"determinism {base_attn}/threefry (rerun)"
    cache_row_names = ("block-cache every=3 vs dense",
                       "block-cache every=5 vs dense",
                       "block-cache every=3 + int8 vs dense",
                       "block-cache derived vs dense",
                       "block-cache derived + int8 vs dense")
    need_base = (bool(variant_rows) or selected(det_name)
                 or selected("DPM-20") or selected("rng rbg vs threefry")
                 or any(selected(n) for n in cache_row_names))

    base = None
    if need_base:
        print(f"dense baseline: {base_attn} + exact gelu ...", file=sys.stderr)
        base = dense_trajectory(base_attn, False)
    if selected(det_name):
        print("repeat (determinism) ...", file=sys.stderr)
        base2 = dense_trajectory(base_attn, False)
        results[det_name] = row(
            base2[-1], base[-1], "numerics",
            traj=[max_err(a, b) for a, b in zip(base, base2)],
        )

    for name, attn, gelu, kind in variant_rows:
        print(f"{name} ...", file=sys.stderr)
        traj = dense_trajectory(attn, gelu)
        results[name] = row(
            traj[-1], base[-1], kind,
            traj=[max_err(a, b) for a, b in zip(traj, base)],
        )

    if selected("rng rbg vs threefry"):
        print("rbg stream ...", file=sys.stderr)
        rbg = dense_trajectory(base_attn, False, key_impl="rbg")
        rbg2 = dense_trajectory(base_attn, False, key_impl="rbg")
        results["rng rbg vs threefry"] = {
            **row(rbg[-1], base[-1], "stream-change",
                  traj=[max_err(a, b) for a, b in zip(rbg, base)]),
            "rbg_rerun_bitexact": bool(max_err(rbg[-1], rbg2[-1]) == 0.0),
        }

    def cache_trajectory(every, attn, gelu):
        # Same RNG stream and (for attn=base) kernels as the baseline (the
        # stateful scan threads identical keys), so vs base the deviation
        # is PURELY the cached approximation — anchors every N steps,
        # default n_outer.
        from duodiff_tpu.diffusion import make_block_cached_apply

        model, params = init_uvit(
            cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16,
            attn_impl=attn, gelu_approx=gelu,
        )
        k_half = cfg.depth // 2
        n_outer = max(1, -(-k_half // 3))
        cached_apply = make_block_cached_apply(
            lambda x, t, y: model.apply(
                {"params": params}, x, t, y, n_outer=n_outer,
                method=model.forward_anchor,
            ),
            lambda x, t, y, d: model.apply(
                {"params": params}, x, t, y, n_outer=n_outer, delta=d,
                method=model.forward_cached,
            ),
            every, args.steps - 1,
        )
        token_len = cfg.extras + cfg.num_patches
        cache_sampler = ChunkedDDPMSampler(
            cached_apply, schedule, parametrization="predict_noise",
            chunk=args.chunk,
            init_state_fn=lambda x: jnp.zeros(
                (x.shape[0], token_len, cfg.embed_dim), model.dtype
            ),
        )
        k = jax.random.PRNGKey(0)
        x, k = cache_sampler.init(k, shape)
        st = jnp.zeros((shape[0], token_len, cfg.embed_dim), model.dtype)
        snaps = []
        t_hi = args.steps - 1
        while t_hi >= 0:
            t_lo = max(0, t_hi - args.chunk + 1)
            x, k, st = cache_sampler.run(x, k, t_hi, t_lo, state=st)
            snaps.append(jax.device_get(x))
            t_hi = t_lo - 1
        return snaps

    # ---- block caching: stale middle-region delta vs dense ----
    for name, every in ((cache_row_names[0], 3), (cache_row_names[1], 5)):
        if not selected(name):
            continue
        print(f"{name} ...", file=sys.stderr)
        snaps = cache_trajectory(every, base_attn, False)
        results[name] = row(
            snaps[-1], base[-1], "algorithmic",
            traj=[max_err(a, b) for a, b in zip(snaps, base)],
        )
    if selected(cache_row_names[2]) and not args.smoke:
        # the bench.py headline composition (int8 kernels + caching, tanh
        # GELU as served) against the bf16 exact-GELU dense baseline
        print("block-cache every=3 + int8 vs dense ...", file=sys.stderr)
        snaps = cache_trajectory(3, "fused_int8", True)
        results["block-cache every=3 + int8 vs dense"] = row(
            snaps[-1], base[-1], "quantization+algorithmic",
            traj=[max_err(a, b) for a, b in zip(snaps, base)],
        )
    if args.cache_schedule:
        # drift-derived anchor table (tools/derive_cache_schedule.py) in
        # place of the uniform period; same stateful scan
        from duodiff_tpu.diffusion import load_cache_schedule

        table = jnp.asarray(load_cache_schedule(
            args.cache_schedule, num_timesteps=args.steps
        ))
        derived_rows = [(cache_row_names[3], base_attn, False,
                         "algorithmic")]
        if not args.smoke:
            derived_rows.append((cache_row_names[4], "fused_int8", True,
                                 "quantization+algorithmic"))
        for name, attn, gelu, kind in derived_rows:
            if not selected(name):
                continue
            print(f"{name} ...", file=sys.stderr)
            snaps = cache_trajectory(table, attn, gelu)
            results[name] = row(
                snaps[-1], base[-1], kind,
                traj=[max_err(a, b) for a, b in zip(snaps, base)],
            )

    if selected("DPM-20"):
        # ---- solver: DPM-Solver++ 20 vs the DDPM-1000 ancestral baseline ----
        # (the baseline trajectory is already computed; DPM reuses its x_init —
        # the same PRNGKey(0) split ChunkedDDPMSampler.init performed. A
        # DDIM-1000 comparison would need a single un-chunked 1000-step scan,
        # which cold-compiles for tens of minutes on remote-compile backends.)
        print("DPM-20 vs DDPM-1000 ...", file=sys.stderr)
        model, params = init_uvit(
            cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16,
            attn_impl=base_attn, gelu_approx=False,
        )
        apply_fn = lambda x, t, y: model.apply({"params": params}, x, t, y)  # noqa: E731
        k0, kx = jax.random.split(jax.random.PRNGKey(0))
        x_init = jax.random.normal(kx, shape, jnp.float32)
        dpm = jax.device_get(dpm_solver_sample(
            apply_fn, k0, schedule=schedule, shape=shape,
            dpm_steps=20, order=2, x_init=x_init,
        ))
        results["DPM-20 vs DDPM-1000 (shared x_init)"] = row(
            dpm, base[-1], "solver+stochasticity",
        )

    if selected("DPM-20 cached"):
        # ---- block caching composed INTO the solver (sampler.py
        # --use_dpm_solver --cache_every 3): same solver, same x_init — the
        # deviation is purely the stale-delta approximation over the
        # solver's ~50-t-unit transitions (vs ~1 t-unit for the DDPM cache
        # rows). Deterministic: order-2 DPM consumes no per-step noise.
        print("DPM-20 cached every=3 vs DPM-20 dense ...", file=sys.stderr)
        model, params = init_uvit(
            cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16,
            attn_impl=base_attn, gelu_approx=False,
        )
        apply_fn = lambda x, t, y: model.apply({"params": params}, x, t, y)  # noqa: E731
        k0, kx = jax.random.split(jax.random.PRNGKey(0))
        x_init = jax.random.normal(kx, shape, jnp.float32)
        dense_dpm = jax.device_get(dpm_solver_sample(
            apply_fn, k0, schedule=schedule, shape=shape,
            dpm_steps=20, order=2, x_init=x_init,
        ))
        n_outer = max(1, -(-(cfg.depth // 2) // 3))
        token_len = cfg.extras + cfg.num_patches
        cached_dpm = jax.device_get(dpm_solver_sample(
            apply_fn, k0, schedule=schedule, shape=shape,
            dpm_steps=20, order=2, x_init=x_init,
            cache=(
                lambda xx, tt, yy: model.apply(
                    {"params": params}, xx, tt, yy, n_outer=n_outer,
                    method=model.forward_anchor,
                ),
                lambda xx, tt, yy, d: model.apply(
                    {"params": params}, xx, tt, yy, n_outer=n_outer,
                    delta=d, method=model.forward_cached,
                ),
                3,
                lambda xx: jnp.zeros(
                    (xx.shape[0], token_len, cfg.embed_dim), jnp.bfloat16
                ),
            ),
        ))
        results["DPM-20 cached every=3 vs DPM-20 dense"] = row(
            cached_dpm, dense_dpm, "algorithmic",
        )

    if selected("static buckets"):
        # ---- early exit: static buckets vs dynamic threshold ----
        print("static-exit vs dynamic threshold ...", file=sys.stderr)
        from duodiff_tpu.diffusion.static_exit import make_static_exit_sampler
        from duodiff_tpu.models.early_exit import init_early_exit_uvit

        raw = load_config("configs/deediff_celeba.yaml")
        ee_cfg = UViTConfig.from_dict(raw["model_params"])
        ee_model, ee_params = init_early_exit_uvit(
            ee_cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16,
            attn_impl=ee_attn, gelu_approx=True,
        )
        dyn_sampler = ChunkedEarlyExitSampler(
            lambda x, t, y: ee_model.apply({"params": ee_params}, x, t, y),
            schedule, threshold=args.threshold, chunk=args.chunk,
        )
        dyn_x, _, dyn_idx = dyn_sampler.sample(jax.random.PRNGKey(0), shape)
        t = args.steps
        buckets = [
            (t - 1, int(t * 0.7), 3),
            (int(t * 0.7) - 1, int(t * 0.3), 8),
            (int(t * 0.3) - 1, 0, 13),
        ]
        static_sampler = make_static_exit_sampler(
            ee_cfg, ee_params, schedule=schedule, buckets=buckets,
            attn_impl=ee_attn, gelu_approx=True,
        )
        static_x = static_sampler(jax.random.PRNGKey(0), shape)
        results[f"static buckets vs dynamic thr={args.threshold}"] = {
            **row(static_x, dyn_x, "algorithmic"),
            "dynamic_mean_exit": float(np.asarray(dyn_idx).mean()),
        }

    wall = time.time() - t_wall
    out_path = Path(__file__).parent / "trajectory_parity.json"
    rows_out = results
    if args.only is not None and out_path.exists():
        prior = json.loads(out_path.read_text())
        rows_out = {**prior.get("rows", {}), **results}
    out = {
        "batch": args.batch, "steps": args.steps,
        "backend": jax.default_backend(), "wall_s": round(wall, 1),
        "rows": rows_out,
    }
    # RFC 8259 has no Infinity token (psnr() is inf for bit-exact reruns);
    # encode non-finite floats as strings so jq/JSON.parse can read the file
    def _finite(o):
        if isinstance(o, dict):
            return {k: _finite(v) for k, v in o.items()}
        if isinstance(o, list):
            return [_finite(v) for v in o]
        if isinstance(o, float) and not math.isfinite(o):
            return repr(o)  # "inf" / "nan"
        return o

    out_path.write_text(json.dumps(_finite(out), indent=2, allow_nan=False))
    print(f"\nwrote {out_path} ({wall:.0f}s)\n", file=sys.stderr)

    print("| knob | kind | terminal max-abs-err | rel err | PSNR (dB) |")
    print("|---|---|---|---|---|")
    for name, r in rows_out.items():
        p = r["terminal_psnr"]
        ps = f"{p:.1f}" if isinstance(p, float) and math.isfinite(p) else str(p)
        print(f"| {name} | {r['kind']} | {r['terminal_max_err']:.3e} "
              f"| {r['terminal_rel_err']:.3e} | {ps} |")


if __name__ == "__main__":
    main()

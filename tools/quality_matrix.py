"""Quality-vs-speed matrix on a TRAINED checkpoint.

The headline speed knobs (DPM-Solver++ 20-step, DDIM-50, early exit, static
exit, DuoDiff t_switch) each claim near-DDPM quality; this tool MEASURES it.
Given a backbone trained on the convergence-probe palette distribution
(tools/convergence_probe.py — the only trainable distribution available in
an environment with no downloadable datasets or Inception weights), it runs
every requested sampler through the production CLIs on the same checkpoint
and scores the generated distribution: within-image pixel std, mean
distance to the nearest palette mode, and mode coverage. One JSON line per
method + a final combined line.

    python tools/quality_matrix.py \
        --config configs/uvit_cifar10.yaml --checkpoint <backbone> \
        [--ee_config configs/deediff_cifar10.yaml --ee_checkpoint <probes>] \
        [--shallow_config configs/uvit_cifar10_3.yaml \
         --shallow_checkpoint <shallow> --t_switch 300] \
        --palette_k 4 --batch 32 --out /tmp/quality
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from convergence_probe import (  # noqa: E402 (tools/ sibling)
    PALETTES,
    TEXTURE_PALETTE,
    measure,
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, required=True)
    ap.add_argument("--checkpoint", type=str, required=True)
    ap.add_argument("--ee_config", type=str, default=None)
    ap.add_argument("--ee_checkpoint", type=str, default=None)
    ap.add_argument("--ee_threshold", type=float, default=0.08)
    ap.add_argument("--adaptive_layers", type=str, default="4,9,13",
                    help="candidate exit layers for the ee_adaptive row "
                         "(eesampler --adaptive_layers)")
    ap.add_argument("--shallow_config", type=str, default=None)
    ap.add_argument("--shallow_checkpoint", type=str, default=None)
    ap.add_argument("--t_switch", type=int, default=300)
    ap.add_argument("--interleave_shallow_checkpoint", type=str,
                    default=None,
                    help="Shallow model distilled over ALL timesteps "
                         "(--distill_t_min 0) — enables the interleave2/"
                         "interleave4 rows (the DuoDiff shallow is only "
                         "trained for its t >= T-t_switch regime)")
    ap.add_argument("--palette_k", type=int, default=4, choices=[1, 4, 8])
    ap.add_argument("--distribution", type=str, default="palette",
                    choices=["palette", "textured"],
                    help="textured = score mode stats against the texture "
                         "base colors (checkpoint trained via "
                         "convergence_probe --distribution textured)")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--num_timesteps", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--int8_scales", type=str, default=None,
                    help="tools/calibrate_int8.py JSON for the checkpoint — "
                         "enables the int8_static row (static MLP "
                         "activation scales)")
    ap.add_argument("--cache_schedule", type=str, default=None,
                    help="tools/derive_cache_schedule.py JSON (derive it "
                         "from this same checkpoint) — enables the "
                         "cache_derived[_int8] rows")
    ap.add_argument("--cache_schedule_duodiff", type=str, default=None,
                    help="composition-aware schedule for the DuoDiff rows "
                         "(derive_cache_schedule.py --t_switch mode); "
                         "default: --cache_schedule (the transferred "
                         "dense-trajectory table)")
    ap.add_argument("--cache_schedule_ee", type=str, default=None,
                    help="composition-aware schedule for the static-exit "
                         "rows (derive_cache_schedule.py --static_schedule "
                         "mode); default: --cache_schedule")
    ap.add_argument("--probe_calibration", type=str, default=None,
                    help="tools/calibrate_probes.py JSON — enables the "
                         "ee_adaptive_bidir row (calibrated bidirectional "
                         "walk; threshold auto-set to the middle candidate "
                         "layer's mean realized error)")
    ap.add_argument("--methods", type=str, default=None,
                    help="comma list to restrict (ddpm,int8,int8_static,"
                         "ddim50,dpm20,dpm20_cache3,cache3,cache3_int8,"
                         "cache3_int8_static,cache5_int8,cache7,"
                         "cache_derived,cache_derived_int8,"
                         "cache_derived_int8_static,ee_dynamic,"
                         "ee_adaptive,ee_adaptive_bidir,ee_static,"
                         "ee_static_int8,"
                         "ee_static_cache3,ee_static_cache_derived_int8,"
                         "duodiff,duodiff_int8,duodiff_cache3,"
                         "duodiff_cache_derived_int8,interleave2,"
                         "interleave4)")
    args = ap.parse_args(argv)

    import eesampler as eesampler_cli
    import sampler as sampler_cli

    palette = (TEXTURE_PALETTE if args.distribution == "textured"
               else PALETTES[args.palette_k])
    out_root = Path(args.out)
    only = set(args.methods.split(",")) if args.methods else None

    def want(name):
        return only is None or name in only

    if (args.ee_config and args.ee_checkpoint
            and (want("ee_static") or want("ee_static_int8"))
            and not want("ee_dynamic")
            and not (out_root / "ee_dynamic"
                     / "indices_by_timestep.npy").exists()):
        raise SystemExit(
            "ee_static derives its schedule from the ee_dynamic run's "
            "indices_by_timestep.npy — include ee_dynamic in --methods "
            "(or reuse an --out dir that already has it)"
        )

    rows = {}

    def score(name, elapsed):
        r = measure(out_root / name, palette)
        r["elapsed_s"] = round(elapsed, 2)
        # per-row provenance: rows from different invocations (quality_
        # workflow.sh runs this tool twice into the same --out) merge into
        # one file, so each row must record its own settings
        r["batch"] = args.batch
        r["num_timesteps"] = args.num_timesteps
        r["seed"] = args.seed
        rows[name] = r
        print(json.dumps({"method": name, **r}))

    def run_sampler(name, extra):
        t = time.time()
        sampler_cli.main([
            "--config_path", args.config,
            "--checkpoint_path", args.checkpoint,
            "--batch_size", str(args.batch),
            "--parametrization", "predict_noise",
            "--output_folder", str(out_root / name),
            "--num_timesteps", str(args.num_timesteps),
            "--seed", str(args.seed),
        ] + extra)
        score(name, time.time() - t)

    if want("ddpm"):
        run_sampler("ddpm", [])
    if want("int8"):
        # W8A8 quantized sampling (ops/pallas_block_int8.py): same DDPM-1000
        # trajectory shape as the ddpm row, int8 weight matmuls — the row
        # that measures what quantization costs in sample quality
        run_sampler("int8", ["--attn_impl", "fused_int8"])
    if want("int8_static") and args.int8_scales:
        # int8 with CALIBRATED static MLP activation scales
        # (tools/calibrate_int8.py) — scores what replacing dynamic per-row
        # quantization with static saturation costs in sample quality
        run_sampler("int8_static", [
            "--attn_impl", "fused_int8", "--int8_scales", args.int8_scales,
        ])
    if want("ddim50"):
        run_sampler("ddim50", ["--use_ddim", "--ddim_steps", "50"])
    if want("dpm20"):
        run_sampler("dpm20", ["--use_dpm_solver", "--dpm_steps", "20"])
    if want("dpm20_cache3"):
        # block caching composed into the fast solver (index-anchored, see
        # dpm_solver_sample): deltas go stale over ~150 trained-t units —
        # this row scores whether that still holds up on a trained model
        run_sampler("dpm20_cache3",
                    ["--use_dpm_solver", "--dpm_steps", "20",
                     "--cache_every", "3"])
    if want("cache3"):
        # training-free block caching (middle-block residual reused between
        # t % 3 == 0 anchors) — scores the stale-delta approximation on the
        # same trained weights (bench row celeba_cache3)
        run_sampler("cache3", ["--cache_every", "3"])
    if want("cache3_int8"):
        # the bench.py TPU headline composition: block caching + int8 W8A8
        # kernels in one sampler (bench row celeba_cache3_int8)
        run_sampler("cache3_int8",
                    ["--cache_every", "3", "--attn_impl", "fused_int8"])
    if want("cache3_int8_static") and args.int8_scales:
        # VERDICT r3 #5 decomposition: {dynamic, static int8} x {uniform,
        # derived schedule} — this is uniform-3 x static scales
        run_sampler("cache3_int8_static",
                    ["--cache_every", "3", "--attn_impl", "fused_int8",
                     "--int8_scales", args.int8_scales])
    if want("cache5"):
        # staler-delta sweep point: anchors every 5 steps instead of 3
        run_sampler("cache5", ["--cache_every", "5"])
    if want("cache5_int8"):
        # headline-candidate composition: the staler cache5 point with the
        # int8 W8A8 kernels (bench_matrix's celeba_cache5_int8 row)
        run_sampler("cache5_int8",
                    ["--cache_every", "5", "--attn_impl", "fused_int8"])
    if want("cache7"):
        # staleness-knee probe: 7-step-old deltas
        run_sampler("cache7", ["--cache_every", "7"])
    if want("cache7_int8"):
        run_sampler("cache7_int8",
                    ["--cache_every", "7", "--attn_impl", "fused_int8"])
    if want("cache_derived") and args.cache_schedule:
        # drift-derived anchor schedule (tools/derive_cache_schedule.py,
        # derived FROM this same checkpoint) — uniform-3's worst-case
        # staleness at ~uniform-5's anchor count
        run_sampler("cache_derived",
                    ["--cache_schedule", args.cache_schedule])
    if want("cache_derived_int8") and args.cache_schedule:
        run_sampler("cache_derived_int8",
                    ["--cache_schedule", args.cache_schedule,
                     "--attn_impl", "fused_int8"])
    if (want("cache_derived_int8_static") and args.cache_schedule
            and args.int8_scales):
        # the exact bench.py headline composition (derived schedule x
        # static scales) — closes the attribution gap VERDICT r3 #5 flags
        run_sampler("cache_derived_int8_static",
                    ["--cache_schedule", args.cache_schedule,
                     "--attn_impl", "fused_int8",
                     "--int8_scales", args.int8_scales])

    if args.shallow_config and args.shallow_checkpoint:
        # reference CLI contract: --config_path is the EARLY (shallow)
        # model, --config_path_late the full one (sampler.py:135-136 there).
        # duodiff_int8 scores the int8-composed operating point
        # (bench_matrix's celeba_duodiff_int8 row) on the same weights.
        duo_sched = args.cache_schedule_duodiff or args.cache_schedule
        for name, extra in (
            ("duodiff", []),
            ("duodiff_int8", ["--attn_impl", "fused_int8"]),
            # the late (full) model's segment block-cached (bench row
            # celeba_duodiff_cache3)
            ("duodiff_cache3", ["--cache_every", "3"]),
            # derived anchor table on the late segment (requires a
            # schedule; bench row celeba_duodiff_cache_derived_int8 —
            # pass --cache_schedule_duodiff for the composition-aware
            # late-segment derivation)
            ("duodiff_cache_derived_int8",
             ["--cache_schedule", duo_sched or "",
              "--attn_impl", "fused_int8"]),
        ):
            if not want(name):
                continue
            if name == "duodiff_cache_derived_int8" and not duo_sched:
                continue
            t = time.time()
            sampler_cli.main([
                "--config_path", args.shallow_config,
                "--checkpoint_path", args.shallow_checkpoint,
                "--config_path_late", args.config,
                "--checkpoint_path_late", args.checkpoint,
                "--t_switch", str(args.t_switch),
                "--batch_size", str(args.batch),
                "--parametrization", "predict_noise",
                "--output_folder", str(out_root / name),
                "--num_timesteps", str(args.num_timesteps),
                "--seed", str(args.seed),
            ] + extra)
            score(name, time.time() - t)

    if args.shallow_config and args.interleave_shallow_checkpoint:
        for n in (2, 4):
            name = f"interleave{n}"
            if not want(name):
                continue
            t = time.time()
            sampler_cli.main([
                "--config_path", args.shallow_config,
                "--checkpoint_path", args.interleave_shallow_checkpoint,
                "--config_path_late", args.config,
                "--checkpoint_path_late", args.checkpoint,
                "--interleave_every", str(n),
                "--batch_size", str(args.batch),
                "--parametrization", "predict_noise",
                "--output_folder", str(out_root / name),
                "--num_timesteps", str(args.num_timesteps),
                "--seed", str(args.seed),
            ])
            score(name, time.time() - t)

    if args.ee_config and args.ee_checkpoint:
        if want("ee_adaptive"):
            # probe-driven chunk-level bucket selection (eesampler
            # --adaptive_layers): the input-adaptive counterpart of the
            # ee_static rows, decided by the probes at run time
            t = time.time()
            eesampler_cli.main([
                "--config_path", args.ee_config,
                "--checkpoint_path", args.ee_checkpoint,
                "--threshold", str(args.ee_threshold),
                "--adaptive_layers", args.adaptive_layers,
                "--adaptive_chunk", "50",
                "--batch_size", str(args.batch),
                "--output_folder", str(out_root / "ee_adaptive"),
                "--num_timesteps", str(args.num_timesteps),
                "--seed", str(args.seed),
            ])
            score("ee_adaptive", time.time() - t)
        if want("ee_adaptive_bidir") and args.probe_calibration:
            # the CALIBRATED bidirectional walk (VERDICT r3 #3): decisions
            # in realized-error units via per-slot affine maps
            # (tools/calibrate_probes.py). Threshold = 2x the deepest
            # slot's mean realized error — the conservative "exit where
            # it's nearly free" gate (a permissive threshold sanctions
            # trajectory-destroying shallow descents: measured, the
            # middle-layer-mean threshold scored within-image std 0.48).
            # depth-1 joins the candidates so the gate has a nearly-free
            # rung to use.
            from duodiff_tpu.diffusion.calibration import (
                load_probe_calibration,
            )

            calib = load_probe_calibration(args.probe_calibration)
            depth = len(calib["mean_error"])
            layers = sorted(
                {int(v) for v in args.adaptive_layers.split(",")}
                | {depth - 1}
            )
            thr = 2.0 * calib["mean_error"][depth - 1]
            t = time.time()
            eesampler_cli.main([
                "--config_path", args.ee_config,
                "--checkpoint_path", args.ee_checkpoint,
                "--threshold", str(thr),
                "--adaptive_layers", ",".join(str(v) for v in layers),
                "--adaptive_chunk", "50",
                "--adaptive_bidirectional",
                "--probe_calibration", args.probe_calibration,
                "--batch_size", str(args.batch),
                "--output_folder", str(out_root / "ee_adaptive_bidir"),
                "--num_timesteps", str(args.num_timesteps),
                "--seed", str(args.seed),
            ])
            score("ee_adaptive_bidir", time.time() - t)
        if want("ee_dynamic"):
            t = time.time()
            eesampler_cli.main([
                "--config_path", args.ee_config,
                "--checkpoint_path", args.ee_checkpoint,
                "--threshold", str(args.ee_threshold),
                "--batch_size", str(args.batch),
                "--output_folder", str(out_root / "ee_dynamic"),
                "--num_timesteps", str(args.num_timesteps),
                "--seed", str(args.seed),
            ])
            score("ee_dynamic", time.time() - t)
        # ee_static_int8 = the static-exit + int8 composition;
        # ee_static_cache3 = static exits with block caching composed into
        # each bucket's truncated backbone (bench row
        # celeba_static_exit_cache3) — scores the stale-delta approximation
        # on top of the truncation approximation
        ee_sched = args.cache_schedule_ee or args.cache_schedule
        for name, extra in (
            ("ee_static", []),
            ("ee_static_int8", ["--attn_impl", "fused_int8"]),
            ("ee_static_cache3", ["--cache_every", "3"]),
            # drift-derived anchors inside the buckets (requires a
            # schedule; bench row celeba_static_exit_cache_derived_int8 —
            # pass --cache_schedule_ee for the bucket-aware derivation)
            ("ee_static_cache_derived_int8",
             ["--cache_schedule", ee_sched or "",
              "--attn_impl", "fused_int8"]),
        ):
            if not want(name):
                continue
            if name == "ee_static_cache_derived_int8" and not ee_sched:
                continue
            t = time.time()
            eesampler_cli.main([
                "--config_path", args.ee_config,
                "--checkpoint_path", args.ee_checkpoint,
                "--derive_schedule_from",
                str(out_root / "ee_dynamic" / "indices_by_timestep.npy"),
                "--batch_size", str(args.batch),
                "--output_folder", str(out_root / name),
                "--num_timesteps", str(args.num_timesteps),
                "--seed", str(args.seed),
            ] + extra)
            score(name, time.time() - t)

    # merge into an existing matrix instead of overwriting it: a partial
    # rerun (e.g. quality_workflow.sh step 5's interleave-only invocation)
    # must not destroy previously measured rows
    out_path = out_root / "quality_matrix.json"
    if out_path.exists():
        try:
            prior = json.loads(out_path.read_text())
        except (json.JSONDecodeError, OSError):
            prior = {}
        rows = {**prior, **rows}
    print(json.dumps(rows))
    out_path.write_text(json.dumps(rows, indent=1))
    return rows


if __name__ == "__main__":
    main()

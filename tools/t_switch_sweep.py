"""DuoDiff t_switch sweep: map the FID-vs-latency frontier and pick the
handoff point.

The reference picks t_switch=300 by hand (README.md:114-125); this tool
automates the choice: for each candidate t_switch it samples N images with
the shallow->full dual-backbone sampler, times the run, computes FID against
cached real-set statistics (--real_stats, produced by fid.py
--save_real_stats), and reports the frontier plus the largest t_switch whose
FID stays within --fid_slack of the pure-full-model FID.

Usage:
  python tools/t_switch_sweep.py \
      --config_path configs/uvit_celeba_3.yaml \
      --checkpoint_path <shallow_ckpt> \
      --config_path_late configs/uvit_celeba.yaml \
      --checkpoint_path_late <full_ckpt> \
      --real_stats celeba_stats.npz --inception_weights <pt_inception.pth> \
      --n_samples 1024 --t_switch 0 100 200 300 400 500
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", required=True, help="shallow/early model")
    p.add_argument("--checkpoint_path", default=None)
    p.add_argument("--config_path_late", required=True, help="full model")
    p.add_argument("--checkpoint_path_late", default=None)
    p.add_argument("--real_stats", required=True,
                   help=".npz with real-set mu/sigma (fid.py --save_real_stats)")
    p.add_argument("--inception_weights", required=True)
    p.add_argument("--t_switch", type=int, nargs="+",
                   default=[0, 100, 200, 300, 400, 500])
    p.add_argument("--n_samples", type=int, default=1024)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_timesteps", type=int, default=1000)
    p.add_argument("--fid_slack", type=float, default=0.5,
                   help="max FID degradation vs t_switch=0 (pure full model)")
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--output", default=None, help="JSON results path")
    args = p.parse_args(argv)
    if 0 not in args.t_switch:
        args.t_switch = [0] + list(args.t_switch)
    return args


def make_switch_sampler(early_sampler, late_sampler, schedule, shape):
    """Chunked-scan DuoDiff sampler with duodiff_sample's exact convention:
    shallow model for the FIRST t_switch (high-noise) steps
    t = T-1 .. T-t_switch, full model for the remaining T-t_switch steps
    (reference handoff ``if t == 1000 - t_switch``, sampler.py:135-136).
    Chunked segments bound remote-compile time vs one 1000-trip scan."""

    def sample_with_switch(key, t_switch):
        handoff = schedule.steps - int(t_switch)
        x, key = early_sampler.init(key, shape)
        if t_switch > 0:
            x, key = early_sampler.run(
                x, key, schedule.steps - 1, handoff, None
            )
            x, key = late_sampler.run(x, key, handoff - 1, 0, None)
        else:
            x, key = late_sampler.run(x, key, schedule.steps - 1, 0, None)
        return x

    return sample_with_switch


def main(argv=None):
    args = get_args(argv)

    from duodiff_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    import jax
    import numpy as np

    from duodiff_tpu.diffusion import ChunkedDDPMSampler, NoiseSchedule
    from duodiff_tpu.evaluation.fid import (
        compute_statistics,
        extract_features,
        frechet_distance,
    )
    from duodiff_tpu.models.inception import load_inception
    from duodiff_tpu.utils.model_loading import load_model_from_config

    early_model, early_params, cfg, _ = load_model_from_config(
        args.config_path,
        None if args.random_init else args.checkpoint_path,
        seed=args.seed,
    )
    late_model, late_params, _, _ = load_model_from_config(
        args.config_path_late,
        None if args.random_init else args.checkpoint_path_late,
        seed=args.seed + 1,
    )
    schedule = NoiseSchedule.create(steps=args.num_timesteps)
    shape = (args.batch_size, cfg.img_size, cfg.img_size, cfg.in_chans)

    early_sampler = ChunkedDDPMSampler(
        lambda x, t, y: early_model.apply({"params": early_params}, x, t, y),
        schedule, parametrization="predict_noise",
    )
    late_sampler = ChunkedDDPMSampler(
        lambda x, t, y: late_model.apply({"params": late_params}, x, t, y),
        schedule, parametrization="predict_noise",
    )

    sample_with_switch = make_switch_sampler(
        early_sampler, late_sampler, schedule, shape
    )

    stats = np.load(args.real_stats)
    mu_r, s_r = stats["mu"], stats["sigma"]
    inception, inc_params = load_inception(args.inception_weights)

    results = []
    n_batches = (args.n_samples + args.batch_size - 1) // args.batch_size
    for t_switch in args.t_switch:
        imgs = []
        # warmup/compile outside timing
        jax.block_until_ready(
            sample_with_switch(jax.random.PRNGKey(args.seed), t_switch)
        )
        tic = time.time()
        for i in range(n_batches):
            key = jax.random.PRNGKey(args.seed + 1 + i)
            x = jax.block_until_ready(sample_with_switch(key, t_switch))
            imgs.append(np.asarray((x + 1.0) / 2.0).clip(0, 1))
        elapsed = time.time() - tic
        gen = np.concatenate(imgs)[: args.n_samples]
        feats = extract_features(inception, inc_params, gen, args.batch_size)
        mu_f, s_f = compute_statistics(feats)
        fid = frechet_distance(mu_r, s_r, mu_f, s_f)
        per_image = elapsed / (n_batches * args.batch_size)
        results.append(
            {"t_switch": t_switch, "fid": round(fid, 4),
             "s_per_image": round(per_image, 5)}
        )
        print(f"t_switch={t_switch:>4}: FID {fid:7.3f}  "
              f"{per_image*1e3:7.2f} ms/image")

    base_fid = results[0]["fid"]
    ok = [r for r in results if r["fid"] <= base_fid + args.fid_slack]
    best = max(ok, key=lambda r: r["t_switch"])
    print(f"\nrecommended t_switch={best['t_switch']} "
          f"(FID {best['fid']} vs full-model {base_fid}, "
          f"{best['s_per_image']*1e3:.2f} ms/image)")
    payload = {"results": results, "recommended": best}
    if args.output:
        Path(args.output).write_text(json.dumps(payload, indent=2))
    return payload


if __name__ == "__main__":
    main()

"""Early-exit (DeeDiff/AdaDiff) sampling CLI.

Same public contract as the reference eesampler.py:114-213 — threshold,
checkpoint, PNG dump, statistics.txt plus the two exit-diagnostics tensors
(error_prediction_by_timestep 1000 x depth, indices_by_timestep 1000 x B) —
with the exit selection vectorized inside a single on-device lax.scan
(duodiff_tpu.diffusion.sampling.early_exit_sample).
"""

import argparse
import time
from pathlib import Path

import numpy as np


def get_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--threshold", type=float, required=True)
    parser.add_argument("--checkpoint_path", type=str, default=None)
    parser.add_argument("--batch_size", type=int, required=True)
    parser.add_argument("--output_folder", type=str, required=True)
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--class_id", type=int, default=None)
    parser.add_argument("--random_init", action="store_true")
    parser.add_argument("--num_timesteps", type=int, default=1000)
    return parser.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    output_folder = Path(args.output_folder)
    output_folder.mkdir(parents=True, exist_ok=True)

    from duodiff_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    import jax

    from duodiff_tpu.diffusion import ChunkedEarlyExitSampler, NoiseSchedule
    from duodiff_tpu.utils.image import save_samples
    from duodiff_tpu.utils.model_loading import load_model_from_config

    if not args.random_init and args.checkpoint_path is None:
        raise SystemExit("--checkpoint_path is required (or pass --random_init)")

    model, params, cfg, ae_cfg = load_model_from_config(
        args.config_path,
        None if args.random_init else args.checkpoint_path,
        early_exit=True,
        seed=args.seed,
    )

    decode_fn = None
    if ae_cfg is not None:
        from duodiff_tpu.models.autoencoder import load_autoencoder

        ae_model, ae_params = load_autoencoder(ae_cfg.autoencoder_checkpoint_path)
        decode_fn = jax.jit(
            lambda z: ae_model.apply({"params": ae_params}, z, method=ae_model.decode)
        )

    schedule = NoiseSchedule.create(steps=args.num_timesteps)
    shape = (args.batch_size, cfg.img_size, cfg.img_size, cfg.in_chans)

    key = jax.random.PRNGKey(args.seed)
    y = None
    if args.class_id is not None:
        key, ykey = jax.random.split(key)
        y = jax.random.randint(ykey, (args.batch_size,), 1, 1001)

    def apply_fn(x, t, yy):
        return model.apply({"params": params}, x, t, yy)

    sampler = ChunkedEarlyExitSampler(
        apply_fn, schedule, threshold=args.threshold
    )

    print(f"Early-exit sampling {args.batch_size} images "
          f"(threshold={args.threshold})...")
    tic = time.time()
    x, err_by_t, idx_by_t = sampler.sample(key, shape, y=y)
    x = jax.block_until_ready(x)
    elapsed = time.time() - tic

    if decode_fn is not None:
        x = decode_fn(x)
    samples = np.asarray((x + 1.0) / 2.0)

    with open(output_folder / "statistics.txt", "w") as f:
        f.write(f"Elapsed time: {elapsed} s\n")
    np.save(output_folder / "error_prediction_by_timestep.npy", np.asarray(err_by_t))
    np.save(output_folder / "indices_by_timestep.npy", np.asarray(idx_by_t))
    try:  # reference tooling reads .pt files (eesampler.py:108-111)
        import torch

        torch.save(torch.from_numpy(np.asarray(err_by_t)),
                   output_folder / "error_prediction_by_timestep.pt")
        torch.save(torch.from_numpy(np.asarray(idx_by_t, dtype=np.float32)),
                   output_folder / "indices_by_timestep.pt")
    except ImportError:
        pass

    save_samples(samples, output_folder, with_grid=False)
    print(f"Elapsed time: {elapsed:.2f} s -> {output_folder}")
    print(f"mean exit index: {np.asarray(idx_by_t).mean():.2f} "
          f"(depth={cfg.depth})")


if __name__ == "__main__":
    main()

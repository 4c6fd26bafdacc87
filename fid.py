"""FID evaluation CLI (same contract as reference fid.py:8-51, feature
extraction on TPU via the Flax InceptionV3 port).

Needs the canonical Inception weights file (pt_inception from pytorch-fid or
torchvision inception_v3) — this environment cannot download them, so pass
--inception_weights.
"""

import argparse


def get_args(argv=None):
    parser = argparse.ArgumentParser(description="FID evaluation parameters")
    parser.add_argument("--dataset", type=str, required=True,
                        choices=["cifar10", "celeba", "imagenet64", "imagenet256"])
    parser.add_argument("--seed", type=int, default=0,
                        help="Seed for sampling images from the dataset")
    parser.add_argument("--data_path", type=str, default="data")
    parser.add_argument("--samples_path", type=str, required=True,
                        help="Directory with generated sample PNGs")
    parser.add_argument("--inception_weights", type=str,
                        default="checkpoints/pt_inception-2015-12-05-6726825d.pth")
    parser.add_argument("--batch_size", type=int, default=64,
                        help="Feature-extraction batch size")
    parser.add_argument("--real_stats", type=str, default=None,
                        help=".npz with precomputed real-set mu/sigma "
                             "(pytorch-fid convention); skips the dataset "
                             "pass entirely when given")
    parser.add_argument("--save_real_stats", type=str, default=None,
                        help="Write the real-set mu/sigma to this .npz for "
                             "reuse in later evaluations")
    return parser.parse_args(argv)


def main(argv=None):
    args = get_args(argv)

    from duodiff_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    import numpy as np

    from duodiff_tpu.evaluation.fid import (
        compute_statistics,
        extract_features,
        frechet_distance,
        get_dataset_samples,
        read_samples,
    )
    from duodiff_tpu.models.inception import load_inception

    generated = read_samples(args.samples_path)
    n_samples = len(generated)
    print(f"Using {n_samples}")

    model, params = load_inception(args.inception_weights)
    fake_feats = extract_features(model, params, generated, args.batch_size)
    mu_f, s_f = compute_statistics(fake_feats)

    if args.real_stats:
        stats = np.load(args.real_stats)
        mu_r, s_r = stats["mu"], stats["sigma"]
        print(f"Loaded real-set statistics from {args.real_stats}")
    else:
        real = get_dataset_samples(
            args.dataset, args.data_path, args.seed, n_samples
        )
        real_feats = extract_features(model, params, real, args.batch_size)
        mu_r, s_r = compute_statistics(real_feats)
        if args.save_real_stats:
            np.savez(args.save_real_stats, mu=mu_r, sigma=s_r)
            print(f"Saved real-set statistics to {args.save_real_stats}")

    print("Evaluating FID")
    fid = frechet_distance(mu_r, s_r, mu_f, s_f)
    print(f"FID: {fid}")
    return fid


if __name__ == "__main__":
    main()

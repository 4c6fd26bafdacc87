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
    return parser.parse_args(argv)


def main(argv=None):
    args = get_args(argv)

    from duodiff_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    from duodiff_tpu.evaluation.fid import (
        extract_features,
        fid_from_features,
        get_dataset_samples,
        read_samples,
    )
    from duodiff_tpu.models.inception import load_inception

    generated = read_samples(args.samples_path)
    n_samples = len(generated)
    print(f"Using {n_samples}")
    real = get_dataset_samples(args.dataset, args.data_path, args.seed, n_samples)

    model, params = load_inception(args.inception_weights)
    real_feats = extract_features(model, params, real, args.batch_size)
    fake_feats = extract_features(model, params, generated, args.batch_size)

    print("Evaluating FID")
    fid = fid_from_features(real_feats, fake_feats)
    print(f"FID: {fid}")
    return fid


if __name__ == "__main__":
    main()

"""Export a duodiff_tpu checkpoint to a reference-loadable PyTorch .pth.

The reverse migration path: models trained here (Orbax checkpoints) become
state dicts the reference CLIs load directly (reference sampler.py:270-304,
eesampler.py:143-168 — both accept the {"model_state_dict": ...} wrapper).

    python tools/export_torch.py \
        --config_path configs/uvit_celeba.yaml \
        --checkpoint_path logs/<exp>/checkpoints/step-500000 \
        --output celeba_uvit.pth [--early_exit] [--use_ema]

Runs on CPU; no TPU claim needed.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config_path", required=True,
                        help="reference-format model YAML")
    parser.add_argument("--checkpoint_path", required=True,
                        help="Orbax checkpoint dir (or torch .pth to re-export)")
    parser.add_argument("--output", required=True, help="output .pth path")
    parser.add_argument("--early_exit", action="store_true",
                        help="checkpoint is an EarlyExitUViT (DeeDiff)")
    parser.add_argument("--use_ema", action="store_true",
                        help="export the EMA shadow params")
    args = parser.parse_args(argv)

    # CPU is all we need for a layout transform; skip the TPU claim.
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

    from duodiff_tpu.utils.model_loading import load_model_from_config
    from duodiff_tpu.utils.torch_export import export_torch_checkpoint

    _, params, cfg, _ = load_model_from_config(
        args.config_path,
        args.checkpoint_path,
        early_exit=args.early_exit,
        use_ema=args.use_ema,
        attn_impl="auto",
    )
    # in_chans from the config reaches the conv=False path (no final_layer
    # in the tree to derive it from)
    export_torch_checkpoint(params, args.output, in_chans=cfg.in_chans)
    size_mb = os.path.getsize(args.output) / 1e6
    print(f"exported {args.output} ({size_mb:.1f} MB, "
          f"{'EarlyExitUViT' if args.early_exit else 'UViT'} "
          f"depth={cfg.depth} embed_dim={cfg.embed_dim})")


if __name__ == "__main__":
    main()

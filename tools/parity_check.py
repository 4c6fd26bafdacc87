"""Forward-parity harness against a reference PyTorch checkpoint.

Loads the same weights into (a) the reference torch model (imported from a
reference checkout) and (b) this framework via the converter, runs both on
identical inputs, and reports the max abs error — the SURVEY.md §7 stage-10
"parity harness" as a standalone CLI usable with real released checkpoints.

Usage:
  python tools/parity_check.py --config_path configs/uvit_celeba.yaml \
      --checkpoint_path <ckpt.pth> [--early_exit] \
      [--reference /root/reference] [--batch 2] [--tolerance 2e-4]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--checkpoint_path", required=True)
    parser.add_argument("--early_exit", action="store_true")
    parser.add_argument("--reference", default="/root/reference")
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--tolerance", type=float, default=2e-4)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    ref_root = Path(args.reference)
    if not ref_root.exists():
        raise SystemExit(f"reference checkout not found at {ref_root}")
    sys.path.insert(0, str(ref_root))

    import numpy as np
    import torch

    import jax.numpy as jnp

    from duodiff_tpu.config import load_model_config
    from duodiff_tpu.utils.model_loading import load_model_from_config

    cfg, _ = load_model_config(args.config_path)
    model, params, cfg, _ = load_model_from_config(
        args.config_path, args.checkpoint_path,
        early_exit=args.early_exit, dtype=jnp.float32,
    )

    from models.uvit import UViT as RefUViT

    ref_kwargs = dict(
        img_size=cfg.img_size, patch_size=cfg.patch_size, in_chans=cfg.in_chans,
        embed_dim=cfg.embed_dim, depth=cfg.depth, num_heads=cfg.num_heads,
        mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
        mlp_time_embed=cfg.mlp_time_embed, num_classes=cfg.num_classes,
        normalize_timesteps=cfg.normalize_timesteps,
    )
    ref = RefUViT(**ref_kwargs)
    if args.early_exit:
        from models.early_exit import EarlyExitUViT as RefEE

        ref = RefEE(ref, classifier_type=cfg.classifier_type)
    state = torch.load(args.checkpoint_path, map_location="cpu",
                       weights_only=False)
    if isinstance(state, dict) and "model_state_dict" in state:
        state = state["model_state_dict"]
    ref.load_state_dict(state)
    ref.eval()

    rng = np.random.RandomState(args.seed)
    x = rng.randn(args.batch, cfg.in_chans, cfg.img_size, cfg.img_size)
    x = x.astype(np.float32)
    t = np.full((args.batch,), 123.0, np.float32)
    y = (
        rng.randint(0, cfg.num_classes, (args.batch,))
        if cfg.num_classes > 0 else None
    )

    with torch.no_grad():
        targs = [torch.from_numpy(x), torch.from_numpy(t)]
        if y is not None:
            targs.append(torch.from_numpy(y))
        ref_out = ref(*targs)

    jx = jnp.asarray(x.transpose(0, 2, 3, 1))
    jt = jnp.asarray(t)
    jy = jnp.asarray(y) if y is not None else None
    out = model.apply({"params": params}, jx, jt, jy)

    def report(name, ours_nhwc, theirs_nchw):
        ours = np.asarray(ours_nhwc)
        if ours.ndim == 4:
            ours = ours.transpose(0, 3, 1, 2)
        elif ours.ndim == 5:
            ours = ours.transpose(0, 1, 4, 2, 3)
        err = np.abs(ours - theirs_nchw.numpy()).max()
        status = "OK" if err < args.tolerance else "MISMATCH"
        print(f"{name:>24}: max abs err {err:.3e}  [{status}]")
        return err

    if args.early_exit:
        errs = [
            report("backbone", out[0], ref_out[0]),
            report("classifier_outputs", out[1], torch.stack(ref_out[1])),
            report("ee_outputs", out[2], torch.stack(ref_out[2])),
        ]
    else:
        errs = [report("output", out, ref_out)]

    worst = max(errs)
    if worst >= args.tolerance:
        raise SystemExit(f"PARITY FAILED: worst err {worst:.3e}")
    print(f"PARITY OK (tolerance {args.tolerance})")


if __name__ == "__main__":
    main()

"""Training CLI — same flag surface as the reference (main.py:10-194) on the
TPU-native trainer (duodiff_tpu.training.trainer)."""

import argparse

from duodiff_tpu.config import load_config, merge_args_with_config
from duodiff_tpu.utils.train_utils import get_exp_name


def get_args(argv=None):
    parser = argparse.ArgumentParser(description="Training parameters")

    # Training
    parser.add_argument("--seed", type=int, default=1, help="Seed")
    parser.add_argument("--n_steps", type=int, required=True, help="Number of steps")
    parser.add_argument("--batch_size", type=int, default=128, help="Batch size")
    parser.add_argument("--num_timesteps", type=int, default=1000,
                        help="Number of timesteps")
    parser.add_argument("--use_amp", action="store_true", default=False,
                        help="bf16 compute (native on TPU; no grad scaler needed)")
    parser.add_argument("--amp_dtype", type=str, default="bfloat16",
                        help="AMP data type")
    parser.add_argument("--attn_impl", type=str, default=None,
                        choices=["auto", "xla", "pallas", "fused"],
                        help="Attention implementation (default: fused "
                             "Pallas sublayer kernels on TPU, XLA elsewhere)")
    parser.add_argument("--label_dropout", type=float, default=0.0,
                        help="Classifier-free-guidance training: fraction "
                             "of labels replaced by the null token "
                             "(num_classes-1) each step. The config must "
                             "RESERVE that slot beyond the real classes "
                             "(e.g. num_classes: 1001 for ImageNet-1000). "
                             "Beyond-parity; pairs with sampler.py "
                             "--guidance_scale")
    parser.add_argument("--gelu", type=str, default="exact",
                        choices=["exact", "tanh"],
                        help="GELU form. 'exact' matches the reference "
                             "(torch nn.GELU); 'tanh' is the tanh "
                             "approximation (difference below bf16 rounding, "
                             "skips the VPU-bound erf in the Pallas kernels)")
    parser.add_argument("--max_grad_norm", type=float, default=1.0,
                        help="Max gradient norm")
    parser.add_argument("--use_checkpoint", action="store_true", default=False,
                        help="Per-block activation checkpointing (remat): "
                             "only block-boundary activations stay live for "
                             "the backward, everything inside a block is "
                             "recomputed — trades ~30%% more FLOPs for HBM, "
                             "enabling larger batches. Identical params and "
                             "numerics. (The reference has the same knob at "
                             "models/uvit.py:197-201, unwired from its CLI)")

    # Logging
    parser.add_argument("--log_path", type=str, default="logs")
    parser.add_argument("--exp_name", type=str, default=None)
    parser.add_argument("--log_every_n_steps", type=int, default=None)
    parser.add_argument("--n_samples", type=int, default=16,
                        help="Number of images to sample for logging")
    parser.add_argument("--sample_height", type=int, default=32)
    parser.add_argument("--sample_width", type=int, default=32)
    parser.add_argument("--sample_seed", type=int, default=42)

    # Checkpointing
    parser.add_argument("--load_checkpoint_path", type=str, default=None)
    parser.add_argument("--load_backbone", type=str, default=None,
                        help="Checkpoint to a pretrained UViT backbone "
                             "(Orbax dir or reference .pth)")
    parser.add_argument("--freeze_backbone", action="store_true")
    parser.add_argument("--normalize_timesteps", action="store_true")
    parser.add_argument("--use_unweighted_loss", action="store_true")
    parser.add_argument("--parametrization", type=str,
                        choices=["predict_noise", "predict_original",
                                 "predict_previous"],
                        default="predict_noise")
    parser.add_argument("--save_checkpoint_path", type=str, default=None)
    parser.add_argument("--save_every_n_steps", type=int, default=None)
    parser.add_argument("--save_new_every_n_steps", type=int, default=None)
    parser.add_argument("--async_checkpoint", action="store_true",
                        default=False,
                        help="Commit checkpoints on a background thread "
                             "(orbax AsyncCheckpointer): the train loop "
                             "only pays the device->host transfer, the "
                             "filesystem write overlaps the next steps")
    parser.add_argument("--resume", action="store_true", default=False)

    # Optimizer
    parser.add_argument("--distill_config", type=str, default=None,
                        help="Teacher model YAML: train the (shallow) "
                             "student to match the teacher's outputs "
                             "(DuoDiff shallow-model distillation; no "
                             "reference equivalent)")
    parser.add_argument("--distill_from", type=str, default=None,
                        help="Teacher checkpoint (Orbax dir or .pth); "
                             "random teacher if omitted (smoke only)")
    parser.add_argument("--distill_alpha", type=float, default=1.0,
                        help="alpha*MSE(student, teacher) + (1-alpha)*task")
    parser.add_argument("--distill_t_min", type=int, default=0,
                        help="Train only on t >= t_min (the shallow model's "
                             "deployment regime is t >= steps - t_switch)")
    parser.add_argument("--ema_decay", type=float, default=0.0,
                        help="Track an EMA of the params (e.g. 0.9999) and "
                             "sample/log with it; 0 disables (reference has "
                             "no EMA, but U-ViT upstream uses it for FID)")
    parser.add_argument("--optimizer", type=str, default="adamw",
                        choices=["adamw"])
    parser.add_argument("--lr", type=float, default=0.0002)
    parser.add_argument("--weight_decay", type=float, default=0.03)
    parser.add_argument("--beta1", type=float, default=0.99)
    parser.add_argument("--beta2", type=float, default=0.999)
    parser.add_argument("--grad_accum", type=int, default=1,
                        help="Accumulate gradients over N data steps per "
                             "optimizer update (optax.MultiSteps, fully "
                             "on-device). --num_warmup_steps counts "
                             "optimizer updates")
    parser.add_argument("--skip_nonfinite", type=int, default=0,
                        help="Skip optimizer updates whose gradients "
                             "contain inf/NaN, erroring only after N "
                             "consecutive bad steps (optax.apply_if_finite; "
                             "no per-step host sync). 0 disables")

    # LR scheduler
    parser.add_argument("--num_warmup_steps", type=int, default=1500)

    # Model
    parser.add_argument("--config_path", type=str, default=None,
                        help="YAML config; its model_params overwrite CLI args")
    parser.add_argument("--model", type=str, default="uvit",
                        choices=["uvit", "deediff_uvit"])
    parser.add_argument("--classifier_type", type=str, default="attention_probe",
                        choices=["attention_probe", "mlp_probe_per_layer",
                                 "mlp_probe_per_timestep",
                                 "mlp_probe_per_layer_per_timestep"])
    parser.add_argument("--img_size", type=int, default=32)
    parser.add_argument("--patch_size", type=int, default=2)
    parser.add_argument("--in_chans", type=int, default=3)
    parser.add_argument("--embed_dim", type=int, default=512)
    parser.add_argument("--depth", type=int, default=13)
    parser.add_argument("--num_heads", type=int, default=8)
    parser.add_argument("--mlp_ratio", type=int, default=4)
    parser.add_argument("--qkv_bias", action="store_true", default=False)
    parser.add_argument("--mlp_time_embed", action="store_true", default=False)
    parser.add_argument("--num_classes", type=int, default=-1)

    # Profiling (no reference equivalent; SURVEY.md §5)
    parser.add_argument("--profile", action="store_true", default=False,
                        help="Capture a jax.profiler device trace of steps "
                             "3-8 into <log_path>/<exp_name>/profile")

    # Dataset
    parser.add_argument("--dataset", type=str, default="cifar10",
                        choices=["cifar10", "celeba", "imagenet64", "imagenet256"])
    parser.add_argument("--data_path", type=str, default="data")
    parser.add_argument("--cache_data", action="store_true", default=False,
                        help="One-time memmap cache of the decoded/resized "
                             "dataset (data/_duodiff_cache) — removes the "
                             "per-epoch JPEG decode wall on slow hosts")

    parser.add_argument("--model_parallel", type=int, default=1,
                        help="Tensor-parallel mesh axis size: the mesh "
                             "becomes (devices/N data, N model) and the "
                             "Megatron-style partition rules in "
                             "duodiff_tpu/parallel/mesh.py shard qkv/proj/"
                             "fc1/fc2 (+ Adam mu/nu) over it. 1 = pure "
                             "data parallelism (default)")
    parser.add_argument("--fsdp", action="store_true", default=False,
                        help="ZeRO-3-style parameter sharding: weights, "
                             "EMA and Adam mu/nu are sharded over the "
                             "'data' mesh axis (GSPMD all-gathers shards "
                             "before use, reduce-scatters gradients) so "
                             "per-device state memory shrinks ~linearly "
                             "with the data-parallel degree. Composes "
                             "with --model_parallel")
    parser.add_argument("--fsdp_min_size", type=int, default=16384,
                        help="Leaves with fewer elements than this keep "
                             "their non-FSDP sharding (gathering tiny "
                             "LN/bias tensors costs latency, saves "
                             "nothing)")
    parser.add_argument("--multihost", action="store_true", default=False,
                        help="Call jax.distributed.initialize() before "
                             "anything touches jax (TPU pods auto-detect "
                             "coordinator/process ids from the environment; "
                             "elsewhere set JAX_COORDINATOR_ADDRESS, "
                             "JAX_NUM_PROCESSES, JAX_PROCESS_ID). The "
                             "trainer then builds the hybrid "
                             "(dcn, data, model) mesh")

    return parser.parse_args(argv)


def maybe_init_distributed(args) -> None:
    """Initialize the jax distributed runtime for multi-host training.

    Triggered by --multihost or by the presence of JAX_COORDINATOR_ADDRESS
    in the environment. On TPU pods ``jax.distributed.initialize()`` reads
    everything from the environment; on CPU/GPU clusters the three env vars
    spell it out (same contract as tests/test_multihost.py)."""
    import os

    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not (args.multihost or coordinator):
        return
    import jax

    if coordinator:
        # Explicit multi-process spec: all three env vars or none. Catching
        # a partial spec here beats a raw KeyError (or a silent fall-through
        # to auto-detect, which hangs on non-TPU hosts).
        num_procs = os.environ.get("JAX_NUM_PROCESSES")
        proc_id = os.environ.get("JAX_PROCESS_ID")
        if not (num_procs and proc_id):
            missing = [
                name for name, val in (
                    ("JAX_NUM_PROCESSES", num_procs),
                    ("JAX_PROCESS_ID", proc_id),
                ) if not val
            ]
            raise SystemExit(
                "JAX_COORDINATOR_ADDRESS is set but "
                f"{' and '.join(missing)} "
                "missing — all three are required for an explicit "
                "multi-host spec (see --multihost help)"
            )
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(num_procs),
            process_id=int(proc_id),
        )
    else:
        jax.distributed.initialize()
    print(
        f"jax.distributed initialized: process {jax.process_index()}/"
        f"{jax.process_count()}, {jax.device_count()} global devices"
    )


def main(argv=None):
    args = get_args(argv)

    if args.exp_name is None:
        args.exp_name = get_exp_name(args)

    if args.config_path is not None:
        config = load_config(args.config_path)
        merge_args_with_config(args, config)

    maybe_init_distributed(args)

    # Late import so --help stays fast (jax/TPU init is expensive).
    from duodiff_tpu.training.trainer import Trainer

    trainer = Trainer(args)
    return trainer.train()


if __name__ == "__main__":
    main()

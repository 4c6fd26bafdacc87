"""Multi-chip scaling report from compiled HLO.

Real multi-chip hardware isn't needed to audit how the framework scales:
GSPMD partitioning is decided at compile time, so compiling the FULL train
step over virtual n-device meshes and counting the collectives (and their
payload bytes) in the compiled HLO gives the exact per-step communication
schedule a real pod would execute over ICI. This is the communication-layer
counterpart of tests/test_qkv_layout.py's zero-all-gather assertion
(SURVEY.md §2b: the reference has no distributed layer at all; here the
"backend" is GSPMD + sharding annotations).

Usage (self-provisions an 8-device virtual CPU platform):
    python tools/scaling_report.py [--batch 32] [--depth 5] [--embed 256]
    python tools/scaling_report.py --mode sample   # DDPM sampling schedule

Prints one row per mesh shape: collective counts, all-reduce payload
MB/step (the DP gradient reduction should track param bytes, TP psums
track activation bytes), and per-device param bytes.

``--mode sample`` audits the SAMPLING path instead: one compiled chunk of
the production ChunkedDDPMSampler scan (params threaded as traced
arguments, x_T batch-sharded over the "data" axis). Counts are per
reverse-process step (the scan body). Expected shape of the result: pure-DP
meshes run ZERO collectives — DDPM sampling is embarrassingly parallel over
the batch (SURVEY.md §2b), every chip denoises its batch shard with
replicated weights — and (data, model) meshes run the same per-block
row-parallel psums as the TP forward pass with params/device shrinking
linearly.
"""

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _provision(n: int) -> None:
    """Ensure >= n virtual CPU devices; re-exec in a clean env if a
    sitecustomize already initialized jax on another platform."""
    env = os.environ
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        env.get("XLA_FLAGS", ""),
    )
    want_flags = (
        flags + f" --xla_force_host_platform_device_count={n}"
    ).strip()
    provisioned = (
        env.get("JAX_PLATFORMS") == "cpu"
        and f"--xla_force_host_platform_device_count={n}"
        in env.get("XLA_FLAGS", "")
        and "PALLAS_AXON_POOL_IPS" not in env
    )
    if "jax" in sys.modules and not provisioned:
        env = dict(env)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["XLA_FLAGS"] = want_flags
        os.execve(sys.executable, [sys.executable] + sys.argv, env)
    if not provisioned:
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["XLA_FLAGS"] = want_flags


_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")
_SHAPE_RE = re.compile(r"(\w+)\[([0-9,]*)\]")
_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "f64": 8, "s8": 1, "u8": 1, "pred": 1}


def _collective_stats(hlo_text: str):
    """Count collectives and their result-payload bytes. XLA's combiner
    merges the DP gradient reduction into ONE tuple-shaped all-reduce, so
    the result type may be `(f32[..], bf16[..], ...)` — sum every shape in
    the result type (the text between '=' and the op name)."""
    counts = {c: 0 for c in _COLLECTIVES}
    payload = {c: 0 for c in _COLLECTIVES}
    for line in hlo_text.splitlines():
        for op in _COLLECTIVES:
            marker = f" {op}("
            if marker not in line or "=" not in line:
                continue
            result_type = line.split("=", 1)[1].split(marker, 1)[0]
            counts[op] += 1
            for dtype, dims in _SHAPE_RE.findall(result_type):
                n = 1
                for d in dims.split(","):
                    if d:
                        n *= int(d)
                payload[op] += n * _DTYPE_BYTES.get(dtype, 4)
            break
    return counts, payload


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img", type=int, default=32)
    ap.add_argument("--patch", type=int, default=4)
    ap.add_argument("--embed", type=int, default=256)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--meshes", type=str,
                    default="1x1,2x1,4x1,8x1,4x2,2x4",
                    help="comma-separated DPxTP shapes")
    ap.add_argument("--mode", default="train", choices=["train", "sample"],
                    help="audit the train step or one chunk of the "
                         "production DDPM sampling scan")
    ap.add_argument("--fsdp", action="store_true", default=False,
                    help="ZeRO-3 parameter sharding over the data axis "
                         "(weights all-gathered on use); the 'par MB/dev' "
                         "column should shrink ~linearly in DP degree")
    ap.add_argument("--fsdp_min_size", type=int, default=16384)
    args = ap.parse_args()

    shapes = []
    for part in args.meshes.split(","):
        dp, tp = part.lower().split("x")
        shapes.append((int(dp), int(tp)))
    need = max(dp * tp for dp, tp in shapes)
    _provision(need)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from duodiff_tpu.config import UViTConfig
    from duodiff_tpu.diffusion import NoiseSchedule
    from duodiff_tpu.models.uvit import init_uvit
    from duodiff_tpu.parallel import (
        batch_sharding,
        create_mesh,
        fsdp_shard_params,
        shard_params,
    )
    from duodiff_tpu.training.train_state import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = UViTConfig(
        img_size=args.img, patch_size=args.patch, in_chans=3,
        embed_dim=args.embed, depth=args.depth, num_heads=args.heads,
        mlp_ratio=4, qkv_bias=False, mlp_time_embed=False, num_classes=-1,
        normalize_timesteps=True,
    )
    schedule = NoiseSchedule.create(steps=100)
    tx = make_optimizer(
        lr=2e-4, weight_decay=0.03, beta1=0.99, beta2=0.999,
        max_grad_norm=1.0, num_warmup_steps=10, num_training_steps=1000,
    )

    header = (f"{'mesh':>6} {'all-red':>8} {'MB/step':>8} {'all-gat':>8} "
              f"{'MB/step':>8} {'red-sct':>8} {'perm':>6} "
              f"{'par MB/dev':>11} {'compile s':>10}")
    print(f"{args.mode}-step collective schedule (batch={args.batch}, "
          f"D={args.embed}, depth={args.depth}, img={args.img})")
    print(header)
    rows = []
    for dp, tp in shapes:
        n = dp * tp
        mesh = create_mesh(shape=(dp, tp), devices=jax.devices()[:n])
        model, params = init_uvit(
            cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16,
            qkv_layout="heads" if tp > 1 else "packed",
        )
        if args.fsdp:
            shardings = fsdp_shard_params(
                params, mesh, min_size=args.fsdp_min_size
            )
        else:
            shardings = shard_params(params, mesh)
        params = jax.device_put(params, shardings)
        tic = time.time()
        if args.mode == "train":
            state = create_train_state(params, tx)
            step = jax.jit(
                make_train_step(
                    lambda p, x, t, y: model.apply({"params": p}, x, t, y),
                    schedule, model_kind="uvit",
                    parametrization="predict_noise",
                ),
                donate_argnums=(0,),
            )
            batch = {
                "image": jax.device_put(
                    np.zeros((args.batch, args.img, args.img, 3), np.float32),
                    batch_sharding(mesh),
                ),
                "label": jax.device_put(
                    np.zeros((args.batch,), np.int32),
                    batch_sharding(mesh, ndim=1),
                ),
            }
            compiled = step.lower(
                state, batch, jax.random.PRNGKey(0)
            ).compile()
        else:
            # one chunk of the production sampling scan, exactly as
            # sampler.py runs it: params traced, x_T batch-sharded
            from duodiff_tpu.diffusion.sampling import ChunkedDDPMSampler

            sampler = ChunkedDDPMSampler(
                lambda p, x, t, y: model.apply({"params": p}, x, t, y),
                schedule, parametrization="predict_noise", chunk=10,
                params=params,
            )
            x = jax.device_put(
                np.zeros((args.batch, args.img, args.img, 3), np.float32),
                batch_sharding(mesh),
            )
            ts = jnp.arange(9, -1, -1)
            compiled = sampler._run_chunk.lower(
                params, x, jax.random.PRNGKey(0), ts, None
            ).compile()
        dt = time.time() - tic
        counts, payload = _collective_stats(compiled.as_text())
        # per-device param residency under the sharding
        par_bytes = sum(
            np.prod(s.shard_shape(l.shape)) * l.dtype.itemsize
            for l, s in zip(
                jax.tree_util.tree_leaves(params),
                jax.tree_util.tree_leaves(shardings),
            )
        )
        row = {
            "mesh": f"{dp}x{tp}",
            "all_reduce": counts["all-reduce"],
            "all_reduce_mb": payload["all-reduce"] / 1e6,
            "all_gather": counts["all-gather"],
            "all_gather_mb": payload["all-gather"] / 1e6,
            "reduce_scatter": counts["reduce-scatter"],
            "permute": counts["collective-permute"],
            "param_mb_per_dev": par_bytes / 1e6,
            "compile_s": dt,
        }
        rows.append(row)
        print(f"{row['mesh']:>6} {row['all_reduce']:>8} "
              f"{row['all_reduce_mb']:>8.2f} {row['all_gather']:>8} "
              f"{row['all_gather_mb']:>8.2f} {row['reduce_scatter']:>8} "
              f"{row['permute']:>6} {row['param_mb_per_dev']:>11.2f} "
              f"{row['compile_s']:>10.1f}")

    import json
    print(json.dumps(rows))


if __name__ == "__main__":
    main()

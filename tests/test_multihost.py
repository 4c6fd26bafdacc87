"""Multi-host (DCN-axis) smoke test.

Spawns two REAL jax.distributed processes on the CPU backend (4 local
devices each -> 8 global), builds the hybrid ("dcn", "data", "model") mesh,
and runs one data-parallel train step with the batch sharded over
("dcn", "data") — the gradient psum crosses the process boundary over the
distributed runtime, which is exactly the collective layout a multi-host TPU
pod would use (SURVEY.md §2b "TPU-native equivalents to build").
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parents[1]

_WORKER = r"""
import sys

import jax

coordinator, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
jax.distributed.initialize(
    coordinator_address=coordinator, num_processes=n_proc, process_id=pid
)
assert jax.process_count() == n_proc, jax.process_count()
assert jax.device_count() == 8, jax.device_count()

import jax.numpy as jnp
import numpy as np

from duodiff_tpu.config import UViTConfig
from duodiff_tpu.diffusion import NoiseSchedule
from duodiff_tpu.models.uvit import init_uvit
from duodiff_tpu.parallel import batch_sharding, create_hybrid_mesh, shard_params
from duodiff_tpu.training.train_state import (
    create_train_state,
    make_optimizer,
    make_train_step,
)

mesh = create_hybrid_mesh(model_parallel=2)
assert dict(mesh.shape) == {"dcn": 2, "data": 2, "model": 2}, mesh.shape

cfg = UViTConfig(
    img_size=16, patch_size=2, in_chans=3, embed_dim=64, depth=3,
    num_heads=4, mlp_ratio=4, num_classes=-1, normalize_timesteps=True,
)
model, params = init_uvit(cfg, jax.random.PRNGKey(0))
params = jax.device_put(params, shard_params(params, mesh))

schedule = NoiseSchedule.create(steps=50)
tx = make_optimizer(lr=1e-4, weight_decay=0.0, beta1=0.9, beta2=0.999,
                    max_grad_norm=1.0, num_warmup_steps=1,
                    num_training_steps=10)
state = create_train_state(params, tx)
step_fn = jax.jit(make_train_step(
    lambda p, x, t, y: model.apply({"params": p}, x, t, y),
    schedule, model_kind="uvit", parametrization="predict_noise",
))

# every process provides only ITS shard of the global batch: rows are
# sharded over ("dcn", "data") and dcn spans processes, so process p owns
# rows [p*B/2, (p+1)*B/2) — make_array_from_process_local_data scales the
# sharded dim by the process count to recover global_batch
bshard = batch_sharding(mesh)
global_batch = 8
local = global_batch // n_proc
rng = np.random.RandomState(0)  # both processes draw the same global batch
imgs = rng.randn(global_batch, 16, 16, 3).astype(np.float32)
image = jax.make_array_from_process_local_data(
    bshard, imgs[pid * local : (pid + 1) * local]
)
label = jax.make_array_from_process_local_data(
    batch_sharding(mesh, ndim=1), np.zeros((local,), np.int32)
)
assert image.shape == (global_batch, 16, 16, 3), image.shape

state, metrics = step_fn(state, {"image": image, "label": label},
                         jax.random.PRNGKey(0))
loss = float(metrics["train_loss"])
assert np.isfinite(loss), loss
print(f"proc {pid}: multihost step OK, loss={loss:.5f}", flush=True)
"""


def test_two_process_dcn_train_step(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PYTHONPATH=str(REPO),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coordinator, "2", str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "multihost step OK" in out, out
    # both processes must agree on the loss (same data, psum'd grads)
    losses = [
        line.split("loss=")[1]
        for out in outs
        for line in out.splitlines()
        if "loss=" in line
    ]
    assert len(losses) == 2 and losses[0] == losses[1], losses


def test_main_cli_multihost_train(tmp_path):
    """END-TO-END multi-host CLI: two REAL processes run `main.py
    --multihost` (coordinator from JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID), the trainer builds the hybrid
    (dcn=2, data=4, model=1) mesh, each process contributes its local rows
    of the seeded global batch (_place_batch), and the psum'd losses agree
    across processes."""
    import pickle

    import numpy as np

    root = tmp_path / "data" / "cifar10" / "cifar-10-batches-py"
    root.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(1, 6):
        data = rng.randint(0, 256, (16, 3072), dtype=np.uint8)
        labels = rng.randint(0, 10, (16,)).tolist()
        with open(root / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data, b"labels": labels}, f)

    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(
        "model_params:\n  img_size: 32\n  patch_size: 4\n  in_chans: 3\n"
        "  embed_dim: 32\n  depth: 3\n  num_heads: 4\n  mlp_ratio: 4\n"
        "  qkv_bias: False\n  mlp_time_embed: False\n  num_classes: -1\n"
        "  normalize_timesteps: True\n"
    )

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            PALLAS_AXON_POOL_IPS="",
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            PYTHONPATH=str(REPO),
            JAX_COORDINATOR_ADDRESS=coordinator,
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(subprocess.Popen(
            [
                sys.executable, str(REPO / "main.py"),
                "--config_path", str(cfg),
                "--n_steps", "2",
                "--batch_size", "8",
                "--num_timesteps", "50",
                "--dataset", "cifar10",
                "--data_path", str(tmp_path / "data"),
                # SHARED log dir: orbax checkpoint saves are collectives
                # keyed by the directory; only process 0 writes metrics
                "--log_path", str(tmp_path / "logs"),
                "--exp_name", "mh",
                "--num_warmup_steps", "1",
            ],
            env=env, cwd=str(REPO), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert "dcn" in out, out[-2000:]  # hybrid mesh was built
    # the collective final checkpoint landed in the shared dir
    assert (tmp_path / "logs" / "mh" / "cifar10_uvit_last").exists()
    # both processes must report identical train losses (same global data,
    # psum'd gradients)
    import re as _re

    losses = [
        _re.findall(r"train_loss['\"]?: ([0-9.]+)", out) for out in outs
    ]
    assert losses[0] and losses[0] == losses[1], losses

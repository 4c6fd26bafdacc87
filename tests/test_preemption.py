"""Graceful preemption: SIGTERM mid-training saves full state and exits 0;
--resume continues from the saved step (managed TPU slices are evicted with
SIGTERM + a grace window — the production fault-tolerance path on top of the
reference's corruption-tolerant checkpoint discovery, checkpointer.py:135)."""

import os
import pickle
import re
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parents[1]

TINY_YAML = """model_params:
  img_size: 32
  patch_size: 4
  in_chans: 3
  embed_dim: 32
  depth: 3
  num_heads: 4
  mlp_ratio: 4
  qkv_bias: False
  mlp_time_embed: False
  num_classes: -1
  normalize_timesteps: True
"""


def _write_cifar(data_dir: Path):
    root = data_dir / "cifar10" / "cifar-10-batches-py"
    root.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(1, 6):
        data = rng.randint(0, 256, (32, 3072), dtype=np.uint8)
        with open(root / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data,
                         b"labels": rng.randint(0, 10, (32,)).tolist()}, f)


def _train_cmd(cfg, data, logs, n_steps):
    return [
        sys.executable, "-u", str(REPO / "main.py"),
        "--config_path", str(cfg),
        "--n_steps", str(n_steps),
        "--batch_size", "8",
        "--num_timesteps", "50",
        "--dataset", "cifar10",
        "--data_path", str(data),
        "--log_path", str(logs),
        "--exp_name", "pre",
        "--save_every_n_steps", str(n_steps),  # no periodic saves
        "--resume",
    ]


def test_sigterm_saves_and_resume_continues(tmp_path):
    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(TINY_YAML)
    _write_cifar(tmp_path / "data")
    logs = tmp_path / "logs"

    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        PYTHONPATH=str(REPO),
    )
    proc = subprocess.Popen(
        _train_cmd(cfg, tmp_path / "data", logs, n_steps=100000),
        env=env, cwd=str(REPO), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    # wait for the first logged step, then preempt
    lines = []
    deadline = time.time() + 300
    while time.time() < deadline:
        line = proc.stdout.readline()
        lines.append(line)
        if re.search(r"step\s+\d+ \|", line):
            break
    else:
        proc.kill()
        pytest.fail("no training step within 300s:\n" + "".join(lines))
    proc.send_signal(signal.SIGTERM)
    out_rest, _ = proc.communicate(timeout=300)
    out = "".join(lines) + out_rest
    assert proc.returncode == 0, out
    m = re.search(r"preempted: saved checkpoint at step (\d+)", out)
    assert m, out
    saved_step = int(m.group(1))
    assert saved_step >= 1
    assert (logs / "pre" / "cifar10_uvit_last").exists()

    # resume: picks up at saved_step + 1 and runs to a short horizon
    out2 = subprocess.run(
        _train_cmd(cfg, tmp_path / "data", logs, n_steps=saved_step + 3),
        env=env, cwd=str(REPO), capture_output=True, text=True, timeout=600,
    )
    assert out2.returncode == 0, out2.stdout + out2.stderr
    steps_logged = [
        int(s) for s in re.findall(r"step\s+(\d+) \|", out2.stdout)
    ]
    assert steps_logged and min(steps_logged) == saved_step + 1, out2.stdout

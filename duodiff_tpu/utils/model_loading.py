"""Config+checkpoint -> (model, params) loading shared by the sampler CLIs
(reference sampler.py:270-304, eesampler.py:143-168)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from duodiff_tpu.config import AutoencoderConfig, UViTConfig, load_config
from duodiff_tpu.models.early_exit import init_early_exit_uvit
from duodiff_tpu.models.uvit import init_uvit


def load_model_from_config(
    config_path: str,
    checkpoint_path: Optional[str] = None,
    *,
    early_exit: bool = False,
    dtype=jnp.bfloat16,
    seed: int = 0,
    attn_impl: Optional[str] = None,
    gelu_approx: bool = False,
    qkv_layout: str = "packed",
    use_ema: bool = False,
    int8_scales: Optional[str] = None,
    int8_calibrate: bool = False,
    tp_mesh=None,
) -> Tuple[object, dict, UViTConfig, Optional[AutoencoderConfig]]:
    """Build a (UViT | EarlyExitUViT) from a reference-format YAML and
    optionally load weights from an Orbax dir or torch .pth.

    checkpoint_path=None keeps random init (useful for smoke/perf runs).
    attn_impl=None picks the fused Pallas sublayer kernel on TPU and plain
    XLA elsewhere (and "auto" for the heads layout, whose TP sharding the
    fused kernels would repack); gelu_approx swaps the exact-erf GELU for
    the tanh form (below bf16 rounding; see duodiff_tpu.models.layers.Mlp).
    qkv_layout="heads" stores attention params with an explicit head axis
    for Megatron-style tensor-parallel sampling (models/layers._QKVProj);
    packed checkpoints are converted on load. use_ema loads the EMA shadow
    params from an --ema_decay-trained Orbax checkpoint. int8_scales is a
    tools/calibrate_int8.py JSON — static MLP activation scales for the
    fused_int8 path (requires attn_impl="fused_int8"); int8_calibrate
    builds the calibration forward instead (XLA int8 math that sows the
    MLP activation amaxes — what tools/calibrate_int8.py runs).
    """
    raw = load_config(config_path)
    cfg = UViTConfig.from_dict(raw["model_params"])
    ae_cfg = (
        AutoencoderConfig.from_dict(raw["autoencoder"])
        if "autoencoder" in raw
        else None
    )
    if attn_impl is None:
        attn_impl = (
            "fused"
            if jax.default_backend() == "tpu" and qkv_layout == "packed"
            else "auto"
        )
    scales_tuple = None
    if (int8_scales or int8_calibrate) and attn_impl != "fused_int8":
        raise ValueError(
            "--int8_scales / int8 calibration require --attn_impl "
            f"fused_int8 (got {attn_impl!r})"
        )
    if int8_scales:
        from duodiff_tpu.utils.int8_calib import (
            load_int8_scales,
            scales_dict_to_tuple,
        )

        scales_tuple = scales_dict_to_tuple(
            load_int8_scales(int8_scales), cfg.depth
        )
    init = init_early_exit_uvit if early_exit else init_uvit
    # tp_mesh: --model_parallel sampling with attn_impl=fused — the Blocks
    # run the shard_map sublayers on head-sharded weights (tp_fused.py)
    model, params = init(
        cfg, jax.random.PRNGKey(seed), dtype=dtype,
        attn_impl=attn_impl, gelu_approx=gelu_approx,
        qkv_layout=qkv_layout, int8_mlp_scales=scales_tuple,
        int8_calibrate=int8_calibrate, tp_mesh=tp_mesh,
    )
    if checkpoint_path:
        from duodiff_tpu.training.trainer import load_params_flexible

        load_tree = params
        if qkv_layout == "heads":
            # checkpoints store the reference-packed attention layout; load
            # against a packed template and un-flatten (bit-exact reshapes)
            from duodiff_tpu.utils.param_layout import qkv_heads_to_packed

            load_tree = qkv_heads_to_packed(params, cfg.num_heads)
        params = load_params_flexible(checkpoint_path, load_tree,
                                      use_ema=use_ema)
        if qkv_layout == "heads":
            from duodiff_tpu.utils.param_layout import qkv_packed_to_heads

            params = qkv_packed_to_heads(params, cfg.num_heads)
    return model, params, cfg, ae_cfg

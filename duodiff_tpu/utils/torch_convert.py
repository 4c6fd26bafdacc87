"""One-way PyTorch -> JAX checkpoint converter.

Maps the reference's state-dict names (models/uvit.py, models/early_exit.py)
onto this framework's param tree so released reference checkpoints can be
evaluated for parity. Handles:

  - Linear weight (out, in) -> Dense kernel (in, out) transpose,
  - the Conv2d patch embedding (D, C, p, p) -> flattened-patch matmul kernel
    (p*p*C, D) with (p1, p2, C) input ordering (see models/layers.py:patchify),
  - the 3x3 final conv OIHW -> HWIO,
  - stacked early-exit heads/probes: depth separate torch modules
    (in_blocks_heads / mid_block_head / out_blocks_heads, matrix.{i})
    -> one leading-depth-axis stacked tree,
  - per-timestep probe ModuleDicts (matrix.{t} / matrix.{i, t},
    reference models/early_exit.py:228-239) -> gatherable weight tables.

Only numpy + a torch (CPU) load; tolerates checkpoints wrapped in
{"model_state_dict": ...} (reference sampler.py:290-292).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def load_torch_state_dict(path) -> Dict[str, np.ndarray]:
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "model_state_dict" in state:
        state = state["model_state_dict"]
    return {k: np.asarray(v.detach().cpu().float().numpy()) for k, v in state.items()}


def _linear(sd, prefix) -> dict:
    out = {"kernel": sd[f"{prefix}.weight"].T}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _norm(sd, prefix) -> dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _conv_oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return w.transpose(2, 3, 1, 0)


def _block(sd, prefix, has_skip: bool) -> dict:
    out = {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "attn": {
            "qkv": _linear(sd, f"{prefix}.attn.qkv"),
            "proj": _linear(sd, f"{prefix}.attn.proj"),
        },
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "mlp": {
            "fc1": _linear(sd, f"{prefix}.mlp.fc1"),
            "fc2": _linear(sd, f"{prefix}.mlp.fc2"),
        },
    }
    if has_skip:
        out["skip_linear"] = _linear(sd, f"{prefix}.skip_linear")
    return out


def convert_uvit(sd: Dict[str, np.ndarray], prefix: str = "") -> dict:
    """Reference UViT state dict -> our UViT param tree."""
    p = prefix
    depth_half = 0
    while f"{p}in_blocks.{depth_half}.norm1.weight" in sd:
        depth_half += 1

    params: dict = {}
    # patch embed: conv k=p s=p -> linear over (p1 p2 C) patches
    w = sd[f"{p}patch_embed.proj.weight"]  # (D, C, ph, pw)
    kernel = w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0])  # (ph*pw*C, D)
    params["patch_embed"] = {
        "proj": {"kernel": kernel, "bias": sd[f"{p}patch_embed.proj.bias"]}
    }

    if f"{p}time_embed.0.weight" in sd:
        params["time_embed"] = {
            "fc1": _linear(sd, f"{p}time_embed.0"),
            "fc2": _linear(sd, f"{p}time_embed.2"),
        }
    if f"{p}label_emb.weight" in sd:
        params["label_emb"] = {"embedding": sd[f"{p}label_emb.weight"]}

    params["pos_embed"] = sd[f"{p}pos_embed"]

    for i in range(depth_half):
        params[f"in_blocks_{i}"] = _block(sd, f"{p}in_blocks.{i}", has_skip=False)
    params["mid_block"] = _block(sd, f"{p}mid_block", has_skip=False)
    for i in range(depth_half):
        params[f"out_blocks_{i}"] = _block(
            sd, f"{p}out_blocks.{i}", has_skip=f"{p}out_blocks.{i}.skip_linear.weight" in sd
        )

    params["norm"] = _norm(sd, f"{p}norm")
    params["decoder_pred"] = _linear(sd, f"{p}decoder_pred")
    if f"{p}final_layer.weight" in sd:
        params["final_layer"] = {
            "kernel": _conv_oihw_to_hwio(sd[f"{p}final_layer.weight"]),
            "bias": sd[f"{p}final_layer.bias"],
        }
    return params


def _stack(trees: list) -> Any:
    """Stack a list of identical param trees along a new leading axis."""
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *trees)


def convert_early_exit_uvit(sd: Dict[str, np.ndarray]) -> dict:
    """Reference EarlyExitUViT state dict -> our param tree
    ({uvit, heads (stacked), probes (stacked/tables)})."""
    params = {"uvit": convert_uvit(sd, prefix="uvit.")}

    # ---- output heads, in hs order: in heads, mid head, out heads ----
    def head(prefix: str) -> dict:
        return {
            "norm": _norm(sd, f"{prefix}.norm"),
            "decoder_pred": _linear(sd, f"{prefix}.decoder_pred"),
            "final_layer": {
                "kernel": _conv_oihw_to_hwio(sd[f"{prefix}.final_layer.weight"]),
                "bias": sd[f"{prefix}.final_layer.bias"],
            },
        }

    n_in = 0
    while f"in_blocks_heads.{n_in}.norm.weight" in sd:
        n_in += 1
    heads = [head(f"in_blocks_heads.{i}") for i in range(n_in)]
    heads.append(head("mid_block_head"))
    n_out = 0
    while f"out_blocks_heads.{n_out}.norm.weight" in sd:
        n_out += 1
    heads += [head(f"out_blocks_heads.{i}") for i in range(n_out)]
    params["heads"] = _stack(heads)
    depth = len(heads)

    # ---- probes ----
    # Legacy OldEarlyExitUViT layout (reference models/early_exit.py:83-145):
    # separate in/mid/out classifier ModuleLists instead of the matrix dict.
    if "in_blocks_classifiers.0.classifier.0.weight" in sd or \
       "in_blocks_classifiers.0.q" in sd:
        # Bug-for-bug legacy compatibility: OldEarlyExitUViT.forward reuses
        # the loop variable `classifier` for the mid position (reference
        # models/early_exit.py:171), so the mid probe that actually RUNS is
        # in_blocks_classifiers[-1] and mid_block_classifier's params are
        # dead weights. Mapping the live params here makes converted old
        # checkpoints sample identically to the reference executing them.
        names = (
            [f"in_blocks_classifiers.{i}" for i in range(n_in)]
            + [f"in_blocks_classifiers.{n_in - 1}"]
            + [f"out_blocks_classifiers.{i}" for i in range(n_out)]
        )
        if f"{names[0]}.q" in sd:  # attention probes
            probes = [
                {
                    "q": sd[f"{n}.q"],
                    "weight_kv": _linear(sd, f"{n}.weight_kv"),
                    "cls_fc1": _linear(sd, f"{n}.classification.0"),
                    "cls_fc2": _linear(sd, f"{n}.classification.2"),
                }
                for n in names
            ]
        else:  # per-layer MLP probes
            probes = [
                {
                    "classifier": {
                        "kernel": sd[f"{n}.classifier.0.weight"].T,
                        "bias": sd[f"{n}.classifier.0.bias"],
                    }
                }
                for n in names
            ]
        params["probes"] = _stack(probes)
        return params

    import re

    n_plain_mlp = len(
        {
            m.group(1)
            for k in sd
            for m in [re.match(r"matrix\.(\d+)\.classifier\.0\.weight$", k)]
            if m
        }
    )
    if n_plain_mlp == depth:
        # per-layer MLP probes -> stacked MLPProbe
        probes = [
            {
                "classifier": {
                    "kernel": sd[f"matrix.{i}.classifier.0.weight"].T,
                    "bias": sd[f"matrix.{i}.classifier.0.bias"],
                }
            }
            for i in range(depth)
        ]
        params["probes"] = _stack(probes)
    elif "matrix.0.q" in sd:
        # per-layer attention probes -> stacked AttentionProbe
        probes = [
            {
                "q": sd[f"matrix.{i}.q"],
                "weight_kv": _linear(sd, f"matrix.{i}.weight_kv"),
                "cls_fc1": _linear(sd, f"matrix.{i}.classification.0"),
                "cls_fc2": _linear(sd, f"matrix.{i}.classification.2"),
            }
            for i in range(depth)
        ]
        params["probes"] = _stack(probes)
    elif "matrix.0, 0.classifier.0.weight" in sd:
        # per-layer-per-timestep table (depth, T, D) / (depth, T, 1)
        T = 1000
        w = np.stack(
            [
                np.stack([sd[f"matrix.{i}, {t}.classifier.0.weight"][0] for t in range(T)])
                for i in range(depth)
            ]
        )
        b = np.stack(
            [
                np.stack([sd[f"matrix.{i}, {t}.classifier.0.bias"] for t in range(T)])
                for i in range(depth)
            ]
        )
        params["probes"] = {"weight": w, "bias": b}
    elif n_plain_mlp >= 1000:
        # per-timestep table (T, D) / (T, 1)
        T = 1000
        w = np.stack([sd[f"matrix.{t}.classifier.0.weight"][0] for t in range(T)])
        b = np.stack([sd[f"matrix.{t}.classifier.0.bias"] for t in range(T)])
        params["probes"] = {"weight": w, "bias": b}
    else:
        raise ValueError("could not identify probe type in checkpoint")
    return params


def convert_torch_checkpoint(path, template: Any) -> Any:
    """Convert a reference .pth checkpoint into a params pytree matching
    ``template`` (structure-validated, leaves cast to template dtypes)."""
    import jax
    import jax.numpy as jnp

    sd = load_torch_state_dict(path)
    if any(k.startswith("uvit.") for k in sd):
        converted = convert_early_exit_uvit(sd)
        if "uvit" not in template:  # caller wants the backbone only
            converted = converted["uvit"]
    else:
        converted = convert_uvit(sd)

    ts = jax.tree_util.tree_structure(template)
    cs = jax.tree_util.tree_structure(converted)
    if ts != cs:
        raise ValueError(
            f"converted checkpoint does not match model structure:\n{cs}\nvs\n{ts}"
        )

    def cast(c, t):
        c = jnp.asarray(c)
        if c.shape != t.shape:
            raise ValueError(f"shape mismatch: checkpoint {c.shape} vs model {t.shape}")
        return c.astype(t.dtype)

    return jax.tree_util.tree_map(cast, converted, template)


# ---------------------------------------------------------------------------
# Frozen KL autoencoder (reference models/utils/autoencoder.py:203-516)
# ---------------------------------------------------------------------------


def _conv(sd, prefix) -> dict:
    out = {"kernel": _conv_oihw_to_hwio(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _gn(sd, prefix) -> dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _resnet_block(sd, prefix) -> dict:
    out = {
        "norm1": _gn(sd, f"{prefix}.norm1"),
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "norm2": _gn(sd, f"{prefix}.norm2"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.nin_shortcut.weight" in sd:
        out["nin_shortcut"] = _conv(sd, f"{prefix}.nin_shortcut")
    return out


def _attn_block(sd, prefix) -> dict:
    return {
        "norm": _gn(sd, f"{prefix}.norm"),
        "q": _conv(sd, f"{prefix}.q"),
        "k": _conv(sd, f"{prefix}.k"),
        "v": _conv(sd, f"{prefix}.v"),
        "proj_out": _conv(sd, f"{prefix}.proj_out"),
    }


def _coder(sd, side: str, is_encoder: bool) -> dict:
    """encoder.down.{i}.block.{j} / decoder.up.{i}.block.{j} -> flat names."""
    out = {
        "conv_in": _conv(sd, f"{side}.conv_in"),
        "mid_block_1": _resnet_block(sd, f"{side}.mid.block_1"),
        "mid_attn_1": _attn_block(sd, f"{side}.mid.attn_1"),
        "mid_block_2": _resnet_block(sd, f"{side}.mid.block_2"),
        "norm_out": _gn(sd, f"{side}.norm_out"),
        "conv_out": _conv(sd, f"{side}.conv_out"),
    }
    group = "down" if is_encoder else "up"
    i = 0
    while f"{side}.{group}.{i}.block.0.norm1.weight" in sd:
        j = 0
        while f"{side}.{group}.{i}.block.{j}.norm1.weight" in sd:
            out[f"{group}_{i}_block_{j}"] = _resnet_block(
                sd, f"{side}.{group}.{i}.block.{j}"
            )
            j += 1
        if f"{side}.{group}.{i}.downsample.conv.weight" in sd:
            out[f"{group}_{i}_downsample"] = {
                "conv": _conv(sd, f"{side}.{group}.{i}.downsample.conv")
            }
        if f"{side}.{group}.{i}.upsample.conv.weight" in sd:
            out[f"{group}_{i}_upsample"] = {
                "conv": _conv(sd, f"{side}.{group}.{i}.upsample.conv")
            }
        i += 1
    return out


def convert_autoencoder_checkpoint(path, template: Any) -> Any:
    """Reference FrozenAutoencoderKL .pth -> our param tree."""
    import jax
    import jax.numpy as jnp

    sd = load_torch_state_dict(path)
    converted = {
        "encoder": _coder(sd, "encoder", is_encoder=True),
        "decoder": _coder(sd, "decoder", is_encoder=False),
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }
    ts = jax.tree_util.tree_structure(template)
    cs = jax.tree_util.tree_structure(converted)
    if ts != cs:
        raise ValueError(
            f"converted autoencoder does not match model structure:\n{cs}\nvs\n{ts}"
        )

    def cast(c, t):
        c = jnp.asarray(c)
        if c.shape != t.shape:
            raise ValueError(f"shape mismatch: {c.shape} vs {t.shape}")
        return c.astype(t.dtype)

    return jax.tree_util.tree_map(cast, converted, template)

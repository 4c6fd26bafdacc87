"""JAX -> PyTorch checkpoint exporter (inverse of torch_convert).

Maps this framework's param trees back onto the reference's state-dict
names (reference models/uvit.py, models/early_exit.py) so models trained
here can be loaded by the reference CLIs (``strict=True``) — the reverse
half of the migration surface. Exact inverses of torch_convert:

  - Dense kernel (in, out) -> Linear weight (out, in),
  - flattened-patch matmul kernel (p*p*C, D) with (p1, p2, C) ordering
    -> Conv2d patch embedding (D, C, p, p),
  - final 3x3 conv HWIO -> OIHW,
  - stacked early-exit heads/probes (leading depth axis)
    -> depth separate torch modules (in_blocks_heads.{i} / mid_block_head /
    out_blocks_heads.{i}, matrix.{i}),
  - gatherable per-timestep probe tables -> matrix.{t} / matrix.{i, t}
    ModuleDict entries (reference models/early_exit.py:228-239).

Attention params stored in the "heads" layout (tensor-parallel training,
utils/param_layout.py) are flattened back to the reference's packed qkv
Linear first (bit-exact reshapes). Round-trip guarantee is tested both
ways: convert(export(params)) == params, and the reference modules load
the exported dict with strict=True and produce matching forwards
(tests/test_torch_export.py).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    """Leaf -> float32 numpy (torch tensors are fp32 in reference ckpts)."""
    return np.asarray(x, dtype=np.float32)


def _linear(out: dict, node: Mapping, prefix: str) -> None:
    out[f"{prefix}.weight"] = _np(node["kernel"]).T
    if "bias" in node:
        out[f"{prefix}.bias"] = _np(node["bias"])


def _norm(out: dict, node: Mapping, prefix: str) -> None:
    out[f"{prefix}.weight"] = _np(node["scale"])
    out[f"{prefix}.bias"] = _np(node["bias"])


def _conv_hwio_to_oihw(out: dict, node: Mapping, prefix: str) -> None:
    out[f"{prefix}.weight"] = _np(node["kernel"]).transpose(3, 2, 0, 1)
    out[f"{prefix}.bias"] = _np(node["bias"])


def _block(out: dict, node: Mapping, prefix: str) -> None:
    _norm(out, node["norm1"], f"{prefix}.norm1")
    _linear(out, node["attn"]["qkv"], f"{prefix}.attn.qkv")
    _linear(out, node["attn"]["proj"], f"{prefix}.attn.proj")
    _norm(out, node["norm2"], f"{prefix}.norm2")
    _linear(out, node["mlp"]["fc1"], f"{prefix}.mlp.fc1")
    _linear(out, node["mlp"]["fc2"], f"{prefix}.mlp.fc2")
    if "skip_linear" in node:
        _linear(out, node["skip_linear"], f"{prefix}.skip_linear")


def _normalize_layout(params: Mapping) -> Mapping:
    """heads-layout attention params -> packed (no-op if already packed)."""
    from duodiff_tpu.utils.param_layout import qkv_heads_to_packed

    return qkv_heads_to_packed(params, num_heads=0)


def export_uvit(
    params: Mapping, prefix: str = "", in_chans: int | None = None
) -> Dict[str, np.ndarray]:
    """Our UViT param tree -> reference UViT state-dict names
    (reference models/uvit.py:228-349)."""
    params = _normalize_layout(params)
    p = prefix
    sd: Dict[str, np.ndarray] = {}

    # patch embed: (ph*pw*C, D) matmul kernel -> Conv2d (D, C, ph, pw).
    # patch_size is recoverable from pos_embed/decoder_pred only ambiguously,
    # so derive it from the kernel: rows = ph*pw*C with ph == pw.
    kernel = _np(params["patch_embed"]["proj"]["kernel"])
    d = kernel.shape[1]
    final = params.get("final_layer")
    if final is not None:
        in_chans = _np(final["kernel"]).shape[3]
    elif in_chans is None:
        raise ValueError(
            "conv=False model: pass in_chans= (not derivable from params)"
        )
    ph = int(round((kernel.shape[0] // in_chans) ** 0.5))
    assert ph * ph * in_chans == kernel.shape[0], (
        f"patch kernel rows {kernel.shape[0]} != p*p*{in_chans}"
    )
    sd[f"{p}patch_embed.proj.weight"] = (
        kernel.reshape(ph, ph, in_chans, d).transpose(3, 2, 0, 1)
    )
    sd[f"{p}patch_embed.proj.bias"] = _np(params["patch_embed"]["proj"]["bias"])

    if "time_embed" in params:
        _linear(sd, params["time_embed"]["fc1"], f"{p}time_embed.0")
        _linear(sd, params["time_embed"]["fc2"], f"{p}time_embed.2")
    if "label_emb" in params:
        sd[f"{p}label_emb.weight"] = _np(params["label_emb"]["embedding"])

    sd[f"{p}pos_embed"] = _np(params["pos_embed"])

    i = 0
    while f"in_blocks_{i}" in params:
        _block(sd, params[f"in_blocks_{i}"], f"{p}in_blocks.{i}")
        i += 1
    _block(sd, params["mid_block"], f"{p}mid_block")
    i = 0
    while f"out_blocks_{i}" in params:
        _block(sd, params[f"out_blocks_{i}"], f"{p}out_blocks.{i}")
        i += 1

    _norm(sd, params["norm"], f"{p}norm")
    _linear(sd, params["decoder_pred"], f"{p}decoder_pred")
    if final is not None:
        _conv_hwio_to_oihw(sd, final, f"{p}final_layer")
    return sd


def _unstack(tree: Any, depth: int) -> list:
    """Inverse of torch_convert._stack: leading-axis slices as trees."""
    import jax

    return [
        jax.tree_util.tree_map(lambda x: _np(x)[i], tree) for i in range(depth)
    ]


def export_early_exit_uvit(
    params: Mapping, in_chans: int | None = None
) -> Dict[str, np.ndarray]:
    """Our EarlyExitUViT tree ({uvit, heads, probes}) -> reference
    EarlyExitUViT state-dict names (reference models/early_exit.py:193-266).
    The probe format (stacked modules vs timestep tables) determines the
    classifier_type the exported dict loads into."""
    sd = export_uvit(
        params["uvit"], prefix="uvit.", in_chans=in_chans
    )

    heads = params["heads"]
    depth = int(np.shape(heads["norm"]["scale"])[0])
    n_in = depth // 2  # reference: depth//2 in-heads, 1 mid, depth//2 out
    names = (
        [f"in_blocks_heads.{i}" for i in range(n_in)]
        + ["mid_block_head"]
        + [f"out_blocks_heads.{i}" for i in range(depth - n_in - 1)]
    )
    for name, head in zip(names, _unstack(heads, depth)):
        _norm(sd, head["norm"], f"{name}.norm")
        _linear(sd, head["decoder_pred"], f"{name}.decoder_pred")
        _conv_hwio_to_oihw(sd, head["final_layer"], f"{name}.final_layer")

    probes = params["probes"]
    if "classifier" in probes:  # stacked MLPProbe (mlp_probe_per_layer)
        for i, probe in enumerate(_unstack(probes, depth)):
            _linear(sd, probe["classifier"], f"matrix.{i}.classifier.0")
    elif "q" in probes:  # stacked AttentionProbe
        for i, probe in enumerate(_unstack(probes, depth)):
            sd[f"matrix.{i}.q"] = probe["q"]
            _linear(sd, probe["weight_kv"], f"matrix.{i}.weight_kv")
            _linear(sd, probe["cls_fc1"], f"matrix.{i}.classification.0")
            _linear(sd, probe["cls_fc2"], f"matrix.{i}.classification.2")
    elif "weight" in probes:  # per-timestep tables
        w, b = _np(probes["weight"]), _np(probes["bias"])
        if w.ndim == 3:  # (depth, T, D): mlp_probe_per_layer_per_timestep
            for i in range(w.shape[0]):
                for t in range(w.shape[1]):
                    sd[f"matrix.{i}, {t}.classifier.0.weight"] = w[i, t][None]
                    sd[f"matrix.{i}, {t}.classifier.0.bias"] = b[i, t]
        else:  # (T, D): mlp_probe_per_timestep
            for t in range(w.shape[0]):
                sd[f"matrix.{t}.classifier.0.weight"] = w[t][None]
                sd[f"matrix.{t}.classifier.0.bias"] = b[t]
    else:
        raise ValueError(f"unrecognized probe tree keys: {list(probes)}")
    return sd


def export_torch_checkpoint(
    params: Mapping, path, in_chans: int | None = None
) -> None:
    """Write ``params`` as a reference-loadable ``.pth``. Wrapped as
    {"model_state_dict": ...} — both reference load paths accept it
    (reference sampler.py:290-292, checkpointer.py:80-133). ``in_chans``
    is only needed for conv=False models (no final_layer to derive it
    from); tools/export_torch.py passes the config value."""
    import torch

    export = export_early_exit_uvit if "uvit" in params else export_uvit
    sd = {k: torch.from_numpy(np.array(v, dtype=np.float32, copy=True))
          for k, v in export(params, in_chans=in_chans).items()}
    torch.save({"model_state_dict": sd}, path)

"""Attention parameter layout conversion (packed <-> heads).

The attention projections have two equivalent storage layouts
(duodiff_tpu/models/layers.py `_QKVProj`/`_OutProj`):

  - "packed": qkv kernel (D, 3D) K-major / proj kernel (D, D) — matches the
    reference's packed Linear (reference models/uvit.py:150) and is what the
    torch converter and the fused Pallas kernels use. Single-chip default.
  - "heads": qkv kernel (D, 3, H, Dh) / qkv bias (3, H, Dh) / proj kernel
    (H, Dh, D) — the same values un-flattened so tensor parallelism shards
    the explicit head axis (Megatron-style, parallel/mesh.py rules).

These helpers convert a parameter pytree between the layouts (pure
reshapes, bit-identical values) so checkpoints trained in one layout load
into a model built with the other.
"""

from __future__ import annotations

from typing import Mapping


def _convert(params, num_heads: int, to_heads: bool):
    def walk(node, under_attn: bool = False):
        if not isinstance(node, Mapping):
            return node
        out = {}
        for k, v in node.items():
            if under_attn and k == "qkv" and isinstance(v, Mapping):
                out[k] = _convert_qkv(v, num_heads, to_heads)
            elif under_attn and k == "proj" and isinstance(v, Mapping):
                out[k] = _convert_proj(v, num_heads, to_heads)
            else:
                out[k] = walk(v, under_attn=(k == "attn"))
        return out

    return walk(params)


def _convert_qkv(node, h: int, to_heads: bool):
    out = dict(node)
    kernel = node["kernel"]
    if to_heads:
        if kernel.ndim == 2:  # (D, 3D) -> (D, 3, H, Dh)
            d = kernel.shape[0]
            out["kernel"] = kernel.reshape(d, 3, h, d // h)
            if "bias" in node:
                out["bias"] = node["bias"].reshape(3, h, d // h)
    else:
        if kernel.ndim == 4:  # (D, 3, H, Dh) -> (D, 3D)
            d = kernel.shape[0]
            out["kernel"] = kernel.reshape(d, 3 * d)
            if "bias" in node:
                out["bias"] = node["bias"].reshape(3 * d)
    return out


def _convert_proj(node, h: int, to_heads: bool):
    out = dict(node)
    kernel = node["kernel"]
    if to_heads:
        if kernel.ndim == 2:  # (D, D) -> (H, Dh, D)
            d = kernel.shape[0]
            out["kernel"] = kernel.reshape(h, d // h, d)
    else:
        if kernel.ndim == 3:  # (H, Dh, D) -> (D, D)
            d = kernel.shape[2]
            out["kernel"] = kernel.reshape(d, d)
    return out


def qkv_packed_to_heads(params, num_heads: int):
    """packed-layout attention params -> heads layout (pure reshapes)."""
    return _convert(params, num_heads, to_heads=True)


def qkv_heads_to_packed(params, num_heads: int):
    """heads-layout attention params -> packed layout (pure reshapes).
    (``num_heads`` is unused in this direction; kept for symmetry.)"""
    return _convert(params, num_heads, to_heads=False)


def _find_qkv_kernel(params):
    """First attn/qkv kernel in the tree, or None."""
    if not isinstance(params, Mapping):
        return None
    for k, v in params.items():
        if k == "attn" and isinstance(v, Mapping):
            qkv = v.get("qkv")
            if isinstance(qkv, Mapping) and "kernel" in qkv:
                return qkv["kernel"]
        found = _find_qkv_kernel(v)
        if found is not None:
            return found
    return None


def match_attention_layout(params, template):
    """Convert ``params``' attention layout (packed or heads) to whatever
    layout ``template`` uses. Checkpoints saved by --model_parallel training
    store the heads layout; single-chip checkpoints (and all torch converts)
    store packed — loaders must accept either regardless of how the
    in-memory model was built. No-op when the layouts already agree."""
    t_kernel = _find_qkv_kernel(template)
    p_kernel = _find_qkv_kernel(params)
    if t_kernel is None or p_kernel is None:
        return params
    if p_kernel.ndim == t_kernel.ndim:
        return params
    if t_kernel.ndim == 4:  # template is heads: (D, 3, H, Dh)
        return qkv_packed_to_heads(params, num_heads=t_kernel.shape[2])
    return qkv_heads_to_packed(params, num_heads=0)

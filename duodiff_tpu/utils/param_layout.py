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
    """heads-layout attention params -> packed layout (pure reshapes)."""
    return _convert(params, num_heads, to_heads=False)

"""Attention compute ops.

The reference runs ``torch.nn.functional.scaled_dot_product_attention`` with
q/k/v cast to float32 (models/uvit.py:155-168). Here the same math runs
either as plain XLA (which fuses well at U-ViT's sequence lengths of 65-257
tokens) or as a Pallas flash-attention kernel on TPU
(duodiff_tpu/ops/pallas_attention.py).

Numerics policy: softmax(QK^T / sqrt(d)) is always accumulated in float32
regardless of the activation dtype — this mirrors the reference's fp32 SDPA
cast and keeps bf16 sample quality (SURVEY.md §7 "bf16 numerics").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def xla_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Plain-XLA scaled dot-product attention.

    Args:
      q, k, v: (B, H, L, Dh) arrays (any float dtype; accumulation is fp32).
    Returns:
      (B, H, L, Dh) in fp32.
    """
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, dtype=jnp.float32))
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd",
        weights.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(jnp.float32)


def multi_head_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, *, impl: str = "auto"
) -> jax.Array:
    """Dispatch between the Pallas TPU kernel and the XLA fallback.

    impl:
      - "xla" / "auto": plain XLA (fuses well, runs on any backend).
      - "pallas": the single-pass VMEM-resident kernel with a Pallas
        recompute-softmax backward — grad-safe, so usable for training and
        sampling on TPU (duodiff_tpu/ops/pallas_attention.py). Runs in
        interpret mode off-TPU.
    """
    if impl == "pallas":
        from duodiff_tpu.ops.pallas_attention import flash_attention_trainable

        return flash_attention_trainable(
            q, k, v, jax.default_backend() != "tpu"
        )
    return xla_attention(q, k, v)

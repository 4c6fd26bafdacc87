"""Pallas TPU attention kernel for U-ViT sequence lengths.

U-ViT attends over 65-1025 tokens (1-2 extra tokens + <=1024 patches;
reference models/uvit.py:262,281-283), so an entire (L, L) score matrix for
one (batch, head) pair fits comfortably in VMEM. The kernel therefore runs
one single-pass block per (batch*head): QK^T on the MXU with fp32
accumulation, fp32 softmax on the VPU, PV on the MXU — never materializing
the score matrix in HBM (the XLA fallback may), and matching the
reference's fp32-softmax numerics (models/uvit.py:161).

For longer sequences this would become a standard flash (tiled, online
softmax) kernel; at U-ViT sizes the untiled form is both simpler and faster.
Used for inference/sampling paths; the training path keeps XLA attention
(which has a fused backward) unless explicitly opted in.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # (L, Dh)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """Scaled dot-product attention.

    Args:
      q, k, v: (B, H, L, Dh).
    Returns:
      (B, H, L, Dh) in q's dtype (fp32 softmax internally).
    """
    b, h, l, dh = q.shape
    scale = float(dh) ** -0.5

    def flat(x):
        return x.reshape(b * h, l, dh)

    spec = pl.BlockSpec((1, l, dh), lambda i: (i, 0, 0))

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        # write outputs in the activation dtype (bf16 on the hot path) —
        # halves the HBM write vs fp32; the softmax itself stays fp32
        out_shape=jax.ShapeDtypeStruct((b * h, l, dh), q.dtype),
        grid=(b * h,),
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((1, l, dh), lambda i: (i, 0, 0)),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * l * l * dh,
            bytes_accessed=3 * b * h * l * dh * q.dtype.itemsize
            + b * h * l * dh * 4,
            transcendentals=b * h * l * l,
        ),
        interpret=interpret,
    )(flat(q), flat(k), flat(v))
    return out.reshape(b, h, l, dh)

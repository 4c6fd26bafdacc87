"""U-ViT building blocks in Flax.

TPU-first redesign of the reference's torch modules (models/uvit.py:69-225):
images are NHWC (XLA's native TPU conv layout), the patch embedding is a
reshape + matmul instead of a strided conv (identical math, lands directly on
the MXU), and attention runs through duodiff_tpu.ops with fp32 softmax.
Activations run in ``dtype`` (bf16 for speed); parameters are always fp32.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from duodiff_tpu.ops import multi_head_attention

# Matches torch trunc_normal_(std=0.02) used for every Linear kernel and the
# positional embedding (reference models/uvit.py:335-345).
trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


def timestep_embedding(timesteps: jax.Array, dim: int, max_period: int = 10000):
    """Sinusoidal timestep embeddings, cos-first ordering
    (reference models/uvit.py:95-115).

    Args:
      timesteps: (B,) possibly-fractional timestep values.
      dim: embedding width.
    Returns:
      (B, dim) float32 embeddings.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding


def patchify(imgs: jax.Array, patch_size: int) -> jax.Array:
    """NHWC image -> (B, h*w, p*p*C) patch tokens.

    Token ordering matches the reference's
    ``B C (h p1) (w p2) -> B (h w) (p1 p2 C)`` (models/uvit.py:118-122).
    """
    b, hh, ww, c = imgs.shape
    p = patch_size
    h, w = hh // p, ww // p
    x = imgs.reshape(b, h, p, w, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, h, w, p1, p2, C)
    return x.reshape(b, h * w, p * p * c)


def unpatchify(x: jax.Array, channels: int = 3) -> jax.Array:
    """(B, L, p*p*C) patch tokens -> NHWC image (reference models/uvit.py:125-132)."""
    b, num_patches, patch_dim = x.shape
    p = int((patch_dim // channels) ** 0.5)
    h = w = int(num_patches**0.5)
    assert h * w == num_patches and p * p * channels == patch_dim
    x = x.reshape(b, h, w, p, p, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, h, p1, w, p2, C)
    return x.reshape(b, h * p, w * p, channels)


class Mlp(nn.Module):
    """Two-layer GELU MLP (reference models/uvit.py:69-92; drop=0 everywhere).

    ``gelu_approx`` swaps the exact-erf GELU (torch nn.GELU default) for the
    tanh approximation — a sampling-path perf knob: on TPU the erf polynomial
    is VPU-bound and costs ~0.7ms per block at CelebA-64 batch 128, while the
    tanh form is free (hidden in the matmul pipeline); the difference is
    below bf16 rounding. Default False for reference parity.
    """

    hidden_features: int
    out_features: int
    dtype: jnp.dtype = jnp.float32
    gelu_approx: bool = False
    in_features: int = 0  # only needed when called with raw=True

    @nn.compact
    def __call__(self, x, raw: bool = False):
        if raw:  # fused-kernel path: declare identical params, no compute
            k1, b1 = _DenseParams(self.in_features, self.hidden_features,
                                  name="fc1")()
            k2, b2 = _DenseParams(self.hidden_features, self.out_features,
                                  name="fc2")()
            return (k1, b1), (k2, b2)
        x = nn.Dense(
            self.hidden_features,
            dtype=self.dtype,
            kernel_init=trunc_normal_init,
            name="fc1",
        )(x)
        x = nn.gelu(x, approximate=self.gelu_approx)
        x = nn.Dense(
            self.out_features,
            dtype=self.dtype,
            kernel_init=trunc_normal_init,
            name="fc2",
        )(x)
        return x


class _DenseParams(nn.Module):
    """Declares nn.Dense's kernel/bias (same names, shapes, inits) for
    handing raw params to the fused sublayer kernels."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", trunc_normal_init, (self.in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _QKVProj(nn.Module):
    """Packed QKV projection emitting (3, B, H, L, Dh) straight out of the
    matmul epilogue (einsum output indexing), so no standalone relayout copy
    is needed between the projection and the attention kernel — profiling
    showed those copies cost ~20% of a sampling step.

    qkv_layout selects the PARAMETER STORAGE (the math is identical):
      - "packed": kernel (D, 3D) with K-major column packing
        "B L (K H D)", matching the reference packed Linear
        (reference models/uvit.py:150,159). The single-chip default.
      - "heads": kernel (D, 3, H, Dh) — the same values un-flattened. Under
        tensor parallelism GSPMD can shard the explicit H axis
        (P(None, None, "model", None)), giving each device whole heads with
        their q, k AND v columns (Megatron-style); a column shard of the
        packed (D, 3D) layout crosses the q/k/v boundaries, so GSPMD must
        all-gather the weight instead.
    """

    num_heads: int
    use_bias: bool
    dtype: jnp.dtype
    features: int = 0  # embed dim; only needed when called with raw=True
    qkv_layout: str = "packed"

    @nn.compact
    def __call__(self, x, raw: bool = False):
        d = x.shape[-1] if x is not None else self.features
        h = self.num_heads
        head_dim = d // h
        if self.qkv_layout == "heads":
            kernel = self.param(
                "kernel", trunc_normal_init, (d, 3, h, head_dim)
            )
            raw_bias = (
                self.param("bias", nn.initializers.zeros, (3, h, head_dim))
                if self.use_bias
                else None
            )
        else:
            kernel = self.param("kernel", trunc_normal_init, (d, 3 * d))
            raw_bias = (
                self.param("bias", nn.initializers.zeros, (3 * d,))
                if self.use_bias
                else None
            )
        if raw:  # fused-kernel path: hand the raw params to pallas_block
            if raw == "heads":
                # TP shard_map path (parallel/tp_fused.py): the un-reshaped
                # (D, 3, H, Dh) kernel, so the H axis stays shardable
                assert self.qkv_layout == "heads", self.qkv_layout
                return kernel, raw_bias
            if self.qkv_layout == "heads":
                # (D, 3, H, Dh) -> (D, 3D) is exactly the K-major packing;
                # free single-chip (replicated params), an all-gather under
                # TP — use the raw="heads" shard_map path there
                return kernel.reshape(d, 3 * d), (
                    raw_bias.reshape(3 * d) if raw_bias is not None else None
                )
            return kernel, raw_bias
        if self.qkv_layout == "heads":
            w = kernel.astype(self.dtype)
            bias = (
                raw_bias.astype(self.dtype)[:, :, None, :]
                if self.use_bias
                else None
            )
        else:
            w = kernel.astype(self.dtype).reshape(d, 3, h, head_dim)
            bias = (
                raw_bias.astype(self.dtype).reshape(3, h, 1, head_dim)
                if self.use_bias
                else None
            )
        x = x.astype(self.dtype)
        # three separate einsums so q/k/v land in their own buffers — slicing
        # one stacked (3,B,H,L,Dh) output forced XLA to materialize a copy of
        # each slice for the attention kernel's custom-call operands
        # (~1.3 GB/step at CelebA-64 batch 128)
        outs = []
        for i in range(3):
            o = jnp.einsum("bld,dhe->bhle", x, w[:, i])  # (B, H, L, Dh)
            if bias is not None:
                o = o + bias[i]
            outs.append(o)
        return tuple(outs)


class _OutProj(nn.Module):
    """Output projection consuming (B, H, L, Dh) directly (the head-merge
    transpose folds into the matmul). Params match Linear(D, D) in the
    "packed" layout; "heads" stores the same values as (H, Dh, D) so the H
    axis shards under tensor parallelism (row-parallel: GSPMD inserts the
    psum after the contraction)."""

    num_heads: int
    dtype: jnp.dtype
    features: int = 0  # embed dim; only needed when called with raw=True
    qkv_layout: str = "packed"

    @nn.compact
    def __call__(self, a, raw: bool = False):
        d = (
            a.shape[1] * a.shape[3] if a is not None else self.features
        )
        h = self.num_heads
        if self.qkv_layout == "heads":
            kernel = self.param("kernel", trunc_normal_init, (h, d // h, d))
        else:
            kernel = self.param("kernel", trunc_normal_init, (d, d))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        if raw:  # fused-kernel path
            if raw == "heads":
                assert self.qkv_layout == "heads", self.qkv_layout
                return kernel, bias  # (H, Dh, D) un-reshaped for shard_map
            if self.qkv_layout == "heads":
                return kernel.reshape(d, d), bias
            return kernel, bias
        w = (
            kernel.astype(self.dtype)
            if self.qkv_layout == "heads"
            else kernel.astype(self.dtype).reshape(h, d // h, d)
        )
        out = jnp.einsum("bhle,hed->bld", a.astype(self.dtype), w)
        return out + bias.astype(self.dtype)


class Attention(nn.Module):
    """Multi-head self-attention with packed QKV projection
    (reference models/uvit.py:135-168).

    The reference computes ``self.scale`` but never passes it to SDPA, so the
    effective scale is always head_dim**-0.5 — replicated here.
    Softmax always accumulates in fp32 (the reference casts qkv to float).
    """

    num_heads: int
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    features: int = 0  # embed dim; only needed when called with raw=True
    qkv_layout: str = "packed"

    @nn.compact
    def __call__(self, x, raw: bool = False):
        qkv = _QKVProj(
            num_heads=self.num_heads,
            use_bias=self.qkv_bias,
            dtype=self.dtype,
            features=self.features,
            qkv_layout=self.qkv_layout,
            name="qkv",
        )
        proj = _OutProj(
            num_heads=self.num_heads,
            dtype=self.dtype,
            features=self.features,
            qkv_layout=self.qkv_layout,
            name="proj",
        )
        if raw:  # fused-kernel path: raw (qkv, proj) params, no compute
            return qkv(None, raw=raw), proj(None, raw=raw)
        q, k, v = qkv(x)  # 3 x (B, H, L, Dh)
        out = multi_head_attention(q, k, v, impl=self.attn_impl)
        return proj(out.astype(self.dtype))


class Block(nn.Module):
    """Pre-norm transformer block with optional long-skip input
    (reference models/uvit.py:171-208):

      x = skip_linear(concat(x, skip))     # out-blocks only
      x = x + attn(norm1(x))
      x = x + mlp(norm2(x))
    """

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    skip: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    gelu_approx: bool = False
    # MLP sublayer impl when attn_impl != "fused" (the fused attention path
    # always pairs with the fused MLP kernel): "auto"/"xla" = plain
    # Dense/gelu/Dense (measured faster alongside the unfused attention
    # paths: 117.8 vs 119.7 ms/step at CelebA-64 batch 128 with
    # attn_impl="pallas"); "fused" = the fused MLP kernel + Pallas backward.
    mlp_impl: str = "auto"
    qkv_layout: str = "packed"
    # fused_int8 only: calibrated (post-LN amax, post-GELU amax) for this
    # block's MLP sublayer — switches its activation quantization from
    # dynamic per-row to static scales (tools/calibrate_int8.py; 11% faster
    # per MLP call, tools/probe_int8_static.py). Attention stays dynamic
    # (measured no win there).
    int8_mlp_scales: Optional[tuple] = None
    # fused_int8 only: run the XLA reference int8 math and sow the MLP
    # activation amaxes into the "int8_calib" collection (the calibration
    # forward — no Pallas, works on CPU).
    int8_calibrate: bool = False
    # Tensor parallelism x fused kernels: when a mesh with a >1 "model"
    # axis is passed (and qkv_layout == "heads"), attn_impl "fused" runs
    # the sublayer kernels inside shard_map on head-/hidden-sharded weight
    # shards — no per-step weight repack/all-gather (parallel/tp_fused.py).
    tp_mesh: Optional[jax.sharding.Mesh] = None
    tp_axis: str = "model"

    @nn.compact
    def __call__(self, x, skip: Optional[jax.Array] = None):
        d = x.shape[-1]
        if self.skip:
            assert skip is not None
            x = nn.Dense(
                d,
                dtype=self.dtype,
                kernel_init=trunc_normal_init,
                name="skip_linear",
            )(jnp.concatenate([x, skip], axis=-1))
        attn = Attention(
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            features=d,
            qkv_layout=self.qkv_layout,
            name="attn",
        )
        mlp = Mlp(
            hidden_features=int(d * self.mlp_ratio),
            out_features=d,
            dtype=self.dtype,
            gelu_approx=self.gelu_approx,
            in_features=d,
            name="mlp",
        )
        # Fused sublayers are single Pallas kernels
        # (duodiff_tpu/ops/pallas_block.py); the param tree is identical to
        # the unfused path (the submodules declare, raw=True returns). The
        # fused attention path always pairs with the fused MLP kernel: two
        # kernels per block, not the merged fused_block — measured 5.11 vs
        # 5.05 samples/sec at CelebA-64 batch 128 (the block in/out round
        # trips are already hidden behind async DMA, and shorter programs
        # pipeline better).
        interpret = jax.default_backend() != "tpu"
        if self.attn_impl == "fused_int8":
            # W8A8 sampling path (opt-in, value-changing — no VJP): same
            # param tree, int8 weight matmuls (ops/pallas_block_int8.py)
            from duodiff_tpu.ops.pallas_block_int8 import (
                attn_sublayer_int8_xla,
                fused_attn_sublayer_int8,
                fused_mlp_sublayer_int8,
                mlp_sublayer_int8_calib,
            )

            ln_scale, ln_bias = _LNParams(name="norm1")(d)
            (wqkv, bqkv), (wp, bp) = attn(None, raw=True)
            ln2_scale, ln2_bias = _LNParams(name="norm2")(d)
            (w1, b1), (w2, b2) = mlp(None, raw=True)
            if self.int8_calibrate:
                x = attn_sublayer_int8_xla(
                    x.astype(self.dtype), ln_scale, ln_bias, wqkv, bqkv,
                    wp, bp, num_heads=self.num_heads, eps=1e-5,
                )
                out, ax, ah, (xr, hr) = mlp_sublayer_int8_calib(
                    x.astype(self.dtype), ln2_scale, ln2_bias, w1, b1,
                    w2, b2, eps=1e-5, gelu_approx=self.gelu_approx,
                    with_rows=True,
                )
                self.sow("int8_calib", "mlp_amax", jnp.stack([ax, ah]))
                # per-token amaxes for the percentile / clip-search
                # calibration modes (utils/int8_calib.py)
                self.sow(
                    "int8_calib", "mlp_rowamax",
                    jnp.stack([xr.reshape(-1), hr.reshape(-1)]),
                )
                return out
            x = fused_attn_sublayer_int8(
                x.astype(self.dtype), ln_scale, ln_bias, wqkv, bqkv, wp, bp,
                num_heads=self.num_heads, eps=1e-5, interpret=interpret,
            )
            return fused_mlp_sublayer_int8(
                x.astype(self.dtype), ln2_scale, ln2_bias, w1, b1, w2, b2,
                eps=1e-5, gelu_approx=self.gelu_approx, interpret=interpret,
                static_scales=self.int8_mlp_scales,
            )
        tp = (
            self.tp_mesh is not None
            and self.tp_mesh.shape.get(self.tp_axis, 1) > 1
        )
        if self.attn_impl == "fused" and tp:
            assert self.qkv_layout == "heads", (
                "TP fused kernels need the heads qkv layout"
            )
            from duodiff_tpu.parallel.tp_fused import (
                tp_fused_attn_sublayer,
                tp_fused_mlp_sublayer,
            )

            ln_scale, ln_bias = _LNParams(name="norm1")(d)
            (wqkv, bqkv), (wp, bp) = attn(None, raw="heads")
            x = tp_fused_attn_sublayer(
                x.astype(self.dtype), ln_scale, ln_bias, wqkv, bqkv, wp, bp,
                mesh=self.tp_mesh, axis=self.tp_axis, eps=1e-5,
                interpret=interpret,
            )
            ln2_scale, ln2_bias = _LNParams(name="norm2")(d)
            (w1, b1), (w2, b2) = mlp(None, raw=True)
            return tp_fused_mlp_sublayer(
                x.astype(self.dtype), ln2_scale, ln2_bias, w1, b1, w2, b2,
                mesh=self.tp_mesh, axis=self.tp_axis, eps=1e-5,
                gelu_approx=self.gelu_approx, interpret=interpret,
            )
        if self.attn_impl == "fused":
            from duodiff_tpu.ops.pallas_block import (
                fused_attn_sublayer_trainable,
            )

            ln_scale, ln_bias = _LNParams(name="norm1")(d)
            (wqkv, bqkv), (wp, bp) = attn(None, raw=True)
            x = fused_attn_sublayer_trainable(
                x.astype(self.dtype), ln_scale, ln_bias, wqkv, bqkv, wp, bp,
                self.num_heads, 1e-5, interpret,
            )
        else:
            x = x + attn(
                _layer_norm(x, name="norm1", out_dtype=self.dtype)
            ).astype(x.dtype)
        if self.attn_impl == "fused" or self.mlp_impl == "fused":
            from duodiff_tpu.ops.pallas_block import (
                fused_mlp_sublayer_trainable,
            )

            ln2_scale, ln2_bias = _LNParams(name="norm2")(d)
            (w1, b1), (w2, b2) = mlp(None, raw=True)
            return fused_mlp_sublayer_trainable(
                x.astype(self.dtype), ln2_scale, ln2_bias, w1, b1, w2, b2,
                1e-5, self.gelu_approx, interpret,
            )
        x = x + mlp(
            _layer_norm(x, name="norm2", out_dtype=self.dtype)
        ).astype(x.dtype)
        return x


class _LNParams(nn.Module):
    """Declares LayerNorm's scale/bias with flax's exact names and inits,
    for handing to the fused sublayer kernel (param tree stays identical to
    nn.LayerNorm whichever impl runs)."""

    @nn.compact
    def __call__(self, d):
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        return scale, bias


def _layer_norm(x, name, out_dtype=None):
    """LayerNorm with torch's eps=1e-5; statistics always fp32, output cast
    to the compute dtype so the materialized tensor stays bf16 on the hot
    path (halves HBM traffic vs writing fp32)."""
    y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)(x)
    return y.astype(out_dtype) if out_dtype is not None else y


class PatchEmbed(nn.Module):
    """Image -> patch embedding (reference models/uvit.py:211-225).

    The reference uses Conv2d(kernel=p, stride=p); a non-overlapping strided
    conv is exactly a Linear over flattened patches, so on TPU we patchify
    with reshapes and hit the MXU with one (B*L, p*p*C) x (p*p*C, D) matmul.
    """

    patch_size: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        assert h % self.patch_size == 0 and w % self.patch_size == 0
        x = patchify(x, self.patch_size)
        x = nn.Dense(
            self.embed_dim,
            dtype=self.dtype,
            kernel_init=trunc_normal_init,
            name="proj",
        )(x)
        return x


class TimeEmbed(nn.Module):
    """Optional Linear-SiLU-Linear over the sinusoidal embedding
    (reference models/uvit.py:264-272; Identity when mlp_time_embed=False)."""

    embed_dim: int
    mlp_time_embed: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb):
        if not self.mlp_time_embed:
            return emb
        x = nn.Dense(
            4 * self.embed_dim,
            dtype=self.dtype,
            kernel_init=trunc_normal_init,
            name="fc1",
        )(emb)
        x = nn.silu(x)
        x = nn.Dense(
            self.embed_dim,
            dtype=self.dtype,
            kernel_init=trunc_normal_init,
            name="fc2",
        )(x)
        return x

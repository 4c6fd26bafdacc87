"""U-ViT backbone in Flax (TPU-native re-design of reference models/uvit.py:228-387).

Architecture (identical topology to the reference):
  patch_embed -> [label_emb?, time_token, patches] + pos_embed
  -> depth//2 in_blocks (collect long skips)
  -> mid_block
  -> depth//2 out_blocks (consume skips via Linear(concat))
  -> LayerNorm -> decoder_pred -> drop extra tokens -> unpatchify -> 3x3 conv

TPU-specific choices:
  - NHWC images end to end; patch embedding is reshape+matmul (MXU-friendly).
  - Activations in a configurable compute dtype (bf16 by default at call
    sites); parameters and LayerNorm/softmax statistics stay fp32.
  - setup()-style submodules so EarlyExitUViT can interleave probes/heads at
    block boundaries without duplicating the backbone definition.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from duodiff_tpu.config import UViTConfig
from duodiff_tpu.models.layers import (
    Block,
    PatchEmbed,
    TimeEmbed,
    timestep_embedding,
    trunc_normal_init,
    unpatchify,
)


class UViT(nn.Module):
    """U-ViT denoiser.

    __call__(x, timesteps, y=None):
      x: (B, H, W, C) NHWC noisy images.
      timesteps: (B,) float or int timesteps in [0, 1000).
      y: optional (B,) int class labels (required iff num_classes > 0).
    Returns (B, H, W, C) prediction under the training parametrization.
    """

    config: UViTConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    gelu_approx: bool = False
    mlp_impl: str = "auto"
    # "heads" stores qkv/proj kernels with an explicit head axis so tensor
    # parallelism shards whole heads (Megatron-style; see layers._QKVProj)
    qkv_layout: str = "packed"
    # Per-block activation checkpointing (reference models/uvit.py:197-201's
    # torch.utils.checkpoint, off by default there too). On TPU this is the
    # remat memory lever: only block-boundary activations are kept live for
    # the backward; everything inside a block is recomputed. Identical
    # params/grads either way (tested), ~N x block-activation HBM saved.
    use_checkpoint: bool = False
    # fused_int8 only: per-block calibrated MLP activation amaxes in block
    # execution order (in_0..in_{k-1}, mid, out_0..out_{k-1}), each an
    # (xn_amax, h_amax) pair — see layers.Block.int8_mlp_scales. Built from
    # a tools/calibrate_int8.py JSON by utils.model_loading.
    int8_mlp_scales: Optional[tuple] = None
    # fused_int8 only: calibration forward (XLA int8 math + amax sowing)
    int8_calibrate: bool = False
    # TP x fused kernels: mesh handed to each Block so attn_impl "fused"
    # runs head-sharded shard_map sublayers (parallel/tp_fused.py)
    tp_mesh: Optional[jax.sharding.Mesh] = None
    tp_axis: str = "model"

    def setup(self):
        cfg = self.config
        self.patch_embed = PatchEmbed(
            patch_size=cfg.patch_size, embed_dim=cfg.embed_dim, dtype=self.dtype
        )
        self.time_embed = TimeEmbed(
            embed_dim=cfg.embed_dim,
            mlp_time_embed=cfg.mlp_time_embed,
            dtype=self.dtype,
        )
        if cfg.num_classes > 0:
            self.label_emb = nn.Embed(cfg.num_classes, cfg.embed_dim, dtype=self.dtype)
        self.pos_embed = self.param(
            "pos_embed",
            trunc_normal_init,
            (1, cfg.extras + cfg.num_patches, cfg.embed_dim),
        )

        common = dict(
            num_heads=cfg.num_heads,
            mlp_ratio=cfg.mlp_ratio,
            qkv_bias=cfg.qkv_bias,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            gelu_approx=self.gelu_approx,
            mlp_impl=self.mlp_impl,
            qkv_layout=self.qkv_layout,
            tp_mesh=self.tp_mesh,
            tp_axis=self.tp_axis,
        )
        # nn.remat preserves the param structure, so checkpoints are
        # interchangeable between the two settings
        block_cls = nn.remat(Block) if self.use_checkpoint else Block
        k = cfg.depth // 2
        sc = self.int8_mlp_scales
        if sc is not None and len(sc) != 2 * k + 1:
            raise ValueError(
                f"int8_mlp_scales has {len(sc)} entries, need {2 * k + 1}"
            )

        def blk(i: int, **kw):
            scales = None if sc is None else tuple(sc[i])
            return block_cls(
                **common, int8_mlp_scales=scales,
                int8_calibrate=self.int8_calibrate, **kw,
            )

        self.in_blocks = [blk(i) for i in range(k)]
        self.mid_block = blk(k)
        self.out_blocks = [
            blk(k + 1 + i, skip=cfg.skip) for i in range(k)
        ]

        self.norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        self.decoder_pred = nn.Dense(
            cfg.patch_dim, dtype=self.dtype, kernel_init=trunc_normal_init
        )
        if cfg.conv:
            self.final_layer = nn.Conv(
                cfg.in_chans, kernel_size=(3, 3), padding="SAME", dtype=self.dtype
            )

    def embed_tokens(self, x, timesteps, y=None):
        """Patchify + time/label tokens + positional embedding
        (reference models/uvit.py:351-365)."""
        cfg = self.config
        if cfg.normalize_timesteps:
            timesteps = timesteps.astype(jnp.float32) / 1000.0

        x = self.patch_embed(x.astype(self.dtype))

        time_token = self.time_embed(timestep_embedding(timesteps, cfg.embed_dim))
        x = jnp.concatenate([time_token[:, None, :].astype(self.dtype), x], axis=1)

        if cfg.num_classes > 0:
            assert y is not None, "class-conditional model requires labels"
            label_emb = self.label_emb(y)
            x = jnp.concatenate([label_emb[:, None, :], x], axis=1)

        return x + self.pos_embed.astype(self.dtype)

    def decode_tokens(self, x):
        """Final norm + linear decoder + unpatchify + 3x3 conv
        (reference models/uvit.py:377-382)."""
        cfg = self.config
        x = self.norm(x)
        x = self.decoder_pred(x)
        x = x[:, cfg.extras :, :]
        x = unpatchify(x, cfg.in_chans)
        if cfg.conv:
            x = self.final_layer(x)
        return x.astype(jnp.float32)

    def __call__(
        self, x: jax.Array, timesteps: jax.Array, y: Optional[jax.Array] = None
    ) -> jax.Array:
        x = self.embed_tokens(x, timesteps, y)

        skips = []
        for blk in self.in_blocks:
            x = blk(x)
            skips.append(x)

        x = self.mid_block(x)

        for blk in self.out_blocks:
            x = blk(x, skips.pop())

        return self.decode_tokens(x)

    def forward_anchor(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        y: Optional[jax.Array] = None,
        *,
        n_outer: int,
    ):
        """Full forward that also returns the middle-region residual delta
        for block caching (the Delta-DiT / DeepCache family of training-free
        feature caching, PAPERS.md: adjacent reverse steps change the deep
        features slowly, so the middle of the network can be recomputed only
        every few steps and its *residual contribution* reused in between).

        The cached region is the centered ``depth - 2*n_outer`` blocks:
        in_blocks[n_outer:], mid_block, out_blocks[:k - n_outer]. U-ViT's
        long-skip pairing (out_block m consumes in_block k-1-m's output,
        reference models/uvit.py:367-375) makes exactly the centered region
        self-contained: every skip pushed inside it is consumed inside it,
        so the whole region reduces to one token-space residual
        ``delta = tokens_out - tokens_in``.

        Returns ``(prediction, delta)`` with delta (B, L, D) in the compute
        dtype; ``prediction`` is bit-identical to ``__call__``.
        """
        k = self.config.depth // 2
        if not 0 <= n_outer <= k:
            raise ValueError(f"n_outer must be in [0, {k}], got {n_outer}")
        x = self.embed_tokens(x, timesteps, y)

        skips = []
        for blk in self.in_blocks[:n_outer]:
            x = blk(x)
            skips.append(x)

        region_in = x
        inner_skips = []
        for blk in self.in_blocks[n_outer:]:
            x = blk(x)
            inner_skips.append(x)
        x = self.mid_block(x)
        for blk in self.out_blocks[: k - n_outer]:
            x = blk(x, inner_skips.pop())
        delta = x - region_in

        for blk in self.out_blocks[k - n_outer :]:
            x = blk(x, skips.pop())

        return self.decode_tokens(x), delta

    def forward_cached(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        y: Optional[jax.Array] = None,
        *,
        n_outer: int,
        delta: jax.Array,
    ) -> jax.Array:
        """Cheap forward reusing a cached middle-region residual from
        :meth:`forward_anchor`: only the ``2*n_outer`` outer blocks (plus
        embed/decode) run; the centered region is replaced by ``x + delta``.
        Costs ``2*n_outer / depth`` of the block FLOPs."""
        k = self.config.depth // 2
        if not 0 <= n_outer <= k:
            raise ValueError(f"n_outer must be in [0, {k}], got {n_outer}")
        x = self.embed_tokens(x, timesteps, y)

        skips = []
        for blk in self.in_blocks[:n_outer]:
            x = blk(x)
            skips.append(x)

        x = x + delta.astype(x.dtype)

        for blk in self.out_blocks[k - n_outer :]:
            x = blk(x, skips.pop())

        return self.decode_tokens(x)


def init_uvit(
    config: UViTConfig, key: jax.Array, dtype=jnp.float32,
    attn_impl: str = "auto", gelu_approx: bool = False,
    mlp_impl: str = "auto", qkv_layout: str = "packed",
    use_checkpoint: bool = False, int8_mlp_scales=None,
    int8_calibrate: bool = False, tp_mesh=None, tp_axis: str = "model",
):
    """Create a UViT module and initialize its parameters.

    Returns (module, params) where params is a fp32 pytree.
    """
    model = UViT(
        config=config, dtype=dtype, attn_impl=attn_impl,
        gelu_approx=gelu_approx, mlp_impl=mlp_impl, qkv_layout=qkv_layout,
        use_checkpoint=use_checkpoint, int8_mlp_scales=int8_mlp_scales,
        int8_calibrate=int8_calibrate, tp_mesh=tp_mesh, tp_axis=tp_axis,
    )
    x = jnp.zeros((1, config.img_size, config.img_size, config.in_chans), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    y = jnp.zeros((1,), jnp.int32) if config.num_classes > 0 else None
    params = model.init(key, x, t, y)["params"]
    return model, params

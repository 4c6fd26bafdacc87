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
  - ``jax.checkpoint``-friendly: pure function of (params, x, t, y).
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

    @nn.compact
    def __call__(
        self, x: jax.Array, timesteps: jax.Array, y: Optional[jax.Array] = None
    ) -> jax.Array:
        cfg = self.config
        tokens, skips = self.encode(x, timesteps, y)
        del skips  # encode() runs the full network; skips already consumed
        return tokens

    # The forward pass is split so EarlyExitUViT can interleave probes/heads
    # at every block boundary without duplicating the backbone definition.

    def embed_tokens(self, x, timesteps, y):
        """Patchify + time/label tokens + positional embedding
        (reference models/uvit.py:351-365)."""
        cfg = self.config
        if cfg.normalize_timesteps:
            timesteps = timesteps.astype(jnp.float32) / 1000.0

        x = PatchEmbed(
            patch_size=cfg.patch_size,
            embed_dim=cfg.embed_dim,
            dtype=self.dtype,
            name="patch_embed",
        )(x.astype(self.dtype))
        b, l, d = x.shape

        time_token = TimeEmbed(
            embed_dim=cfg.embed_dim,
            mlp_time_embed=cfg.mlp_time_embed,
            dtype=self.dtype,
            name="time_embed",
        )(timestep_embedding(timesteps, cfg.embed_dim))
        x = jnp.concatenate([time_token[:, None, :].astype(self.dtype), x], axis=1)

        if cfg.num_classes > 0:
            assert y is not None, "class-conditional model requires labels"
            label_emb = nn.Embed(
                cfg.num_classes,
                cfg.embed_dim,
                dtype=self.dtype,
                name="label_emb",
            )(y)
            x = jnp.concatenate([label_emb[:, None, :], x], axis=1)

        pos_embed = self.param(
            "pos_embed",
            trunc_normal_init,
            (1, cfg.extras + cfg.num_patches, cfg.embed_dim),
        )
        x = x + pos_embed.astype(self.dtype)
        return x

    def make_blocks(self):
        """Instantiate the in/mid/out blocks with stable names for checkpoints."""
        cfg = self.config
        common = dict(
            num_heads=cfg.num_heads,
            mlp_ratio=cfg.mlp_ratio,
            qkv_bias=cfg.qkv_bias,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
        )
        in_blocks = [
            Block(**common, name=f"in_blocks_{i}") for i in range(cfg.depth // 2)
        ]
        mid_block = Block(**common, name="mid_block")
        out_blocks = [
            Block(**common, skip=cfg.skip, name=f"out_blocks_{i}")
            for i in range(cfg.depth // 2)
        ]
        return in_blocks, mid_block, out_blocks

    def decode_tokens(self, x):
        """Final norm + linear decoder + unpatchify + 3x3 conv
        (reference models/uvit.py:377-382)."""
        cfg = self.config
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        x = nn.Dense(
            cfg.patch_dim,
            dtype=self.dtype,
            kernel_init=trunc_normal_init,
            name="decoder_pred",
        )(x)
        x = x[:, cfg.extras :, :]
        x = unpatchify(x, cfg.in_chans)
        if cfg.conv:
            x = nn.Conv(
                cfg.in_chans,
                kernel_size=(3, 3),
                padding="SAME",
                dtype=self.dtype,
                name="final_layer",
            )(x)
        return x.astype(jnp.float32)

    def encode(self, x, timesteps, y):
        """Full forward pass; returns (output_image, None)."""
        x = self.embed_tokens(x, timesteps, y)
        in_blocks, mid_block, out_blocks = self.make_blocks()

        skips = []
        for blk in in_blocks:
            x = blk(x)
            skips.append(x)

        x = mid_block(x)

        for blk in out_blocks:
            x = blk(x, skips.pop())

        return self.decode_tokens(x), None


def init_uvit(
    config: UViTConfig, key: jax.Array, dtype=jnp.float32, attn_impl: str = "auto"
):
    """Create a UViT module and initialize its parameters.

    Returns (module, params) where params is a fp32 pytree.
    """
    model = UViT(config=config, dtype=dtype, attn_impl=attn_impl)
    x = jnp.zeros((1, config.img_size, config.img_size, config.in_chans), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    y = jnp.zeros((1,), jnp.int32) if config.num_classes > 0 else None
    params = model.init(key, x, t, y)["params"]
    return model, params

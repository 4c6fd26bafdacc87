"""Frozen KL autoencoder in Flax (re-design of reference
models/utils/autoencoder.py:203-516, itself from the U-ViT upstream).

Encodes 256x256x3 images into 32x32x4 latents (x0.18215) for latent-space
ImageNet-256 training/sampling (reference trainer.py:266-269,
sampler.py:141-143). NHWC throughout (TPU conv layout); GroupNorm(32,
eps=1e-6) + swish; the mid-block spatial attention runs with fp32 softmax.

Only the configuration the reference uses is built: ch=128,
ch_mult=(1,2,4,4), 2 res-blocks, no down/up attention (attn_resolutions=[]),
double_z, z=4 (reference models/utils/autoencoder.py:503-516).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from duodiff_tpu.config import AutoencoderConfig


def swish(x):
    return x * jax.nn.sigmoid(x)


def group_norm(x, name):
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32, name=name)(x)


class ResnetBlock(nn.Module):
    """GroupNorm -> swish -> conv3x3, twice, with a 1x1 shortcut on channel
    change (reference models/utils/autoencoder.py:79-136; temb_ch=0)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        h = group_norm(x, "norm1")
        h = swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(h.astype(self.dtype))
        h = group_norm(h, "norm2")
        h = swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(h.astype(self.dtype))
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="nin_shortcut")(x.astype(self.dtype))
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention over (h*w) tokens with 1x1-conv
    projections (reference models/utils/autoencoder.py:146-189)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hn = group_norm(x, "norm").astype(self.dtype)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(hn).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(hn).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(hn).reshape(b, h * w, c)
        logits = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits * (c ** -0.5)
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", weights.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b, h, w, c).astype(self.dtype)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class Downsample(nn.Module):
    """Asymmetric-pad (right/bottom) stride-2 conv
    (reference models/utils/autoencoder.py:59-76)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(c, (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, name="conv")(x.astype(self.dtype))


class Upsample(nn.Module):
    """Nearest x2 + conv3x3 (reference models/utils/autoencoder.py:43-56)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype,
                       name="conv")(x.astype(self.dtype))


class Encoder(nn.Module):
    """Downsampling ResNet pyramid + attn mid (reference
    models/utils/autoencoder.py:203-317; attn_resolutions=[])."""

    config: AutoencoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        ch_mult = cfg.ch_mult
        h = nn.Conv(cfg.ch, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_in")(x.astype(self.dtype))
        for i_level, mult in enumerate(ch_mult):
            for i_block in range(cfg.num_res_blocks):
                h = ResnetBlock(out_channels=cfg.ch * mult, dtype=self.dtype,
                                name=f"down_{i_level}_block_{i_block}")(h)
            if i_level != len(ch_mult) - 1:
                h = Downsample(dtype=self.dtype,
                               name=f"down_{i_level}_downsample")(h)
        h = ResnetBlock(out_channels=h.shape[-1], dtype=self.dtype,
                        name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(out_channels=h.shape[-1], dtype=self.dtype,
                        name="mid_block_2")(h)
        h = group_norm(h, "norm_out")
        h = swish(h)
        # double_z: 2 * z_channels moments
        return nn.Conv(2 * cfg.z_channels, (3, 3), padding="SAME",
                       dtype=self.dtype, name="conv_out")(h.astype(self.dtype))


class Decoder(nn.Module):
    """Upsampling ResNet pyramid + attn mid (reference
    models/utils/autoencoder.py:320-449)."""

    config: AutoencoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        ch_mult = cfg.ch_mult
        n_levels = len(ch_mult)
        block_in = cfg.ch * ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_in")(z.astype(self.dtype))
        h = ResnetBlock(out_channels=block_in, dtype=self.dtype,
                        name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(out_channels=block_in, dtype=self.dtype,
                        name="mid_block_2")(h)
        for i_level in reversed(range(n_levels)):
            for i_block in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(out_channels=cfg.ch * ch_mult[i_level],
                                dtype=self.dtype,
                                name=f"up_{i_level}_block_{i_block}")(h)
            if i_level != 0:
                h = Upsample(dtype=self.dtype, name=f"up_{i_level}_upsample")(h)
        h = group_norm(h, "norm_out")
        h = swish(h)
        return nn.Conv(cfg.out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                       name="conv_out")(h.astype(self.dtype))


class FrozenAutoencoderKL(nn.Module):
    """encode: x -> reparameterized z * scale_factor;
    decode: z / scale_factor -> image
    (reference models/utils/autoencoder.py:452-500)."""

    config: AutoencoderConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder = Encoder(config=cfg, dtype=self.dtype)
        self.decoder = Decoder(config=cfg, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * cfg.embed_dim, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(cfg.z_channels, (1, 1), dtype=self.dtype)

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def sample_latent(self, moments, key):
        mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        std = jnp.exp(0.5 * logvar)
        z = mean + std * jax.random.normal(key, mean.shape, dtype=jnp.float32)
        return self.config.scale_factor * z

    def encode(self, x, key):
        """(B, 256, 256, 3) -> (B, 32, 32, 4) latents."""
        return self.sample_latent(self.encode_moments(x), key)

    def decode(self, z):
        """(B, 32, 32, 4) latents -> (B, 256, 256, 3)."""
        z = z / self.config.scale_factor
        return self.decoder(self.post_quant_conv(z.astype(self.dtype))).astype(
            jnp.float32
        )

    def __call__(self, x, key):
        """encode -> decode round-trip (also ensures init traces both sides)."""
        return self.decode(self.encode(x, key))


def init_autoencoder(config: Optional[AutoencoderConfig] = None, key=None,
                     dtype=jnp.float32, image_size: int = 32):
    """Random-init autoencoder (tests / shape checks). image_size is only the
    init-trace size; the module is resolution-agnostic."""
    config = config or AutoencoderConfig()
    key = key if key is not None else jax.random.PRNGKey(0)
    model = FrozenAutoencoderKL(config=config, dtype=dtype)
    x = jnp.zeros((1, image_size, image_size, config.in_channels), jnp.float32)
    params = model.init(key, x, jax.random.PRNGKey(0))["params"]
    return model, params


def load_autoencoder(pretrained_path, scale_factor: float = 0.18215,
                     dtype=jnp.bfloat16,
                     config: Optional[AutoencoderConfig] = None):
    """Build the autoencoder (reference config by default — get_autoencoder,
    models/utils/autoencoder.py:503-516) and load converted torch weights.
    Orbax checkpoint dirs are also accepted."""
    from pathlib import Path

    config = config or AutoencoderConfig(scale_factor=scale_factor)
    model, params = init_autoencoder(config, dtype=dtype, image_size=32)
    if Path(pretrained_path).is_dir():
        import orbax.checkpoint as ocp

        raw = ocp.Checkpointer(ocp.PyTreeCheckpointHandler()).restore(
            Path(pretrained_path).resolve()
        )
        raw = raw.get("params", raw)
        params = jax.tree_util.tree_map(
            lambda a, t: jnp.asarray(a, t.dtype), raw, params
        )
    else:
        from duodiff_tpu.utils.torch_convert import convert_autoencoder_checkpoint

        params = convert_autoencoder_checkpoint(pretrained_path, params)
    return model, params

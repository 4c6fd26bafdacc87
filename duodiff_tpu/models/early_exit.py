"""DeeDiff/AdaDiff early-exit U-ViT (TPU-native re-design of reference
models/early_exit.py:193-324).

Structural differences from the reference, chosen for XLA/TPU:

- **Stacked heads/probes.** The reference instantiates ``depth`` separate
  OutputHead modules and up to depth x 1000 separate MLPProbe modules in an
  ``nn.ModuleDict`` (models/early_exit.py:228-239), selecting one host-side
  via ``int(timesteps[0])`` (models/early_exit.py:269). Here per-layer heads
  and probes are ``nn.vmap``-stacked (params carry a leading ``depth`` axis)
  and per-timestep probes are weight *tables* of shape (T, D) / (depth, T, D)
  indexed with an on-device gather — fully traceable, no host sync, and one
  big MXU matmul instead of depth small ones.

- **Per-sample timestep probes.** Because the gather is per-sample, training
  batches with mixed timesteps index the correct probe row for every sample
  (the reference applies sample 0's timestep to the whole batch).

- **Dense compute + select.** Like the reference's eesampler (which computes
  every layer and head each step and merely selects, eesampler.py:62-68),
  the forward always runs the full network — the SPMD-friendly parity path.

Returns ``(backbone_out, classifier_outputs, ee_outputs)`` with
classifier_outputs stacked (depth, B) and ee_outputs stacked
(depth, B, H, W, C) — the layouts the DeeDiff loss and the early-exit
sampler consume directly (reference trainer.py:358-405 stacks the same way).
"""

from __future__ import annotations

import functools

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from duodiff_tpu.config import UViTConfig
from duodiff_tpu.models.layers import trunc_normal_init, unpatchify
from duodiff_tpu.models.uvit import UViT
from duodiff_tpu.ops import multi_head_attention

CLASSIFIER_TYPES = (
    "attention_probe",
    "mlp_probe_per_layer",
    "mlp_probe_per_timestep",
    "mlp_probe_per_layer_per_timestep",
)


class OutputHead(nn.Module):
    """Per-layer decoder replicating the U-ViT tail
    (reference models/early_exit.py:9-28):
    LayerNorm -> Linear(embed->patch_dim) -> drop extras -> unpatchify -> 3x3 conv.
    """

    patch_dim: int
    in_chans: int
    extras: int
    conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        x = nn.Dense(
            self.patch_dim,
            dtype=self.dtype,
            kernel_init=trunc_normal_init,
            name="decoder_pred",
        )(x)
        x = x[:, self.extras :, :]
        x = unpatchify(x, self.in_chans)
        if self.conv:
            x = nn.Conv(
                self.in_chans,
                kernel_size=(3, 3),
                padding="SAME",
                dtype=self.dtype,
                name="final_layer",
            )(x)
        return x.astype(jnp.float32)


class MLPProbe(nn.Module):
    """Uncertainty probe: Linear(D->1) -> sigmoid -> mean over tokens
    (reference models/early_exit.py:31-37). Output (B,)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        u = nn.Dense(1, dtype=self.dtype, name="classifier")(x)  # (B, L, 1)
        u = jax.nn.sigmoid(u.astype(jnp.float32))
        return jnp.mean(u, axis=1)[..., 0]  # (B,)


class AttentionProbe(nn.Module):
    """Learned-query single-head cross-attention probe
    (reference models/early_exit.py:40-80). Drops the first (time) token,
    attends a learned query over the rest, then Linear->SiLU->Linear(->1).
    Note: no sigmoid on the output (reference quirk, replicated). Output (B,).
    """

    num_heads: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x[:, 1:, :]  # drop time token (reference models/early_exit.py:73)
        b, l, d = x.shape
        head_dim = d // self.num_heads
        q = self.param(
            "q", nn.initializers.zeros, (1, self.num_heads, 1, head_dim)
        )
        kv = nn.Dense(2 * d, dtype=self.dtype, name="weight_kv")(x)
        kv = kv.reshape(b, l, 2, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        q = jnp.broadcast_to(q, (b, self.num_heads, 1, head_dim)).astype(k.dtype)
        out = multi_head_attention(q, k, v, impl="xla")  # (B, H, 1, Dh)
        out = out.transpose(0, 2, 1, 3).reshape(b, 1, d).astype(self.dtype)
        h = nn.Dense(d, dtype=self.dtype, name="cls_fc1")(out)
        h = nn.silu(h)
        h = nn.Dense(1, dtype=self.dtype, name="cls_fc2")(h)
        return h.astype(jnp.float32)[:, 0, 0]  # (B,)


def _table_init(key, shape, dtype=jnp.float32, fan_in=None):
    """Probe-table init: ~ torch Linear default scale
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)). ``fan_in`` must be given for bias
    tables (their trailing dim is 1, not the layer's input width)."""
    d = fan_in if fan_in is not None else shape[-1]
    bound = 1.0 / jnp.sqrt(jnp.asarray(float(max(d, 1))))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TimestepProbeTable(nn.Module):
    """Per-timestep (and optionally per-layer) MLP probes as gatherable weight
    tables — the TPU equivalent of the reference's 1,000 / depth x 1,000
    module registry (models/early_exit.py:228-239).

    weights: (T, D) or (depth, T, D); biases: (T,) or (depth, T).
    __call__(hs, t_idx) with hs (depth, B, L, D), t_idx (B,) -> (depth, B).
    """

    num_timesteps: int
    depth: int
    per_layer: bool

    @nn.compact
    def __call__(self, hs, t_idx):
        depth, b, l, d = hs.shape
        if self.per_layer:
            w = self.param("weight", _table_init, (self.depth, self.num_timesteps, d))
            bias = self.param(
                "bias",
                functools.partial(_table_init, fan_in=d),
                (self.depth, self.num_timesteps, 1),
            )
            w_g = w[:, t_idx]  # (depth, B, D)
            b_g = bias[:, t_idx, 0]  # (depth, B)
        else:
            w = self.param("weight", _table_init, (self.num_timesteps, d))
            bias = self.param(
                "bias",
                functools.partial(_table_init, fan_in=d),
                (self.num_timesteps, 1),
            )
            w_g = jnp.broadcast_to(w[t_idx][None], (depth, b, d))
            b_g = jnp.broadcast_to(bias[t_idx, 0][None], (depth, b))
        logits = jnp.einsum(
            "kbld,kbd->kbl", hs.astype(jnp.float32), w_g.astype(jnp.float32)
        ) + b_g[:, :, None]
        u = jax.nn.sigmoid(logits)
        return jnp.mean(u, axis=2)  # (depth, B)


class EarlyExitUViT(nn.Module):
    """U-ViT with an uncertainty probe + output head at each of ``depth``
    block boundaries (before each in-block, before mid, before each
    out-block — reference models/early_exit.py:291-313).
    """

    config: UViTConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    gelu_approx: bool = False
    qkv_layout: str = "packed"
    # per-block activation checkpointing of the backbone (see UViT)
    use_checkpoint: bool = False
    # fused_int8 static MLP activation scales / calibration mode (see UViT)
    int8_mlp_scales: Optional[tuple] = None
    int8_calibrate: bool = False
    # TP x fused kernels (see UViT)
    tp_mesh: Optional[jax.sharding.Mesh] = None
    tp_axis: str = "model"

    @nn.compact
    def __call__(
        self, x: jax.Array, timesteps: jax.Array, y: Optional[jax.Array] = None
    ):
        cfg = self.config
        if cfg.classifier_type not in CLASSIFIER_TYPES:
            raise ValueError(f"Unknown classifier type: {cfg.classifier_type}")
        depth = cfg.depth

        # raw (unnormalized) integer timesteps index the probe tables
        # (reference models/early_exit.py:269 reads t before normalization).
        # The 1000-row table mirrors the reference's hard-coded registries
        # (models/early_exit.py:228-239); t >= 1000 clips to row 999 (the
        # reference would KeyError) — schedules longer than 1000 steps alias
        # probes and should retrain with a wider table.
        t_idx = jnp.clip(timesteps.astype(jnp.int32), 0, 999)

        uvit = UViT(
            config=cfg, dtype=self.dtype, attn_impl=self.attn_impl,
            gelu_approx=self.gelu_approx, qkv_layout=self.qkv_layout,
            use_checkpoint=self.use_checkpoint,
            int8_mlp_scales=self.int8_mlp_scales,
            int8_calibrate=self.int8_calibrate, tp_mesh=self.tp_mesh,
            tp_axis=self.tp_axis, name="uvit"
        )
        tokens = uvit.embed_tokens(x, timesteps, y)

        # Collect the pre-block activation at each probe point.
        hs = []
        skips = []
        h = tokens
        for blk in uvit.in_blocks:
            hs.append(h)
            h = blk(h)
            skips.append(h)
        hs.append(h)
        h = uvit.mid_block(h)
        for blk in uvit.out_blocks:
            hs.append(h)
            h = blk(h, skips.pop())

        backbone_out = uvit.decode_tokens(h)

        hs = jnp.stack(hs, axis=0)  # (depth, B, L, D)

        # ---- output heads: one vmapped module, params stacked on axis 0 ----
        StackedHeads = nn.vmap(
            OutputHead,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=0,
            out_axes=0,
        )
        ee_outputs = StackedHeads(
            patch_dim=cfg.patch_dim,
            in_chans=cfg.in_chans,
            extras=cfg.extras,
            conv=True,
            dtype=self.dtype,
            name="heads",
        )(hs)  # (depth, B, H, W, C)

        # ---- probes ----
        if cfg.classifier_type == "attention_probe":
            StackedProbe = nn.vmap(
                AttentionProbe,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=0,
                out_axes=0,
            )
            classifier_outputs = StackedProbe(dtype=self.dtype, name="probes")(hs)
        elif cfg.classifier_type == "mlp_probe_per_layer":
            StackedProbe = nn.vmap(
                MLPProbe,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=0,
                out_axes=0,
            )
            classifier_outputs = StackedProbe(dtype=self.dtype, name="probes")(hs)
        elif cfg.classifier_type == "mlp_probe_per_timestep":
            classifier_outputs = TimestepProbeTable(
                num_timesteps=1000, depth=depth, per_layer=False, name="probes"
            )(hs, t_idx)
        else:  # mlp_probe_per_layer_per_timestep
            classifier_outputs = TimestepProbeTable(
                num_timesteps=1000, depth=depth, per_layer=True, name="probes"
            )(hs, t_idx)

        return backbone_out, classifier_outputs, ee_outputs


def init_early_exit_uvit(
    config: UViTConfig, key: jax.Array, dtype=jnp.float32,
    attn_impl: str = "auto", gelu_approx: bool = False,
    qkv_layout: str = "packed", use_checkpoint: bool = False,
    int8_mlp_scales=None, int8_calibrate: bool = False, tp_mesh=None,
    tp_axis: str = "model",
):
    """Create an EarlyExitUViT and initialize parameters."""
    model = EarlyExitUViT(
        config=config, dtype=dtype, attn_impl=attn_impl,
        gelu_approx=gelu_approx, qkv_layout=qkv_layout,
        use_checkpoint=use_checkpoint, int8_mlp_scales=int8_mlp_scales,
        int8_calibrate=int8_calibrate, tp_mesh=tp_mesh, tp_axis=tp_axis,
    )
    x = jnp.zeros((1, config.img_size, config.img_size, config.in_chans), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    y = jnp.zeros((1,), jnp.int32) if config.num_classes > 0 else None
    params = model.init(key, x, t, y)["params"]
    return model, params

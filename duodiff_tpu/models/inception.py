"""InceptionV3 feature extractor for FID, in Flax.

The reference computes FID with torchmetrics' FrechetInceptionDistance
(fid.py:34-39), which wraps the pytorch-fid InceptionV3: the torchvision
Inception-v3 graph with the FID-specific pooling variants (average pooling
with count_include_pad=False in the A/C/E_1 blocks, max pooling in E_2) and
the canonical pt_inception weights. This module re-implements that graph in
Flax/NHWC so feature extraction runs on TPU; weights convert from a
pytorch-fid / torchvision state dict via :func:`convert_inception_weights`.

Input contract (matches torchmetrics normalize=True): float images in
[0, 1], any HxW; :func:`preprocess` resizes to 299x299 (bilinear,
half-pixel centers == torch align_corners=False) and rescales to [-1, 1].
Output: (B, 2048) pool3 features.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _avg_pool_3x3_same_excl(x):
    """avg_pool2d(k=3, s=1, p=1, count_include_pad=False), NHWC."""
    sum_ = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
    )
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
    )
    return sum_ / cnt


def _max_pool(x, window=3, stride=2, padding="VALID"):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), padding,
    )


def _max_pool_3x3_same(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
    )


class BasicConv2d(nn.Module):
    """Conv (no bias) + frozen BatchNorm(eps=1e-3) + ReLU."""

    features: int
    kernel_size: tuple
    strides: int = 1
    padding: tuple = (0, 0)

    @nn.compact
    def __call__(self, x):
        ph, pw = self.padding
        x = nn.Conv(
            self.features,
            self.kernel_size,
            strides=(self.strides, self.strides),
            padding=[(ph, ph), (pw, pw)],
            use_bias=False,
            name="conv",
        )(x)
        c = self.features
        scale = self.param("bn_scale", nn.initializers.ones, (c,))
        bias = self.param("bn_bias", nn.initializers.zeros, (c,))
        mean = self.param("bn_mean", nn.initializers.zeros, (c,))
        var = self.param("bn_var", nn.initializers.ones, (c,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return jax.nn.relu(x)


def _bc(features, k, s=1, p=(0, 0), name=None):
    return BasicConv2d(features=features, kernel_size=k, strides=s, padding=p,
                       name=name)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = _bc(64, (1, 1), name="branch1x1")(x)
        b5 = _bc(48, (1, 1), name="branch5x5_1")(x)
        b5 = _bc(64, (5, 5), p=(2, 2), name="branch5x5_2")(b5)
        b3 = _bc(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = _bc(96, (3, 3), p=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = _bc(96, (3, 3), p=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_same_excl(x)  # FID variant: count_include_pad=False
        bp = _bc(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = _bc(384, (3, 3), s=2, name="branch3x3")(x)
        bd = _bc(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = _bc(96, (3, 3), p=(1, 1), name="branch3x3dbl_2")(bd)
        bd = _bc(96, (3, 3), s=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = _bc(192, (1, 1), name="branch1x1")(x)
        b7 = _bc(c7, (1, 1), name="branch7x7_1")(x)
        b7 = _bc(c7, (1, 7), p=(0, 3), name="branch7x7_2")(b7)
        b7 = _bc(192, (7, 1), p=(3, 0), name="branch7x7_3")(b7)
        bd = _bc(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = _bc(c7, (7, 1), p=(3, 0), name="branch7x7dbl_2")(bd)
        bd = _bc(c7, (1, 7), p=(0, 3), name="branch7x7dbl_3")(bd)
        bd = _bc(c7, (7, 1), p=(3, 0), name="branch7x7dbl_4")(bd)
        bd = _bc(192, (1, 7), p=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_same_excl(x)
        bp = _bc(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = _bc(192, (1, 1), name="branch3x3_1")(x)
        b3 = _bc(320, (3, 3), s=2, name="branch3x3_2")(b3)
        b7 = _bc(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = _bc(192, (1, 7), p=(0, 3), name="branch7x7x3_2")(b7)
        b7 = _bc(192, (7, 1), p=(3, 0), name="branch7x7x3_3")(b7)
        b7 = _bc(192, (3, 3), s=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool: str  # "avg" (FIDInceptionE_1) | "max" (FIDInceptionE_2)

    @nn.compact
    def __call__(self, x):
        b1 = _bc(320, (1, 1), name="branch1x1")(x)
        b3 = _bc(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            _bc(384, (1, 3), p=(0, 1), name="branch3x3_2a")(b3),
            _bc(384, (3, 1), p=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = _bc(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = _bc(384, (3, 3), p=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            _bc(384, (1, 3), p=(0, 1), name="branch3x3dbl_3a")(bd),
            _bc(384, (3, 1), p=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool == "avg":
            bp = _avg_pool_3x3_same_excl(x)
        else:
            bp = _max_pool_3x3_same(x)
        bp = _bc(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """pool3 (2048-d) feature extractor. Input: (B, 299, 299, 3) in [-1, 1]."""

    @nn.compact
    def __call__(self, x):
        x = _bc(32, (3, 3), s=2, name="Conv2d_1a_3x3")(x)
        x = _bc(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = _bc(64, (3, 3), p=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = _bc(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = _bc(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(pool_features=32, name="Mixed_5b")(x)
        x = InceptionA(pool_features=64, name="Mixed_5c")(x)
        x = InceptionA(pool_features=64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(channels_7x7=128, name="Mixed_6b")(x)
        x = InceptionC(channels_7x7=160, name="Mixed_6c")(x)
        x = InceptionC(channels_7x7=160, name="Mixed_6d")(x)
        x = InceptionC(channels_7x7=192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(pool="avg", name="Mixed_7b")(x)
        x = InceptionE(pool="max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (B, 2048)


def preprocess(images01: jax.Array) -> jax.Array:
    """[0,1] float NHWC (any size) -> 299x299 in [-1,1] (pytorch-fid
    resize_input + normalize_input semantics)."""
    b = images01.shape[0]
    x = jax.image.resize(images01, (b, 299, 299, images01.shape[-1]), "bilinear")
    return 2.0 * x - 1.0


def init_inception(key=None):
    model = InceptionV3Features()
    key = key if key is not None else jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 299, 299, 3)))["params"]
    return model, params


def convert_inception_weights(path, template):
    """pytorch-fid / torchvision inception_v3 state dict -> our param tree.

    Handles keys like ``Mixed_5b.branch1x1.conv.weight`` and
    ``...bn.{weight,bias,running_mean,running_var}``; ignores the fc head
    and aux classifier.
    """
    from duodiff_tpu.utils.torch_convert import load_torch_state_dict

    sd = load_torch_state_dict(path)

    def build(tree, prefix):
        out = {}
        for name, sub in tree.items():
            key = f"{prefix}{name}" if not prefix else f"{prefix}.{name}"
            if isinstance(sub, dict) and "conv" in sub:  # BasicConv2d
                out[name] = {
                    "conv": {
                        "kernel": sd[f"{key}.conv.weight"].transpose(2, 3, 1, 0)
                    },
                    "bn_scale": sd[f"{key}.bn.weight"],
                    "bn_bias": sd[f"{key}.bn.bias"],
                    "bn_mean": sd[f"{key}.bn.running_mean"],
                    "bn_var": sd[f"{key}.bn.running_var"],
                }
            elif isinstance(sub, dict):
                out[name] = build(sub, key)
            else:
                raise ValueError(f"unexpected leaf at {key}")
        return out

    converted = build(template, "")
    ts = jax.tree_util.tree_structure(template)
    cs = jax.tree_util.tree_structure(converted)
    if ts != cs:
        raise ValueError(f"inception weights do not match:\n{cs}\nvs\n{ts}")

    def cast(c, t):
        c = jnp.asarray(c)
        if c.shape != t.shape:
            raise ValueError(f"shape mismatch {c.shape} vs {t.shape}")
        return c.astype(t.dtype)

    return jax.tree_util.tree_map(cast, converted, template)


def load_inception(weights_path):
    """Build the extractor and load converted pt_inception/torchvision
    weights. Raises with a clear message when the weights file is absent
    (this image has no network egress to download them).

    ``weights_path="random-init"`` skips loading (random features) — only
    for smoke-testing FID plumbing; the resulting numbers are meaningless.
    """
    from pathlib import Path

    if weights_path == "random-init":
        return init_inception()
    if not Path(weights_path).exists():
        raise FileNotFoundError(
            f"Inception weights not found at {weights_path}. FID needs the "
            "canonical pt_inception (pytorch-fid) or torchvision "
            "inception_v3 .pth; download is not possible in this "
            "environment — provide the file via --inception_weights."
        )
    model, params = init_inception()
    params = convert_inception_weights(weights_path, params)
    return model, params

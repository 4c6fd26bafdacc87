"""Configuration system.

Mirrors the reference's YAML ``model_params`` (+ optional ``autoencoder``)
contract (reference: utils/config_utils.py:5-13, main.py:203-208,
configs/*.yaml) with typed dataclasses on top of the same YAML files, so the
15 reference configs carry over verbatim.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Optional

import yaml


def load_config(path) -> dict:
    """YAML -> dict. Same contract as reference utils/config_utils.py:5-13."""
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"Config file {path} does not exist")
    with path.open("r") as f:
        return yaml.safe_load(f)


@dataclasses.dataclass(frozen=True)
class UViTConfig:
    """U-ViT model hyperparameters (reference models/uvit.py:229-247)."""

    img_size: int = 32
    patch_size: int = 2
    in_chans: int = 3
    embed_dim: int = 512
    depth: int = 13
    num_heads: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    mlp_time_embed: bool = False
    num_classes: int = -1
    normalize_timesteps: bool = True
    qk_scale: Optional[float] = None
    conv: bool = True
    skip: bool = True
    # DeeDiff probe type (reference main.py:150-161); only used by EarlyExitUViT.
    classifier_type: str = "attention_probe"

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def extras(self) -> int:
        """1 time token, +1 label token when class-conditional
        (reference models/uvit.py:274-279)."""
        return 2 if self.num_classes > 0 else 1

    @property
    def patch_dim(self) -> int:
        return self.patch_size**2 * self.in_chans

    @classmethod
    def from_dict(cls, d: dict) -> "UViTConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        known = {k: v for k, v in d.items() if k in fields}
        return cls(**known)

    @classmethod
    def from_yaml(cls, path) -> "UViTConfig":
        return cls.from_dict(load_config(path)["model_params"])

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


@dataclasses.dataclass(frozen=True)
class AutoencoderConfig:
    """Frozen KL autoencoder block (reference configs/uvit_imagenet256.yaml:15-16,
    models/utils/autoencoder.py:503-516)."""

    autoencoder_checkpoint_path: str = ""
    ch: int = 128
    ch_mult: tuple = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    resolution: int = 256
    in_channels: int = 3
    out_ch: int = 3
    scale_factor: float = 0.18215

    @classmethod
    def from_dict(cls, d: dict) -> "AutoencoderConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        known = {k: v for k, v in d.items() if k in fields}
        if "ch_mult" in known:
            known["ch_mult"] = tuple(known["ch_mult"])
        return cls(**known)


def flagship_config() -> UViTConfig:
    """The CelebA-64 U-ViT (configs/uvit_celeba.yaml) — the BASELINE.json
    headline model used by bench.py and the profiling tools."""
    return UViTConfig(
        img_size=64, patch_size=4, in_chans=3, embed_dim=512, depth=13,
        num_heads=8, mlp_ratio=4, qkv_bias=False, mlp_time_embed=False,
        num_classes=-1, normalize_timesteps=True,
    )


def load_model_config(path) -> tuple[UViTConfig, Optional[AutoencoderConfig]]:
    """Load a reference-format YAML into (UViTConfig, AutoencoderConfig | None)."""
    raw = load_config(path)
    model = UViTConfig.from_dict(raw["model_params"])
    autoenc = (
        AutoencoderConfig.from_dict(raw["autoencoder"]) if "autoencoder" in raw else None
    )
    return model, autoenc


def merge_args_with_config(args: Any, config: dict) -> Any:
    """Overlay YAML ``model_params`` onto an argparse namespace, YAML winning —
    same merge semantics as reference main.py:203-208."""
    args.__dict__.update(config["model_params"])
    if "autoencoder" in config:
        args.__dict__.update(config["autoencoder"])
    return args

from duodiff_tpu.models.uvit import UViT, init_uvit
from duodiff_tpu.models.layers import (
    patchify,
    unpatchify,
    timestep_embedding,
)

__all__ = ["UViT", "init_uvit", "patchify", "unpatchify", "timestep_embedding"]

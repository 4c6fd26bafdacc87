from duodiff_tpu.diffusion.schedule import NoiseSchedule
from duodiff_tpu.diffusion.sampling import (
    ddim_sample,
    ddpm_sample,
    duodiff_sample,
    early_exit_sample,
)

__all__ = [
    "NoiseSchedule",
    "ddpm_sample",
    "ddim_sample",
    "duodiff_sample",
    "early_exit_sample",
]

from duodiff_tpu.diffusion.cache_schedule import (
    derive_anchor_table,
    load_cache_schedule,
    save_cache_schedule,
    uniform_budget,
)
from duodiff_tpu.diffusion.continuous import ContinuousDiffusionBatcher
from duodiff_tpu.diffusion.pipeline import DuoDiffPipeline
from duodiff_tpu.diffusion.schedule import NoiseSchedule
from duodiff_tpu.diffusion.sampling import (
    ChunkedDDPMSampler,
    ChunkedEarlyExitSampler,
    ddim_sample,
    ddpm_sample,
    dpm_solver_sample,
    duodiff_sample,
    early_exit_sample,
    early_exit_select,
    make_block_cached_apply,
    make_chunked_ddpm_sampler,
    make_guided_apply,
    make_guided_apply_ee,
    make_interleaved_apply,
)

__all__ = [
    "ContinuousDiffusionBatcher",
    "DuoDiffPipeline",
    "NoiseSchedule",
    "ddpm_sample",
    "dpm_solver_sample",
    "ddim_sample",
    "duodiff_sample",
    "early_exit_sample",
    "early_exit_select",
    "ChunkedDDPMSampler",
    "ChunkedEarlyExitSampler",
    "derive_anchor_table",
    "load_cache_schedule",
    "save_cache_schedule",
    "uniform_budget",
    "make_block_cached_apply",
    "make_chunked_ddpm_sampler",
    "make_guided_apply",
    "make_guided_apply_ee",
    "make_interleaved_apply",
]

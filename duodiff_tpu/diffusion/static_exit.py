"""Static-exit (bucketed) early-exit sampling — the TPU-native answer to
DeeDiff's per-sample dynamic exits.

The reference's early-exit sampler computes EVERY layer and head at every
step and merely selects an output (eesampler.py:62-68) — zero compute is
saved. Per-sample dynamic exits fundamentally cannot save compute under
SPMD (SURVEY.md §7 "Hard parts"). What does map to TPU is the empirical
structure of the exits: the chosen layer is (almost) a function of the
timestep alone (the exit-layer-vs-timestep curves in the reference's
demos/early_exit_visualization.ipynb). So:

1. run the parity sampler once to log ``indices_by_timestep``,
2. quantize the mean exit layer into a few contiguous timestep buckets
   (:func:`derive_exit_schedule`),
3. sample with a *truncated* backbone per bucket
   (:func:`truncated_ee_apply`): only the first ``exit_layer`` blocks plus
   that layer's output head execute — static shapes, one compiled scan per
   bucket, real FLOP savings proportional to the skipped depth.

This is the same insight DuoDiff itself exploits (a shallow model for the
high-noise steps), generalized to the early-exit model's own probes/heads.
"""

from __future__ import annotations

import re
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from duodiff_tpu.config import UViTConfig
from duodiff_tpu.diffusion.sampling import ChunkedDDPMSampler
from duodiff_tpu.diffusion.schedule import NoiseSchedule
from duodiff_tpu.models.early_exit import OutputHead
from duodiff_tpu.models.uvit import UViT

Bucket = Tuple[int, int, int]  # (t_hi, t_lo, exit_layer), t range inclusive


def truncated_ee_apply(
    config: UViTConfig,
    params: dict,
    exit_layer: int,
    dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    gelu_approx: bool = False,
) -> Tuple[Callable, dict]:
    """Build ``(apply(p, x, t, y), p0)`` running an EarlyExitUViT checkpoint
    truncated at ``exit_layer``: blocks 0..exit_layer-1 + output head
    ``exit_layer`` (exit_layer == depth runs the full backbone + its own
    decoder).

    ``params`` is the EarlyExitUViT tree ({uvit, heads, probes}); heads are
    stacked with a leading depth axis, so head ``exit_layer`` is a slice.
    The weights this bucket needs are returned as ``p0`` and threaded
    through the apply_fn's first argument, so the samplers can pass them as
    a traced jit argument instead of a baked-in closure constant (see
    ChunkedDDPMSampler).
    """
    depth = config.depth
    exit_layer = int(exit_layer)
    assert 0 <= exit_layer <= depth
    uvit = UViT(
        config=config, dtype=dtype, attn_impl=attn_impl,
        gelu_approx=gelu_approx,
    )

    if exit_layer == depth:
        def apply_full(p, x, t, y):
            return uvit.apply({"params": p["uvit"]}, x, t, y)

        return apply_full, {"uvit": params["uvit"]}

    def run_truncated(mod, x, t, y):
        h = mod.embed_tokens(x, t, y)
        k = 0
        skips = []
        for blk in mod.in_blocks:
            if k == exit_layer:
                return h
            h = blk(h)
            skips.append(h)
            k += 1
        if k == exit_layer:
            return h
        h = mod.mid_block(h)
        k += 1
        for blk in mod.out_blocks:
            if k == exit_layer:
                return h
            h = blk(h, skips.pop())
            k += 1
        return h

    head = OutputHead(
        patch_dim=config.patch_dim,
        in_chans=config.in_chans,
        extras=config.extras,
        conv=True,
        dtype=dtype,
    )
    head_params = jax.tree_util.tree_map(
        lambda a: a[exit_layer], params["heads"]
    )

    def apply_truncated(p, x, t, y):
        h = uvit.apply(
            {"params": p["uvit"]}, x, t, y, method=run_truncated
        )
        return head.apply({"params": p["head"]}, h)

    return apply_truncated, {"uvit": params["uvit"], "head": head_params}


def parse_exit_schedule(spec: str) -> List[Bucket]:
    """Parse "999-700:3,699-300:8,299-0:13" into bucket tuples."""
    buckets = []
    for part in spec.split(","):
        m = re.match(r"^\s*(\d+)-(\d+):(\d+)\s*$", part)
        if not m:
            raise ValueError(f"bad exit-schedule entry {part!r}; "
                             "expected 't_hi-t_lo:layer'")
        t_hi, t_lo, layer = map(int, m.groups())
        if t_lo > t_hi:
            t_hi, t_lo = t_lo, t_hi
        buckets.append((t_hi, t_lo, layer))
    buckets.sort(key=lambda b: -b[0])
    for (hi1, lo1, _), (hi2, lo2, _) in zip(buckets, buckets[1:]):
        if lo1 != hi2 + 1:
            raise ValueError(
                f"exit schedule not contiguous: [{hi1},{lo1}] then [{hi2},{lo2}]"
            )
    return buckets


def derive_exit_schedule(
    indices_by_timestep: np.ndarray, n_buckets: int = 4,
    quantile: float = 0.5,
) -> List[Bucket]:
    """Quantize a logged (T, B) exit-index table into ``n_buckets``
    contiguous timestep buckets, taking the ceil of the ``quantile`` of the
    bucket's per-(timestep, sample) exit indices.

    Default is the MEDIAN, not the mean: measured on a trained model
    (NOTES.md round-2 fourth session), the dynamic rule's per-sample exits
    are bimodal — most samples exit deep (12-13 of 13) while a minority
    exits very early (~8), dragging the mean to ~9-10. A mean-derived
    schedule forces those mid-depth heads on EVERY sample with no per-sample
    probe gating to catch the bad ones, and the errors compound over the
    1000-step trajectory into mode collapse (measured: within-image std
    0.44, 1/4 modes) — while the median-depth static schedule preserves
    quality (std 0.027, 4/4 modes at layer 12/13 compute). Raise
    ``quantile`` toward 1.0 for an even more conservative schedule."""
    idx = np.asarray(indices_by_timestep)
    steps = idx.shape[0]
    if not 1 <= n_buckets <= steps:
        raise ValueError(
            f"n_buckets must be in [1, {steps}] (the table covers {steps} "
            f"timesteps), got {n_buckets}"
        )
    edges = np.linspace(0, steps, n_buckets + 1).astype(int)
    buckets = []
    for lo, hi in zip(edges[:-1], edges[1:]):
        layer = int(np.ceil(np.quantile(idx[lo:hi], quantile)))
        buckets.append((hi - 1, lo, layer))
    buckets.sort(key=lambda b: -b[0])
    # merge adjacent buckets with identical layers
    merged: List[Bucket] = []
    for b in buckets:
        if merged and merged[-1][2] == b[2]:
            merged[-1] = (merged[-1][0], b[1], b[2])
        else:
            merged.append(b)
    return merged


def make_static_exit_sampler(
    config: UViTConfig,
    params: dict,
    *,
    schedule: NoiseSchedule,
    buckets: Sequence[Bucket],
    dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    gelu_approx: bool = False,
    chunk: int = 100,
    guidance: tuple | None = None,
):
    """Build a reusable ``sample(key, shape, y=None)`` with per-bucket
    truncated backbones (one chunked scan per distinct exit layer). Reuse
    the returned callable across invocations — the jitted chunks live in
    its closure, so rebuilding per call would re-trace everything (measured
    4x slower end to end). Buckets must cover [0, steps-1] descending."""
    buckets = sorted(buckets, key=lambda b: -b[0])
    assert buckets[0][0] == schedule.steps - 1 and buckets[-1][1] == 0, (
        "buckets must cover the full timestep range"
    )
    samplers = {}
    for _, _, layer in buckets:
        if layer not in samplers:
            apply, bucket_params = truncated_ee_apply(
                config, params, layer, dtype, attn_impl, gelu_approx
            )
            if guidance is not None:
                # each truncated backbone is single-output, so plain CFG
                # wrapping applies per bucket (guidance=(scale, null_label);
                # the threaded params tree passes through the wrapper)
                from duodiff_tpu.diffusion.sampling import make_guided_apply

                apply = make_guided_apply(apply, *guidance)
            samplers[layer] = ChunkedDDPMSampler(
                apply,
                schedule,
                parametrization="predict_noise",
                chunk=chunk,
                params=bucket_params,
            )

    def sample(key, shape, y=None):
        x, key = samplers[buckets[0][2]].init(key, shape)
        for t_hi, t_lo, layer in buckets:
            x, key = samplers[layer].run(x, key, t_hi, t_lo, y)
        return x

    return sample


def static_exit_sample(
    config: UViTConfig,
    params: dict,
    key: jax.Array,
    *,
    schedule: NoiseSchedule,
    shape: Sequence[int],
    buckets: Sequence[Bucket],
    y=None,
    dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    gelu_approx: bool = False,
    chunk: int = 100,
    guidance: tuple | None = None,
):
    """One-shot convenience over make_static_exit_sampler."""
    sampler = make_static_exit_sampler(
        config, params, schedule=schedule, buckets=buckets, dtype=dtype,
        attn_impl=attn_impl, gelu_approx=gelu_approx, chunk=chunk,
        guidance=guidance,
    )
    return sampler(key, shape, y)



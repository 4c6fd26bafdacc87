"""Profiling & tracing (SURVEY.md §5: the reference has none — wall-clock
only, sampler.py:327-346). Here: jax.profiler device traces viewable in
TensorBoard/Perfetto, plus a lightweight step timer that reports
steps/sec and device-time utilization estimates."""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(logdir):
    """Capture a device trace (XLA ops, fusion, HBM/ICI activity) into
    ``logdir`` — open with TensorBoard's profile plugin or Perfetto."""
    logdir = str(logdir)
    Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling steps/sec + images/sec tracker for training loops."""

    def __init__(self, window: int = 50):
        self.window = window
        self._t0 = None
        self._count = 0

    def tick(self) -> dict:
        now = time.time()
        self._count += 1
        if self._t0 is None:
            self._t0 = now
            return {}
        if self._count % self.window == 0:
            dt = now - self._t0
            self._t0 = now
            return {"steps_per_sec": self.window / dt}
        return {}


def flops_per_uvit_forward(cfg, batch: int) -> float:
    """Analytic FLOPs for one U-ViT forward (2*MACs), for MXU-utilization
    estimates: depth blocks of (qkv + attn + proj + mlp) plus embed/decode."""
    L = cfg.extras + cfg.num_patches
    D = cfg.embed_dim
    per_block = 2 * L * D * 3 * D + 4 * L * L * D + 2 * L * D * D + \
        2 * 2 * L * D * int(cfg.mlp_ratio * D)
    skip_linears = (cfg.depth // 2) * 2 * L * 2 * D * D
    embed = 2 * L * cfg.patch_dim * D
    decode = 2 * L * D * cfg.patch_dim
    return batch * (cfg.depth * per_block + skip_linears + embed + decode)

"""Pipeline-parallel DuoDiff sampling over two disjoint device submeshes.

DuoDiff's shallow->full handoff (reference sampler.py:135-136) is a temporal
two-stage pipeline: the shallow model denoises the first ``t_switch``
reverse steps (timesteps T-1 down to T-t_switch, the high-noise regime),
the full model the remaining T-t_switch steps (T-t_switch-1 down to 0). On
a single device the stages run back to back; on a pod, placing each model
on its OWN device subset turns a stream of micro-batches into a classic
software pipeline — stage 1 of micro-batch i runs on submesh A concurrently
with stage 2 of micro-batch i-1 on submesh B, overlapped purely by JAX's
async dispatch (the host never blocks between dispatching A's and B's
work). SURVEY.md §2b flags this handoff as "the one place the build can map
two models onto disjoint device subsets".

Steady-state throughput is set by max(stage_A_time, stage_B_time) instead
of their sum. Stage A costs ~t_switch x depth_shallow model-calls, stage B
(T - t_switch) x depth_full — balancing them needs a LARGE t_switch (e.g.
depth 3 vs 13 at T=1000 balances near t_switch ~= 810); at the paper's
quality-motivated t_switch=300 the full-model stage dominates and the
overlap hides the entire shallow stage. Within each submesh the micro-batch
is data-parallel (batch axis sharded; weights replicated).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax

from duodiff_tpu.diffusion.sampling import ChunkedDDPMSampler
from duodiff_tpu.parallel import batch_sharding, create_mesh


class DuoDiffPipeline:
    """Two-submesh pipelined DuoDiff sampler.

    apply_shallow/apply_full: ``fn(params, x, t, y)`` (params threaded as a
    traced argument — the weight-free-executable convention). Each submesh
    gets its own :class:`ChunkedDDPMSampler`; results are bit-identical to
    running the sequential DuoDiff segments with the same per-micro-batch
    keys (tested in tests/test_pipeline.py).
    """

    def __init__(
        self,
        apply_shallow,
        shallow_params,
        apply_full,
        full_params,
        schedule,
        *,
        t_switch: int,
        devices_a: Sequence = None,
        devices_b: Sequence = None,
        parametrization: str = "predict_noise",
        chunk: int = 100,
    ):
        if not 0 < t_switch <= schedule.steps:
            raise ValueError(f"t_switch must be in (0, {schedule.steps}]")
        devs = jax.devices()
        if devices_a is None or devices_b is None:
            if len(devs) < 2:
                raise ValueError(
                    "pipeline parallelism needs >= 2 devices "
                    f"(have {len(devs)})"
                )
            half = len(devs) // 2
            devices_a, devices_b = devs[:half], devs[half : 2 * half]
        self.mesh_a = create_mesh(shape=(len(devices_a), 1),
                                  devices=list(devices_a))
        self.mesh_b = create_mesh(shape=(len(devices_b), 1),
                                  devices=list(devices_b))
        self.shard_a = batch_sharding(self.mesh_a)
        self.shard_b = batch_sharding(self.mesh_b)
        # replicate each model's weights within its own submesh only
        from duodiff_tpu.parallel import replicate

        shallow_params = jax.device_put(shallow_params,
                                        replicate(self.mesh_a))
        full_params = jax.device_put(full_params, replicate(self.mesh_b))
        self._rep_a = replicate(self.mesh_a)
        self._rep_b = replicate(self.mesh_b)
        self._label_shard_b = batch_sharding(self.mesh_b, ndim=1)
        self.sampler_a = ChunkedDDPMSampler(
            apply_shallow, schedule, parametrization=parametrization,
            chunk=chunk, params=shallow_params,
        )
        self.sampler_b = ChunkedDDPMSampler(
            apply_full, schedule, parametrization=parametrization,
            chunk=chunk, params=full_params,
        )
        self.schedule = schedule
        self.handoff = schedule.steps - t_switch

    def _stage1(self, key, shape, y):
        # batch not divisible by the submesh -> replicate (the samplers'
        # usual fallback; values are placement-independent)
        shard = (self.shard_a
                 if shape[0] % self.mesh_a.devices.size == 0
                 else self._rep_a)
        x, key = self.sampler_a.init(key, shape, sharding=shard)
        return self.sampler_a.run(x, key, self.schedule.steps - 1,
                                  self.handoff, y)

    def _stage2(self, x_mid, key, y):
        # stage-1 outputs are committed to submesh A; hand the carry (and
        # the key, itself a stage-1 output) across to submesh B explicitly
        divisible = x_mid.shape[0] % self.mesh_b.devices.size == 0
        x_mid = jax.device_put(
            x_mid, self.shard_b if divisible else self._rep_b
        )
        if self.handoff == 0:
            return x_mid
        key = jax.device_put(key, self._rep_b)
        if y is not None:
            y = jax.device_put(
                y, self._label_shard_b if divisible else self._rep_b
            )
        x, _ = self.sampler_b.run(x_mid, key, self.handoff - 1, 0, y)
        return x

    def sample_stream(self, keys, shape, y=None):
        """Yield one final sample batch per key, software-pipelined:
        stage 1 of key i+1 is dispatched BEFORE blocking on stage 2 of key
        i, so submesh A computes ahead while the host waits on submesh B.
        ``y`` may be a list/tuple of per-key label batches."""
        keys = list(keys)
        ys = list(y) if isinstance(y, (list, tuple)) else [y] * len(keys)
        if len(ys) != len(keys):
            raise ValueError(f"{len(ys)} label batches for {len(keys)} keys")
        pending = None
        for key, yy in zip(keys, ys):
            x_mid, k2 = self._stage1(key, shape, yy)  # async on A
            if pending is not None:
                yield jax.block_until_ready(pending)  # B drains, A busy
            pending = self._stage2(x_mid, k2, yy)  # async on B
        if pending is not None:
            yield jax.block_until_ready(pending)

    def sample(self, keys, shape, y=None):
        """Convenience: list of final batches, one per key."""
        return list(self.sample_stream(keys, shape, y))

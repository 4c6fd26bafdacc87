"""DuoDiffPipeline: two-submesh pipelined DuoDiff sampling.

Pins (1) bit-equality of every pipelined micro-batch against the sequential
DuoDiff segment composition with the same keys, (2) submesh placement of
each model's weights, (3) the t_switch == steps degenerate case (shallow
only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from duodiff_tpu.config import UViTConfig
from duodiff_tpu.diffusion import (
    ChunkedDDPMSampler,
    DuoDiffPipeline,
    NoiseSchedule,
)
from duodiff_tpu.models.uvit import init_uvit

SHALLOW = UViTConfig(
    img_size=16, patch_size=4, in_chans=3, embed_dim=32, depth=3,
    num_heads=4, mlp_ratio=2, num_classes=-1, normalize_timesteps=True,
)
FULL = UViTConfig(
    img_size=16, patch_size=4, in_chans=3, embed_dim=32, depth=5,
    num_heads=4, mlp_ratio=2, num_classes=-1, normalize_timesteps=True,
)


@pytest.fixture(scope="module")
def models():
    m_s, p_s = init_uvit(SHALLOW, jax.random.PRNGKey(0), dtype=jnp.float32)
    m_f, p_f = init_uvit(FULL, jax.random.PRNGKey(1), dtype=jnp.float32)

    def apply_s(p, x, t, y):
        return m_s.apply({"params": p}, x, t, y)

    def apply_f(p, x, t, y):
        return m_f.apply({"params": p}, x, t, y)

    return apply_s, p_s, apply_f, p_f


def _sequential(apply_s, p_s, apply_f, p_f, sched, t_switch, key, shape):
    """The sampler.py DuoDiff composition: shallow segment then full."""
    handoff = sched.steps - t_switch
    a = ChunkedDDPMSampler(apply_s, sched, chunk=7, params=p_s)
    b = ChunkedDDPMSampler(apply_f, sched, chunk=7, params=p_f)
    x, key = a.init(key, shape)
    x, key = a.run(x, key, sched.steps - 1, handoff, None)
    if handoff > 0:
        x, key = b.run(x, key, handoff - 1, 0, None)
    return x


def test_pipeline_matches_sequential(models):
    apply_s, p_s, apply_f, p_f = models
    sched = NoiseSchedule.create(steps=20)
    shape = (4, 16, 16, 3)
    pipe = DuoDiffPipeline(
        apply_s, p_s, apply_f, p_f, sched, t_switch=8, chunk=7,
    )
    # disjoint submeshes actually used
    assert set(pipe.mesh_a.devices.flat).isdisjoint(
        set(pipe.mesh_b.devices.flat)
    )
    keys = [jax.random.PRNGKey(s) for s in (11, 12, 13)]
    outs = pipe.sample(keys, shape)
    assert len(outs) == 3
    for key, out in zip(keys, outs):
        # pipelined dispatch is BIT-identical to draining each micro-batch
        # through both stages before starting the next (same placement)
        x_mid, k2 = pipe._stage1(key, shape, None)
        one = jax.block_until_ready(pipe._stage2(x_mid, k2, None))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(one))
        # and matches the sampler.py sequential DuoDiff composition on the
        # default single-device placement to fp32 layout-rounding
        ref = _sequential(apply_s, p_s, apply_f, p_f, sched, 8, key, shape)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
        )


def test_pipeline_shallow_only(models):
    apply_s, p_s, apply_f, p_f = models
    sched = NoiseSchedule.create(steps=12)
    shape = (2, 16, 16, 3)
    pipe = DuoDiffPipeline(
        apply_s, p_s, apply_f, p_f, sched, t_switch=12, chunk=6,
    )
    (out,) = pipe.sample([jax.random.PRNGKey(3)], shape)
    ref = _sequential(
        apply_s, p_s, apply_f, p_f, sched, 12, jax.random.PRNGKey(3), shape
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_pipeline_validates_t_switch(models):
    apply_s, p_s, apply_f, p_f = models
    sched = NoiseSchedule.create(steps=10)
    with pytest.raises(ValueError):
        DuoDiffPipeline(apply_s, p_s, apply_f, p_f, sched, t_switch=0)
    with pytest.raises(ValueError):
        DuoDiffPipeline(apply_s, p_s, apply_f, p_f, sched, t_switch=11)

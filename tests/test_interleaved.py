"""Interleaved heavy-light sampling (make_interleaved_apply): full model on
t % N == 0, shallow elsewhere, inside one chunked scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from duodiff_tpu.config import UViTConfig
from duodiff_tpu.diffusion import (
    ChunkedDDPMSampler,
    NoiseSchedule,
    make_interleaved_apply,
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


def test_every_one_equals_full_model(models):
    apply_s, p_s, apply_f, p_f = models
    sched = NoiseSchedule.create(steps=12)
    shape = (2, 16, 16, 3)
    inter = ChunkedDDPMSampler(
        make_interleaved_apply(apply_f, apply_s, every=1), sched, chunk=5,
        params={"full": p_f, "shallow": p_s},
    )
    dense = ChunkedDDPMSampler(apply_f, sched, chunk=5, params=p_f)
    key = jax.random.PRNGKey(7)
    np.testing.assert_array_equal(
        np.asarray(inter.sample(key, shape)),
        np.asarray(dense.sample(key, shape)),
    )


def test_interleaving_matches_manual_alternation(models):
    """every=2 inside the scan is bit-identical to composing 1-step
    segments that alternate the two dense samplers by t parity (the
    chunked samplers' segment-composition property)."""
    apply_s, p_s, apply_f, p_f = models
    sched = NoiseSchedule.create(steps=10)
    shape = (2, 16, 16, 3)
    inter = ChunkedDDPMSampler(
        make_interleaved_apply(apply_f, apply_s, every=2), sched, chunk=4,
        params={"full": p_f, "shallow": p_s},
    )
    key = jax.random.PRNGKey(3)
    got = np.asarray(inter.sample(key, shape))

    full = ChunkedDDPMSampler(apply_f, sched, chunk=4, params=p_f)
    shal = ChunkedDDPMSampler(apply_s, sched, chunk=4, params=p_s)
    x, k = full.init(key, shape)
    for t in range(sched.steps - 1, -1, -1):
        sampler = full if t % 2 == 0 else shal
        x, k = sampler.run(x, k, t, t, None)
    np.testing.assert_array_equal(got, np.asarray(x))


def test_interleaved_validates_every(models):
    apply_s, _, apply_f, _ = models
    with pytest.raises(ValueError):
        make_interleaved_apply(apply_f, apply_s, every=0)

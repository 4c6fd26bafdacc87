"""Static-exit sampling tests: truncated forward correctness vs the full
EarlyExitUViT outputs, schedule parsing/derivation, and the bucketed
sampler end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from duodiff_tpu.config import UViTConfig
from duodiff_tpu.diffusion import NoiseSchedule
from duodiff_tpu.diffusion.static_exit import (
    derive_exit_schedule,
    parse_exit_schedule,
    static_exit_sample,
    truncated_ee_apply,
)
from duodiff_tpu.models.early_exit import init_early_exit_uvit

CFG = UViTConfig(
    img_size=16, patch_size=2, in_chans=3, embed_dim=32, depth=5, num_heads=4,
    mlp_ratio=4, num_classes=-1, normalize_timesteps=True,
    classifier_type="mlp_probe_per_layer",
)


@pytest.fixture(scope="module")
def ee_model():
    return init_early_exit_uvit(CFG, jax.random.PRNGKey(0))


@pytest.mark.parametrize("exit_layer", [0, 2, 3, 5])
def test_truncated_matches_full_head_outputs(ee_model, exit_layer):
    """truncated_ee_apply(k) must equal g[k] from the full forward
    (or the backbone output at k == depth)."""
    model, params = ee_model
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 3), jnp.float32)
    t = jnp.array([100.0, 100.0])
    bb, u, g = model.apply({"params": params}, x, t)

    apply_fn, p0 = truncated_ee_apply(CFG, params, exit_layer, dtype=jnp.float32)
    out = apply_fn(p0, x, t, None)
    want = np.asarray(bb) if exit_layer == CFG.depth else np.asarray(g[exit_layer])
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


def test_parse_exit_schedule():
    buckets = parse_exit_schedule("999-700:3,699-300:8,299-0:13")
    assert buckets == [(999, 700, 3), (699, 300, 8), (299, 0, 13)]
    with pytest.raises(ValueError):
        parse_exit_schedule("999-700:3,600-0:8")  # gap


def test_derive_exit_schedule():
    # synthetic: exits rise from 2 to 8 as t decreases
    T = 100
    idx = np.repeat(
        np.linspace(8, 2, T)[:, None].round(), 4, axis=1
    )  # (T, B), indexed by t
    buckets = derive_exit_schedule(idx, n_buckets=4)
    assert buckets[0][0] == T - 1 and buckets[-1][1] == 0
    # high-noise (large t) buckets exit earlier (smaller layer)
    assert buckets[0][2] <= buckets[-1][2]
    # contiguous
    for a, b in zip(buckets, buckets[1:]):
        assert a[1] == b[0] + 1


def test_static_exit_sample_runs(ee_model):
    _, params = ee_model
    sched = NoiseSchedule.create(steps=20)
    buckets = [(19, 10, 1), (9, 0, 5)]
    x = static_exit_sample(
        CFG, params, jax.random.PRNGKey(0), schedule=sched,
        shape=(2, 16, 16, 3), buckets=buckets, dtype=jnp.float32, chunk=7,
    )
    assert x.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(x)))

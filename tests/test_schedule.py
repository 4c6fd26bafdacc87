"""NoiseSchedule golden-value tests.

The reference never tests its scheduler math (SURVEY.md §4); these pin the
linear-beta schedule and the three reverse-step parametrizations against
hand-computed numpy values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from duodiff_tpu.diffusion import NoiseSchedule


@pytest.fixture(scope="module")
def sched():
    return NoiseSchedule.create()


def _np_schedule(steps=1000):
    betas = np.linspace(1e-4, 0.02, steps, dtype=np.float64)
    alphas = 1 - betas
    alphas_bar = np.cumprod(alphas)
    alphas_bar_prev = np.concatenate([[1.0], alphas_bar[:-1]])
    betas_tilde = (1 - alphas_bar_prev) / (1 - alphas_bar) * betas
    return betas, alphas, alphas_bar, alphas_bar_prev, betas_tilde


def test_schedule_arrays_match_reference_math(sched):
    betas, alphas, alphas_bar, alphas_bar_prev, betas_tilde = _np_schedule()
    np.testing.assert_allclose(sched.betas, betas, rtol=1e-5)
    np.testing.assert_allclose(sched.alphas, alphas, rtol=1e-5)
    np.testing.assert_allclose(sched.alphas_bar, alphas_bar, rtol=1e-4)
    np.testing.assert_allclose(sched.alphas_bar_prev, alphas_bar_prev, rtol=1e-4)
    np.testing.assert_allclose(sched.betas_tilde, betas_tilde, rtol=1e-3, atol=1e-9)
    # spot golden values
    assert np.isclose(float(sched.betas[0]), 1e-4)
    assert np.isclose(float(sched.betas[-1]), 0.02)
    assert float(sched.betas_tilde[0]) == 0.0  # alpha_bar_prev[0] == 1


def test_add_noise_interpolates(sched):
    key = jax.random.PRNGKey(0)
    x0 = jnp.ones((4, 8, 8, 3))
    t = jnp.array([0, 10, 500, 999])
    noise, noisy = sched.add_noise(key, x0, t)
    assert noisy.shape == x0.shape and noise.shape == x0.shape
    # noisy = sqrt(abar) * x0 + sqrt(1-abar) * noise, verify algebraically
    abar = np.asarray(sched.alphas_bar)[np.asarray(t)].reshape(-1, 1, 1, 1)
    recon = np.sqrt(abar) * np.asarray(x0) + np.sqrt(1 - abar) * np.asarray(noise)
    np.testing.assert_allclose(np.asarray(noisy), recon, rtol=1e-5, atol=1e-6)


def test_step_predict_noise_golden(sched):
    # at t: x_{t-1} = 1/sqrt(a) (x - (1-a)/sqrt(1-abar) eps) + sqrt(btilde) z
    betas, alphas, alphas_bar, _, betas_tilde = _np_schedule()
    t = 500
    x = np.full((2, 4, 4, 3), 0.7, np.float32)
    eps = np.full_like(x, -0.3)
    z = np.full_like(x, 1.5)
    want = (
        np.sqrt(1 / alphas[t])
        * (x - (1 - alphas[t]) / np.sqrt(1 - alphas_bar[t]) * eps)
    ) + np.sqrt(betas_tilde[t]) * z
    got = sched.step_predict_noise(jnp.asarray(eps), jnp.asarray(x), t, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)


def test_step_predict_original_golden(sched):
    betas, alphas, alphas_bar, alphas_bar_prev, betas_tilde = _np_schedule()
    t = 250
    x = np.full((1, 4, 4, 3), -0.2, np.float32)
    x0 = np.full_like(x, 0.9)
    z = np.zeros_like(x)
    want = (
        np.sqrt(alphas_bar_prev[t]) * betas[t] * x0 / (1 - alphas_bar[t])
        + np.sqrt(alphas[t]) * (1 - alphas_bar_prev[t]) * x / (1 - alphas_bar[t])
    )
    got = sched.step_predict_original(jnp.asarray(x0), jnp.asarray(x), t, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)


def test_step_predict_previous_golden(sched):
    _, _, _, _, betas_tilde = _np_schedule()
    t = 100
    pred = np.full((1, 2, 2, 3), 0.1, np.float32)
    z = np.full_like(pred, 2.0)
    want = pred + np.sqrt(betas_tilde[t]) * z
    got = sched.step_predict_previous(jnp.asarray(pred), None, t, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_ddim_step_eta0_deterministic(sched):
    _, _, alphas_bar, _, _ = _np_schedule()
    t, s = 999, 979
    x = np.random.RandomState(0).randn(2, 4, 4, 3).astype(np.float32)
    eps = np.random.RandomState(1).randn(2, 4, 4, 3).astype(np.float32)
    want = np.sqrt(alphas_bar[s] / alphas_bar[t]) * (
        x - np.sqrt(1 - alphas_bar[t]) * eps
    ) + np.sqrt(1 - alphas_bar[s]) * eps
    got = sched.ddim_step(
        jnp.asarray(eps), jnp.asarray(x), t, s, jnp.zeros_like(jnp.asarray(x)), eta=0.0
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_predict_previous_target_golden(sched):
    # reference trainer.py:326-352 closed-form posterior mean target
    betas, alphas, alphas_bar, alphas_bar_prev, _ = _np_schedule()
    ts = np.array([3, 77, 912])
    clean = np.random.RandomState(2).randn(3, 4, 4, 3).astype(np.float32)
    noisy = np.random.RandomState(3).randn(3, 4, 4, 3).astype(np.float32)
    cc = (np.sqrt(alphas_bar_prev[ts]) * betas[ts] / (1 - alphas_bar[ts]))[
        :, None, None, None
    ]
    nc = (np.sqrt(alphas[ts]) * (1 - alphas_bar_prev[ts]) / (1 - alphas_bar[ts]))[
        :, None, None, None
    ]
    want = cc * clean + nc * noisy
    got = sched.predict_previous_target(
        jnp.asarray(clean), jnp.asarray(noisy), jnp.asarray(ts)
    )
    # fp32 cancellation in 1 - alphas_bar[t] at small t bounds the accuracy
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)


def test_schedule_is_pytree(sched):
    # must flow through jit/scan as a static-shaped pytree
    leaves = jax.tree_util.tree_leaves(sched)
    assert len(leaves) == 5
    out = jax.jit(lambda s: s.betas.sum())(sched)
    assert np.isfinite(float(out))

"""Training-free block caching (make_block_cached_apply + UViT.forward_anchor
/ forward_cached): middle blocks recompute only on anchor steps, their
residual delta substitutes in between (Delta-DiT / DeepCache family)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from duodiff_tpu.config import UViTConfig
from duodiff_tpu.diffusion import (
    ChunkedDDPMSampler,
    NoiseSchedule,
    make_block_cached_apply,
)
from duodiff_tpu.models.uvit import init_uvit

CFG = UViTConfig(
    img_size=16, patch_size=4, in_chans=3, embed_dim=32, depth=5,
    num_heads=4, mlp_ratio=2, num_classes=-1, normalize_timesteps=True,
)


@pytest.fixture(scope="module")
def model():
    m, p = init_uvit(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    return m, p


def _token_len():
    n_patches = (CFG.img_size // CFG.patch_size) ** 2
    return n_patches + 1  # + time token (no class token, num_classes=-1)


def test_forward_anchor_and_fresh_cache_match_call(model):
    """forward_anchor's prediction is bit-identical to __call__, and
    forward_cached consuming the delta AT THE SAME x reproduces __call__
    exactly (region_out = region_in + delta by construction)."""
    m, p = model
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.full((2,), 5.0)
    full = m.apply({"params": p}, x, t, None)
    for n_outer in (1, 2):  # 2 == depth//2: cached region = mid block only
        anchor, delta = m.apply(
            {"params": p}, x, t, None, n_outer=n_outer,
            method=m.forward_anchor,
        )
        np.testing.assert_array_equal(np.asarray(anchor), np.asarray(full))
        assert delta.shape == (2, _token_len(), CFG.embed_dim)
        cached = m.apply(
            {"params": p}, x, t, None, n_outer=n_outer, delta=delta,
            method=m.forward_cached,
        )
        np.testing.assert_allclose(
            np.asarray(cached), np.asarray(full), atol=1e-5
        )


def _cached_sampler(m, p, every, chunk, steps):
    sched = NoiseSchedule.create(steps=steps)

    def apply_fn(params, state, x, t, y):
        inner = make_block_cached_apply(
            lambda xx, tt, yy: m.apply(
                {"params": params}, xx, tt, yy, n_outer=1,
                method=m.forward_anchor,
            ),
            lambda xx, tt, yy, d: m.apply(
                {"params": params}, xx, tt, yy, n_outer=1, delta=d,
                method=m.forward_cached,
            ),
            every, steps - 1,
        )
        return inner(state, x, t, y)

    def init_state(x):
        return jnp.zeros((x.shape[0], _token_len(), CFG.embed_dim))

    return ChunkedDDPMSampler(
        apply_fn, sched, chunk=chunk, params=p, init_state_fn=init_state,
    ), sched


def test_every_one_equals_dense(model):
    """every=1 anchors every step -> bit-identical to the plain sampler."""
    m, p = model
    shape = (2, 16, 16, 3)
    cached, sched = _cached_sampler(m, p, every=1, chunk=5, steps=12)
    dense = ChunkedDDPMSampler(
        lambda params, x, t, y: m.apply({"params": params}, x, t, y),
        sched, chunk=5, params=p,
    )
    key = jax.random.PRNGKey(7)
    np.testing.assert_array_equal(
        np.asarray(cached.sample(key, shape)),
        np.asarray(dense.sample(key, shape)),
    )


def test_chunk_size_invariance(model):
    """The delta state threads across chunk boundaries, so results do not
    depend on the chunk size (the stateful carry contract)."""
    m, p = model
    shape = (2, 16, 16, 3)
    key = jax.random.PRNGKey(3)
    a, _ = _cached_sampler(m, p, every=3, chunk=4, steps=11)
    b, _ = _cached_sampler(m, p, every=3, chunk=11, steps=11)
    np.testing.assert_array_equal(
        np.asarray(a.sample(key, shape)), np.asarray(b.sample(key, shape))
    )


def test_matches_manual_alternation(model):
    """The in-scan anchor/cached switching is bit-identical to a manual
    host loop that calls forward_anchor on t % every == 0 or t == T-1 and
    forward_cached (with the last anchor's delta) elsewhere."""
    m, p = model
    steps, every = 9, 3
    shape = (2, 16, 16, 3)
    key = jax.random.PRNGKey(5)
    cached, sched = _cached_sampler(m, p, every=every, chunk=steps, steps=steps)
    got = np.asarray(cached.sample(key, shape))

    k, init_key = jax.random.split(key)
    x = jax.random.normal(init_key, shape)
    delta = None
    for t in range(steps - 1, -1, -1):
        k, zkey = jax.random.split(k)
        tb = jnp.full((shape[0],), float(t))
        if t % every == 0 or t == steps - 1:
            eps, delta = m.apply(
                {"params": p}, x, tb, None, n_outer=1,
                method=m.forward_anchor,
            )
        else:
            eps = m.apply(
                {"params": p}, x, tb, None, n_outer=1, delta=delta,
                method=m.forward_cached,
            )
        z = (
            jax.random.normal(zkey, shape)
            if t > 0 else jnp.zeros(shape)
        )
        x = sched.step("predict_noise", eps, x, t, z, "beta_tilde")
    np.testing.assert_allclose(got, np.asarray(x), atol=1e-5)


def test_anchor_table_uniform_equals_every(model):
    """A boolean anchor table equal to the uniform rule is bit-identical to
    passing the int period (the --cache_schedule contract)."""
    m, p = model
    from duodiff_tpu.diffusion.cache_schedule import uniform_table

    steps, every = 11, 3
    shape = (2, 16, 16, 3)
    key = jax.random.PRNGKey(9)
    a, _ = _cached_sampler(m, p, every=every, chunk=4, steps=steps)
    table = jnp.asarray(uniform_table(every, steps))
    b, _ = _cached_sampler(m, p, every=table, chunk=4, steps=steps)
    np.testing.assert_array_equal(
        np.asarray(a.sample(key, shape)), np.asarray(b.sample(key, shape))
    )


def test_anchor_table_matches_manual(model):
    """A non-uniform anchor table follows exactly the listed timesteps
    (plus the forced first reverse step), verified against a manual loop."""
    m, p = model
    steps = 10
    anchors = {0, 4, 7}  # deliberately non-uniform
    table = jnp.asarray(
        np.isin(np.arange(steps), sorted(anchors))
    )
    shape = (2, 16, 16, 3)
    key = jax.random.PRNGKey(11)
    cached, sched = _cached_sampler(m, p, every=table, chunk=steps,
                                    steps=steps)
    got = np.asarray(cached.sample(key, shape))

    k, init_key = jax.random.split(key)
    x = jax.random.normal(init_key, shape)
    delta = None
    for t in range(steps - 1, -1, -1):
        k, zkey = jax.random.split(k)
        tb = jnp.full((shape[0],), float(t))
        if t in anchors or t == steps - 1:
            eps, delta = m.apply(
                {"params": p}, x, tb, None, n_outer=1,
                method=m.forward_anchor,
            )
        else:
            eps = m.apply(
                {"params": p}, x, tb, None, n_outer=1, delta=delta,
                method=m.forward_cached,
            )
        z = (
            jax.random.normal(zkey, shape)
            if t > 0 else jnp.zeros(shape)
        )
        x = sched.step("predict_noise", eps, x, t, z, "beta_tilde")
    np.testing.assert_allclose(got, np.asarray(x), atol=1e-5)


def test_anchor_table_validation():
    def f2(*a, **k):
        raise AssertionError("must not be called")

    with pytest.raises(ValueError, match="1-D boolean"):
        make_block_cached_apply(f2, f2, jnp.zeros((4,), jnp.int32), 3)
    with pytest.raises(ValueError, match="every must be"):
        make_block_cached_apply(f2, f2, 0, 3)


def _dpm_cache_tuple(m, p, every):
    return (
        lambda xx, tt, yy: m.apply(
            {"params": p}, xx, tt, yy, n_outer=1, method=m.forward_anchor,
        ),
        lambda xx, tt, yy, d: m.apply(
            {"params": p}, xx, tt, yy, n_outer=1, delta=d,
            method=m.forward_cached,
        ),
        every,
        lambda xx: jnp.zeros((xx.shape[0], _token_len(), CFG.embed_dim)),
    )


def test_dpm_cached_every_one_equals_dense(model):
    """cache every=1 anchors every solver transition -> bit-identical to
    the dense DPM-Solver++ run (forward_anchor's prediction == __call__)."""
    from duodiff_tpu.diffusion.sampling import dpm_solver_sample

    m, p = model
    shape = (2, 16, 16, 3)
    sched = NoiseSchedule.create(steps=50)
    key = jax.random.PRNGKey(11)
    dense = dpm_solver_sample(
        lambda xx, tt, yy: m.apply({"params": p}, xx, tt, yy),
        key, schedule=sched, shape=shape, dpm_steps=8,
    )
    cached = dpm_solver_sample(
        lambda *a: None, key, schedule=sched, shape=shape, dpm_steps=8,
        cache=_dpm_cache_tuple(m, p, every=1),
    )
    np.testing.assert_array_equal(np.asarray(cached), np.asarray(dense))


def test_dpm_cached_matches_manual_alternation(model):
    """Index-based anchoring inside the solver scan is bit-identical to a
    manual host loop over dpm_solver_tables that runs forward_anchor on
    transitions i % every == 0 and forward_cached with the last anchor's
    delta elsewhere (order-2 multistep update replicated host-side)."""
    from duodiff_tpu.diffusion.sampling import (
        dpm_solver_sample,
        dpm_solver_tables,
    )

    m, p = model
    every, dpm_steps = 2, 7
    shape = (2, 16, 16, 3)
    sched = NoiseSchedule.create(steps=40)
    key = jax.random.PRNGKey(13)
    got = np.asarray(dpm_solver_sample(
        lambda *a: None, key, schedule=sched, shape=shape,
        dpm_steps=dpm_steps, cache=_dpm_cache_tuple(m, p, every=every),
    ))

    consts = {k: np.asarray(v) for k, v in
              dpm_solver_tables(sched, dpm_steps).items()}
    _, init_key = jax.random.split(key)
    x = jax.random.normal(init_key, shape)
    x0_prev = jnp.zeros_like(x)
    delta = None
    for i in range(consts["phi"].shape[0]):
        tb = jnp.full((shape[0],), float(consts["t_prev"][i]))
        if i % every == 0:
            eps, delta = m.apply(
                {"params": p}, x, tb, None, n_outer=1,
                method=m.forward_anchor,
            )
        else:
            eps = m.apply(
                {"params": p}, x, tb, None, n_outer=1, delta=delta,
                method=m.forward_cached,
            )
        x0 = (x - consts["sigma_prev"][i] * eps) / consts["alpha_prev"][i]
        if consts["is_first"][i] > 0:
            d = x0
        else:
            d = consts["c_cur"][i] * x0 - consts["c_prev"][i] * x0_prev
        x = (consts["sigma_ratio"][i] * x
             - consts["alpha_t"][i] * consts["phi"][i] * d)
        x0_prev = x0
    np.testing.assert_allclose(got, np.asarray(x), atol=1e-5)

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
    cache_outer_for,
    derive_exit_schedule,
    parse_exit_schedule,
    static_exit_sample,
    truncated_ee_apply,
    truncated_ee_apply_cached,
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


def test_cache_outer_for():
    """Validity rule: the centered cached region (in[p:]+mid+out[:k-p])
    must end before the truncation point — p > 2k - exit_layer — and exits
    at/inside the mid block have nothing to cache."""
    # depth 5, k = 2: default p = 1
    assert cache_outer_for(5, 5) == 1
    assert cache_outer_for(5, 4) == 1
    assert cache_outer_for(5, 3) == 2  # auto-raised to the minimum
    assert cache_outer_for(5, 2) is None  # 2k - e + 1 = 3 > k
    assert cache_outer_for(5, 0) is None
    # explicit cache_outer is honored when valid, raised when too small
    assert cache_outer_for(5, 5, cache_outer=2) == 2
    assert cache_outer_for(5, 3, cache_outer=1) == 2
    # depth 13 flagship, k = 6: default ceil(6/3) = 2
    assert cache_outer_for(13, 13) == 2
    assert cache_outer_for(13, 12) == 2
    assert cache_outer_for(13, 11) == 2
    assert cache_outer_for(13, 10) == 3
    assert cache_outer_for(13, 6) is None


@pytest.mark.parametrize("exit_layer", [3, 4, 5])
def test_truncated_cached_matches_plain(ee_model, exit_layer):
    """The anchor forward of the cache-aware truncated apply must equal the
    plain truncated apply, and a cached forward consuming the delta the
    anchor just produced (same x, t) must reproduce it: region_out =
    region_in + delta by construction."""
    _, params = ee_model
    p = cache_outer_for(CFG.depth, exit_layer)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 16, 16, 3), jnp.float32)
    t = jnp.array([40.0, 40.0])

    plain_apply, plain_p0 = truncated_ee_apply(
        CFG, params, exit_layer, dtype=jnp.float32
    )
    anchor, cached, p0 = truncated_ee_apply_cached(
        CFG, params, exit_layer, p, dtype=jnp.float32
    )
    want = np.asarray(plain_apply(plain_p0, x, t, None))
    out_a, delta = anchor(p0, x, t, None)
    np.testing.assert_allclose(np.asarray(out_a), want, rtol=1e-5, atol=1e-6)
    out_c = cached(p0, x, t, None, delta)
    np.testing.assert_allclose(np.asarray(out_c), want, rtol=1e-4, atol=1e-5)


def test_truncated_cached_rejects_invalid_pair():
    _, params = init_early_exit_uvit(CFG, jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        truncated_ee_apply_cached(CFG, params, 2, 1, dtype=jnp.float32)


def test_static_exit_cache_every1_bitexact(ee_model):
    """cache_every=1 anchors every step, so the cached static-exit sampler
    must reproduce the uncached one bit for bit (same keys, same updates)."""
    _, params = ee_model
    sched = NoiseSchedule.create(steps=16)
    buckets = [(15, 8, 3), (7, 0, 5)]
    # chunk divides both 8-step buckets: one compiled scan length per
    # bucket/variant instead of two (this 1-core suite is compile-bound)
    kw = dict(schedule=sched, shape=(2, 16, 16, 3), buckets=buckets,
              dtype=jnp.float32, chunk=4)
    ref = static_exit_sample(CFG, params, jax.random.PRNGKey(3), **kw)
    got = static_exit_sample(CFG, params, jax.random.PRNGKey(3),
                             cache_every=1, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_static_exit_cache_table_uniform_equals_every(ee_model):
    """A boolean anchor table equivalent to the uniform rule must reproduce
    the --cache_every path bit for bit through the bucketed sampler (the
    --cache_schedule contract: derived tables ride the same scan)."""
    from duodiff_tpu.diffusion.cache_schedule import uniform_table

    _, params = ee_model
    sched = NoiseSchedule.create(steps=12)
    buckets = [(11, 0, 5)]  # one cacheable bucket: the table-threading
    # proof doesn't need the multi-bucket plumbing (CLI test covers it)
    kw = dict(schedule=sched, shape=(2, 16, 16, 3), buckets=buckets,
              dtype=jnp.float32, chunk=6)
    ref = static_exit_sample(CFG, params, jax.random.PRNGKey(3),
                             cache_every=3, **kw)
    table = jnp.asarray(uniform_table(3, 12))
    got = static_exit_sample(CFG, params, jax.random.PRNGKey(3),
                             cache_every=table, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_static_exit_cache_runs_mixed_buckets(ee_model):
    """cache_every with a schedule mixing cacheable (deep) and uncacheable
    (shallow, exit <= mid) buckets: shallow buckets silently run uncached;
    bucket entry steps anchor even when t_hi % every != 0."""
    _, params = ee_model
    sched = NoiseSchedule.create(steps=20)
    buckets = [(19, 9, 2), (8, 0, 4)]  # layer-2 bucket: cache_outer_for=None
    x = static_exit_sample(
        CFG, params, jax.random.PRNGKey(0), schedule=sched,
        shape=(2, 16, 16, 3), buckets=buckets, dtype=jnp.float32, chunk=11,
        cache_every=3,  # chunk >= both bucket lengths: one scan per bucket
    )
    assert x.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(x)))


def test_static_exit_cache_bucket_entry_anchors(ee_model):
    """A bucket entered at t_hi % every != 0 must anchor on its first step:
    drive the bucket's stateful apply directly with a NaN-poisoned initial
    delta — if the entry anchor fires before any cached use, the NaNs never
    reach the output."""
    from duodiff_tpu.diffusion import ChunkedDDPMSampler
    from duodiff_tpu.diffusion.sampling import make_block_cached_apply

    _, params = ee_model
    sched = NoiseSchedule.create(steps=20)
    t_hi, exit_layer, every = 8, 4, 5  # 8 % 5 != 0
    p = cache_outer_for(CFG.depth, exit_layer)
    anchor, cached, p0 = truncated_ee_apply_cached(
        CFG, params, exit_layer, p, dtype=jnp.float32
    )

    def apply(pp, state, x, t, y):
        inner = make_block_cached_apply(
            lambda xx, tt, yy: anchor(pp, xx, tt, yy),
            lambda xx, tt, yy, d: cached(pp, xx, tt, yy, d),
            every, t_hi,
        )
        return inner(state, x, t, y)

    token_len = CFG.extras + CFG.num_patches
    sampler = ChunkedDDPMSampler(
        apply, sched, parametrization="predict_noise", chunk=9, params=p0,
        init_state_fn=lambda x: jnp.zeros(
            (x.shape[0], token_len, CFG.embed_dim), jnp.float32
        ),
    )
    x, key = sampler.init(jax.random.PRNGKey(0), (2, 16, 16, 3))
    poison = jnp.full((2, token_len, CFG.embed_dim), jnp.nan, jnp.float32)
    x, key, _ = sampler.run(x, key, t_hi, 0, None, state=poison)
    assert np.all(np.isfinite(np.asarray(x)))


def test_static_exit_sample_runs(ee_model):
    _, params = ee_model
    sched = NoiseSchedule.create(steps=20)
    buckets = [(19, 10, 1), (9, 0, 5)]
    x = static_exit_sample(
        CFG, params, jax.random.PRNGKey(0), schedule=sched,
        shape=(2, 16, 16, 3), buckets=buckets, dtype=jnp.float32, chunk=10,
    )
    assert x.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(x)))


# ---------------------------------------------------------------------------
# probe-driven adaptive bucket selection (make_adaptive_exit_sampler)
# ---------------------------------------------------------------------------


def test_adaptive_probed_apply_matches_full(ee_model):
    """truncated_ee_apply_probed: same eps as the plain truncated apply,
    and the accumulated probe equals the full forward's u[exit_layer]
    batch-mean (the per-layer probe families' contract)."""
    from duodiff_tpu.diffusion.static_exit import truncated_ee_apply_probed

    model, params = ee_model
    x = jnp.asarray(np.random.RandomState(1).randn(2, 16, 16, 3), jnp.float32)
    t = jnp.array([42.0, 42.0])
    bb, u, g = model.apply({"params": params}, x, t)
    for exit_layer in (1, 3, CFG.depth):
        apply_fn, p0, init_state = truncated_ee_apply_probed(
            CFG, params, exit_layer, dtype=jnp.float32
        )
        eps, st = apply_fn(p0, init_state(x), x, t, None)
        want = (
            np.asarray(bb) if exit_layer == CFG.depth
            else np.asarray(g[exit_layer])
        )
        np.testing.assert_allclose(np.asarray(eps), want, rtol=1e-4,
                                   atol=1e-5)
        probe_slot = min(exit_layer, CFG.depth - 1)
        np.testing.assert_allclose(
            float(st), float(np.mean(np.asarray(u[probe_slot]))), rtol=1e-5
        )


def test_adaptive_single_layer_matches_static(ee_model):
    """With ONE candidate layer the adaptive sampler reduces bit-exactly to
    the static bucket sampler — the probe accumulation must never perturb
    the x/key stream."""
    from duodiff_tpu.diffusion.static_exit import make_adaptive_exit_sampler

    _, params = ee_model
    schedule = NoiseSchedule.create(steps=12)
    key = jax.random.PRNGKey(5)
    shape = (2, 16, 16, 3)
    sampler = make_adaptive_exit_sampler(
        CFG, params, schedule=schedule, layers=[2], chunk=5,
        threshold=0.08, dtype=jnp.float32,
    )
    got, log = sampler(key, shape)
    want = static_exit_sample(
        CFG, params, key, schedule=schedule, shape=shape,
        buckets=[(11, 0, 2)], dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert [r["layer"] for r in log] == [2, 2, 2]
    assert all(np.isfinite(r["mean_probe"]) for r in log)


def test_adaptive_walks_buckets(ee_model):
    """Threshold extremes drive the bucket walk: an unreachable threshold
    walks shallower from the deep start; threshold 0 walks deeper from a
    shallow start (one step per chunk, hysteresis respected)."""
    from duodiff_tpu.diffusion.static_exit import make_adaptive_exit_sampler

    _, params = ee_model
    schedule = NoiseSchedule.create(steps=12)
    shape = (2, 16, 16, 3)
    down = make_adaptive_exit_sampler(
        CFG, params, schedule=schedule, layers=[1, 3, 5], chunk=3,
        threshold=1e9, monotone=False, dtype=jnp.float32,
    )
    x, log = down(jax.random.PRNGKey(0), shape)
    assert np.isfinite(np.asarray(x)).all()
    seq = [r["layer"] for r in log]
    assert seq[0] == 5 and seq[-1] == 1 and sorted(seq, reverse=True) == seq

    up = make_adaptive_exit_sampler(
        CFG, params, schedule=schedule, layers=[1, 3, 5], chunk=3,
        threshold=0.0, dtype=jnp.float32,
    )
    _, log2 = up(jax.random.PRNGKey(0), shape)
    seq2 = [r["layer"] for r in log2]
    assert seq2[0] == 1 and seq2[-1] == 5 and sorted(seq2) == seq2

    # monotone default: an unreachable threshold stays at the shallow start
    # (no shallower moves exist, no deeper triggered... threshold=1e9 never
    # deepens) — the default walk can only deepen
    flat = make_adaptive_exit_sampler(
        CFG, params, schedule=schedule, layers=[1, 3, 5], chunk=3,
        threshold=1e9, dtype=jnp.float32,
    )
    _, log3 = flat(jax.random.PRNGKey(0), shape)
    assert [r["layer"] for r in log3] == [1, 1, 1, 1]


def test_adaptive_rejects_timestep_probes():
    from duodiff_tpu.diffusion.static_exit import truncated_ee_apply_probed

    cfg_t = UViTConfig(
        img_size=16, patch_size=2, in_chans=3, embed_dim=32, depth=3,
        num_heads=4, mlp_ratio=4, num_classes=-1, normalize_timesteps=True,
        classifier_type="mlp_probe_per_timestep",
    )
    _, params = init_early_exit_uvit(cfg_t, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="per-layer probe"):
        truncated_ee_apply_probed(cfg_t, params, 1)

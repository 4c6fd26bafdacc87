"""Sampler tests: scan-based DDPM/DDIM/DuoDiff/early-exit loops.

The reference has zero sampler tests (SURVEY.md §4). These use a tiny
schedule (20 steps) and stub models so the scans compile in milliseconds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from duodiff_tpu.diffusion import (
    NoiseSchedule,
    ddim_sample,
    ddpm_sample,
    duodiff_sample,
    early_exit_sample,
)
from duodiff_tpu.diffusion.sampling import ddim_timestep_grid

SHAPE = (2, 8, 8, 3)


def stub_model(scale):
    def apply_fn(x, t_batch, y):
        del y
        return scale * x + 0.01 * t_batch[:, None, None, None]

    return apply_fn


def test_ddpm_sample_shape_and_determinism():
    sched = NoiseSchedule.create(steps=20)
    key = jax.random.PRNGKey(0)
    x1, inter = ddpm_sample(stub_model(0.1), key, schedule=sched, shape=SHAPE)
    x2, _ = ddpm_sample(stub_model(0.1), key, schedule=sched, shape=SHAPE)
    assert x1.shape == SHAPE and inter == []
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    assert np.all(np.isfinite(np.asarray(x1)))
    # different key -> different sample
    x3, _ = ddpm_sample(stub_model(0.1), jax.random.PRNGKey(1), schedule=sched, shape=SHAPE)
    assert not np.allclose(np.asarray(x1), np.asarray(x3))


def test_ddpm_sample_parametrizations_run():
    sched = NoiseSchedule.create(steps=10)
    key = jax.random.PRNGKey(0)
    for p in ["predict_noise", "predict_original", "predict_previous"]:
        x, _ = ddpm_sample(
            stub_model(0.05), key, schedule=sched, shape=SHAPE, parametrization=p
        )
        assert x.shape == SHAPE and np.all(np.isfinite(np.asarray(x)))


def test_ddpm_intermediates_segmentation():
    sched = NoiseSchedule.create(steps=20)
    key = jax.random.PRNGKey(0)
    # save after 5 and 10 elapsed steps (t = 15 and t = 10)
    x_full, inter = ddpm_sample(
        stub_model(0.1), key, schedule=sched, shape=SHAPE, timesteps_save=[5, 10]
    )
    assert len(inter) == 2
    # segmentation must not change the final sample vs an unsegmented run
    x_plain, _ = ddpm_sample(stub_model(0.1), key, schedule=sched, shape=SHAPE)
    np.testing.assert_allclose(
        np.asarray(x_full), np.asarray(x_plain), rtol=1e-5, atol=1e-6
    )


def test_duodiff_equals_ddpm_when_models_identical():
    sched = NoiseSchedule.create(steps=20)
    key = jax.random.PRNGKey(0)
    f = stub_model(0.1)
    x_duo = duodiff_sample(f, f, key, schedule=sched, shape=SHAPE, t_switch=7)
    x_one, _ = ddpm_sample(f, key, schedule=sched, shape=SHAPE)
    np.testing.assert_allclose(
        np.asarray(x_duo), np.asarray(x_one), rtol=1e-5, atol=1e-6
    )


def test_duodiff_switches_models():
    sched = NoiseSchedule.create(steps=20)
    key = jax.random.PRNGKey(0)
    early, late = stub_model(0.5), stub_model(-0.5)
    x = duodiff_sample(early, late, key, schedule=sched, shape=SHAPE, t_switch=7)
    # all-early and all-late runs must both differ
    x_e = duodiff_sample(early, early, key, schedule=sched, shape=SHAPE, t_switch=7)
    x_l = duodiff_sample(late, late, key, schedule=sched, shape=SHAPE, t_switch=7)
    assert not np.allclose(np.asarray(x), np.asarray(x_e))
    assert not np.allclose(np.asarray(x), np.asarray(x_l))


def test_ddim_grid_matches_reference():
    grid = ddim_timestep_grid(1000, 50)
    assert grid[0] == 999 and grid[-1] == 0 and len(grid) == 50
    assert all(grid[i] > grid[i + 1] for i in range(len(grid) - 1))


def test_ddim_sample_runs_and_is_deterministic_eta0():
    sched = NoiseSchedule.create(steps=100)
    key = jax.random.PRNGKey(0)
    x1, _ = ddim_sample(stub_model(0.1), key, schedule=sched, shape=SHAPE, ddim_steps=10)
    x2, _ = ddim_sample(stub_model(0.1), key, schedule=sched, shape=SHAPE, ddim_steps=10)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    assert np.all(np.isfinite(np.asarray(x1)))


def test_ddim_duodiff_handoff():
    sched = NoiseSchedule.create(steps=100)
    key = jax.random.PRNGKey(0)
    f = stub_model(0.1)
    x_duo, _ = ddim_sample(
        f, key, schedule=sched, shape=SHAPE, ddim_steps=10,
        late_apply_fn=f, t_switch=30,
    )
    x_one, _ = ddim_sample(f, key, schedule=sched, shape=SHAPE, ddim_steps=10)
    np.testing.assert_allclose(np.asarray(x_duo), np.asarray(x_one), rtol=1e-5)


def test_early_exit_sample_selects_by_threshold():
    """Craft probes so layer selection is known: layer i has probe value
    0.1 * (depth - i); with threshold 0.25 the first layer with u <= 0.25 is
    depth-2 (u = 0.2). ee output of layer i is constant i."""
    depth = 4
    sched = NoiseSchedule.create(steps=5)
    batch = SHAPE[0]

    def apply_fn(x, t_batch, y):
        backbone = jnp.zeros_like(x) + 99.0
        u = jnp.stack(
            [jnp.full((batch,), 0.1 * (depth - i)) for i in range(depth)]
        )  # (depth, B): [0.4, 0.3, 0.2, 0.1]
        g = jnp.stack([jnp.zeros_like(x) + i for i in range(depth)])
        return backbone, u, g

    x, err_by_t, idx_by_t = early_exit_sample(
        apply_fn, jax.random.PRNGKey(0), schedule=sched, shape=SHAPE, threshold=0.25
    )
    assert x.shape == SHAPE
    assert err_by_t.shape == (5, depth)
    assert idx_by_t.shape == (5, batch)
    # first u <= 0.25 is index 2 (u=0.2)
    assert np.all(np.asarray(idx_by_t) == 2)
    np.testing.assert_allclose(np.asarray(err_by_t), np.tile([0.4, 0.3, 0.2, 0.1], (5, 1)), rtol=1e-6)


def test_early_exit_sample_falls_back_to_backbone():
    """With an impossible threshold the sentinel row (backbone, u=0) wins:
    indices == depth, matching reference eesampler.py:62-68 semantics."""
    depth = 3
    sched = NoiseSchedule.create(steps=3)
    batch = SHAPE[0]

    def apply_fn(x, t_batch, y):
        backbone = jnp.zeros_like(x)
        u = jnp.full((depth, batch), 0.9)
        g = jnp.stack([jnp.zeros_like(x) + 7 for _ in range(depth)])
        return backbone, u, g

    x, _, idx_by_t = early_exit_sample(
        apply_fn, jax.random.PRNGKey(0), schedule=sched, shape=SHAPE, threshold=0.05
    )
    assert np.all(np.asarray(idx_by_t) == depth)


def test_ddpm_sample_jits():
    sched = NoiseSchedule.create(steps=10)
    f = stub_model(0.1)

    @jax.jit
    def run(key):
        x, _ = ddpm_sample(f, key, schedule=sched, shape=SHAPE)
        return x

    x = run(jax.random.PRNGKey(0))
    assert x.shape == SHAPE


def test_early_exit_select_legacy_gate():
    """Legacy lambda-threshold gate (reference ddpm_core.py:7-52):
    first layer where 1 - u > lambda, clamped to earliest_exit_index,
    backbone fallback with sentinel depth."""
    from duodiff_tpu.diffusion.sampling import early_exit_select

    depth, b = 4, 3
    backbone = jnp.full((b, 2, 2, 3), 99.0)
    g = jnp.stack([jnp.full((b, 2, 2, 3), float(i)) for i in range(depth)])
    # sample 0: exits at layer 0 (u=0.1 -> 1-u=0.9 > 0.5) but clamped to 1
    # sample 1: first qualifying layer is 2
    # sample 2: never qualifies -> backbone, exit sentinel = depth
    u = jnp.asarray([
        [0.1, 0.9, 0.9],
        [0.1, 0.9, 0.9],
        [0.1, 0.1, 0.9],
        [0.1, 0.1, 0.9],
    ])  # (depth, B)
    sel, exits = early_exit_select(0.5, (backbone, u, g), earliest_exit_index=1)
    assert exits.tolist() == [1, 2, depth]
    assert float(sel[0, 0, 0, 0]) == 1.0
    assert float(sel[1, 0, 0, 0]) == 2.0
    assert float(sel[2, 0, 0, 0]) == 99.0


def test_chunked_sampler_matches_single_scan():
    """The chunked driver must be bit-identical to the one-scan sampler
    (same key-split sequence)."""
    from duodiff_tpu.diffusion.sampling import make_chunked_ddpm_sampler

    sched = NoiseSchedule.create(steps=20)
    f = stub_model(0.1)
    key = jax.random.PRNGKey(3)
    sample = make_chunked_ddpm_sampler(f, sched, chunk=7)
    x_chunked = sample(key, SHAPE)
    x_one, _ = ddpm_sample(f, key, schedule=sched, shape=SHAPE)
    np.testing.assert_array_equal(np.asarray(x_chunked), np.asarray(x_one))


def test_sharded_sampling_matches_unsharded():
    """Batch-sharded sampling over an 8-device mesh is bit-identical to
    single-device sampling (noise drawn before placement; SPMD only
    distributes the math)."""
    from duodiff_tpu.diffusion.sampling import ChunkedDDPMSampler
    from duodiff_tpu.parallel import batch_sharding, create_mesh

    if jax.device_count() < 2:
        import pytest

        pytest.skip("needs the multi-device CPU mesh")

    sched = NoiseSchedule.create(steps=12)
    f = stub_model(0.1)
    sampler = ChunkedDDPMSampler(f, sched, chunk=5)
    key = jax.random.PRNGKey(4)
    mesh = create_mesh()
    shard = batch_sharding(mesh)
    shape = (jax.device_count(), 8, 8, 3)  # batch divisible by the mesh
    x_sharded = sampler.sample(key, shape, sharding=shard)
    assert len(x_sharded.sharding.device_set) == jax.device_count()
    x_plain = sampler.sample(key, shape)
    np.testing.assert_array_equal(np.asarray(x_sharded), np.asarray(x_plain))


def test_dpm_solver_order1_is_ddim():
    """DPM-Solver++ with order=1 reduces exactly to DDIM (eta=0) on the same
    timestep grid — an analytic identity of the data-prediction form."""
    from duodiff_tpu.diffusion.sampling import ddim_sample, dpm_solver_sample

    sched = NoiseSchedule.create(steps=100)
    f = stub_model(0.1)
    key = jax.random.PRNGKey(5)
    x1 = dpm_solver_sample(f, key, schedule=sched, shape=SHAPE, dpm_steps=12,
                           order=1)
    x2, _ = ddim_sample(f, key, schedule=sched, shape=SHAPE, ddim_steps=12,
                        eta=0.0)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2),
                               rtol=1e-4, atol=1e-5)


def test_dpm_solver_order2_properties():
    """Order 2 equals order 1 for a constant-eps model (the multistep
    correction vanishes: D = x0), and differs for a state-dependent one."""
    from duodiff_tpu.diffusion.sampling import dpm_solver_sample

    sched = NoiseSchedule.create(steps=100)
    key = jax.random.PRNGKey(6)

    def const_eps(x, t, y):
        return jnp.full_like(x, 0.3)

    a = dpm_solver_sample(const_eps, key, schedule=sched, shape=SHAPE,
                          dpm_steps=10, order=2)
    b = dpm_solver_sample(const_eps, key, schedule=sched, shape=SHAPE,
                          dpm_steps=10, order=1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)

    f = stub_model(0.1)  # eps depends on x
    c = dpm_solver_sample(f, key, schedule=sched, shape=SHAPE,
                          dpm_steps=10, order=2)
    d = dpm_solver_sample(f, key, schedule=sched, shape=SHAPE,
                          dpm_steps=10, order=1)
    assert float(jnp.max(jnp.abs(c - d))) > 1e-4


def test_dpm_solver_converges_to_ddpm():
    """With enough steps the ODE solution approaches the many-step DDIM
    limit: 2nd order at 20 steps should be closer to DDIM-100 than 1st
    order at 20 steps is (the point of the solver)."""
    from duodiff_tpu.diffusion.sampling import ddim_sample, dpm_solver_sample

    sched = NoiseSchedule.create(steps=100)
    f = stub_model(0.3)
    key = jax.random.PRNGKey(7)
    ref, _ = ddim_sample(f, key, schedule=sched, shape=SHAPE, ddim_steps=100,
                         eta=0.0)
    o2 = dpm_solver_sample(f, key, schedule=sched, shape=SHAPE, dpm_steps=20,
                           order=2)
    o1 = dpm_solver_sample(f, key, schedule=sched, shape=SHAPE, dpm_steps=20,
                           order=1)
    e2 = float(jnp.mean(jnp.abs(o2 - ref)))
    e1 = float(jnp.mean(jnp.abs(o1 - ref)))
    assert e2 < e1, (e2, e1)


def test_intermediate_saves_order_and_invariance():
    """timesteps_save: intermediates come back in ARGUMENT order (callers
    zip them), invalid entries are skipped, and segmenting the scan at save
    points must not change the final sample."""
    from duodiff_tpu.diffusion.sampling import ddim_sample

    sched = NoiseSchedule.create(steps=20)
    f = stub_model(0.1)
    key = jax.random.PRNGKey(8)

    # DDPM: unsorted + invalid (0 and steps+1) save points
    x_ref, empty = ddpm_sample(f, key, schedule=sched, shape=SHAPE)
    x, inter = ddpm_sample(f, key, schedule=sched, shape=SHAPE,
                           timesteps_save=(15, 0, 5, 21))
    assert not empty and len(inter) == 2
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x_ref))
    # the elapsed-15 snapshot is closer to the final sample than elapsed-5
    d15 = float(jnp.mean(jnp.abs(inter[0] - x)))
    d5 = float(jnp.mean(jnp.abs(inter[1] - x)))
    assert d15 < d5, (d15, d5)

    # DDIM: saves must not perturb the stream; order follows the argument
    x_ref, _ = ddim_sample(f, key, schedule=sched, shape=SHAPE, ddim_steps=10,
                           eta=0.5)
    grid = np.asarray(
        __import__("duodiff_tpu.diffusion.sampling",
                   fromlist=["ddim_timestep_grid"]).ddim_timestep_grid(20, 10)
    )
    saves = (int(20 - grid[3]), int(20 - grid[1]))  # two valid pair-t saves
    x, inter = ddim_sample(f, key, schedule=sched, shape=SHAPE, ddim_steps=10,
                           eta=0.5, timesteps_save=saves)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x_ref))
    assert len(inter) == 2
    d0 = float(jnp.mean(jnp.abs(inter[0] - x)))
    d1 = float(jnp.mean(jnp.abs(inter[1] - x)))
    assert d0 < d1  # first requested save is later in the trajectory


def test_dpm_solver_degenerate_grids():
    """dpm_steps > schedule.steps dedupes grid points (no NaN from h=0)."""
    from duodiff_tpu.diffusion.sampling import dpm_solver_sample

    sched = NoiseSchedule.create(steps=8)
    f = stub_model(0.1)
    x = dpm_solver_sample(f, jax.random.PRNGKey(9), schedule=sched,
                          shape=SHAPE, dpm_steps=20, order=2)
    assert bool(jnp.all(jnp.isfinite(x)))


def test_guided_apply_identities():
    """make_guided_apply: w=1 is exactly the conditional model, w=0 the
    null-label model; output shape/dtype preserved."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from duodiff_tpu.diffusion import make_guided_apply

    emb = jax.random.normal(jax.random.PRNGKey(0), (11, 4))

    def apply_fn(x, t, y):
        return x * 0.5 + emb[y][:, None, None, :] + t[:, None, None, None]

    x = jax.random.normal(jax.random.PRNGKey(1), (3, 2, 2, 4))
    t = jnp.full((3,), 5.0)
    y = jnp.array([1, 2, 3])

    cond = apply_fn(x, t, y)
    null = apply_fn(x, t, jnp.full_like(y, 10))
    w1 = make_guided_apply(apply_fn, 1.0, 10)(x, t, y)
    w0 = make_guided_apply(apply_fn, 0.0, 10)(x, t, y)
    w3 = make_guided_apply(apply_fn, 3.0, 10)(x, t, y)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(cond), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(w0), np.asarray(null), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(w3), np.asarray(null + 3.0 * (cond - null)),
        rtol=1e-5, atol=1e-5,
    )


def test_guided_apply_ee_identities():
    """make_guided_apply_ee: backbone and per-layer heads follow the CFG
    rule (w=1 conditional, w=0 null); probe values always come from the
    conditional half; tuple shapes preserved on the original batch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from duodiff_tpu.diffusion import make_guided_apply_ee

    depth, b = 4, 3
    emb = jax.random.normal(jax.random.PRNGKey(0), (11, 4))

    def apply_fn(x, t, y):
        backbone = x * 0.5 + emb[y][:, None, None, :]
        heads = jnp.stack(
            [backbone * (i + 1) for i in range(depth)], axis=0
        )
        probes = jnp.stack(
            [jnp.mean(jnp.abs(backbone), axis=(1, 2, 3)) * (i + 1)
             for i in range(depth)], axis=0
        )
        return backbone, probes, heads

    x = jax.random.normal(jax.random.PRNGKey(1), (b, 2, 2, 4))
    t = jnp.full((b,), 5.0)
    y = jnp.array([1, 2, 3])
    y_null = jnp.full_like(y, 10)

    cond = apply_fn(x, t, y)
    null = apply_fn(x, t, y_null)
    for w, want_bb, want_heads in (
        (1.0, cond[0], cond[2]),
        (0.0, null[0], null[2]),
    ):
        bb, probes, heads = make_guided_apply_ee(apply_fn, w, 10)(x, t, y)
        assert bb.shape == (b, 2, 2, 4)
        assert probes.shape == (depth, b)
        assert heads.shape == (depth, b, 2, 2, 4)
        np.testing.assert_allclose(np.asarray(bb), np.asarray(want_bb),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(heads), np.asarray(want_heads),
                                   rtol=1e-6, atol=1e-5)
        # probes are ALWAYS the conditional ones, independent of w
        np.testing.assert_allclose(np.asarray(probes), np.asarray(cond[1]),
                                   rtol=1e-6, atol=1e-6)

    bb3, _, heads3 = make_guided_apply_ee(apply_fn, 3.0, 10)(x, t, y)
    np.testing.assert_allclose(
        np.asarray(bb3), np.asarray(null[0] + 3.0 * (cond[0] - null[0])),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(heads3), np.asarray(null[2] + 3.0 * (cond[2] - null[2])),
        rtol=1e-5, atol=1e-5,
    )


def test_params_mode_matches_closure_and_keeps_executable_weight_free():
    """``params=`` threads the weight tree through the jitted chunk as a
    traced argument: results are bit-identical to the closure form, and the
    weights stay OUT of the compiled executable (a closure bakes them in as
    HLO literals — 385MB serialized for the flagship chunk, measured; the
    driver-visible compile+first-run cost of bench.py/sampler.py)."""
    from duodiff_tpu.config import UViTConfig
    from duodiff_tpu.diffusion.sampling import ChunkedDDPMSampler
    from duodiff_tpu.models.uvit import init_uvit

    cfg = UViTConfig(
        img_size=8, patch_size=4, in_chans=3, embed_dim=128, depth=3,
        num_heads=4, mlp_ratio=4, num_classes=-1, normalize_timesteps=True,
    )
    model, params = init_uvit(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    sched = NoiseSchedule.create(steps=12)
    key = jax.random.PRNGKey(5)
    shape = (2, 8, 8, 3)

    closure = ChunkedDDPMSampler(
        lambda x, t, y: model.apply({"params": params}, x, t, y),
        sched, chunk=6,
    )
    threaded = ChunkedDDPMSampler(
        lambda p, x, t, y: model.apply({"params": p}, x, t, y),
        sched, chunk=6, params=params,
    )
    np.testing.assert_array_equal(
        np.asarray(closure.sample(key, shape)),
        np.asarray(threaded.sample(key, shape)),
    )

    param_bytes = sum(
        a.size * a.dtype.itemsize for a in jax.tree_util.tree_leaves(params)
    )
    x = jnp.zeros(shape, jnp.float32)
    ts = jnp.arange(11, 5, -1)

    def serialized_size(jitted, *args):
        compiled = jitted.lower(*args).compile()
        return len(compiled.runtime_executable().serialize())

    size_closure = serialized_size(closure._run_chunk, x, key, ts, None)
    size_threaded = serialized_size(threaded._run_chunk, params, x, key, ts, None)
    # closure form embeds the ~800KB of weights; threaded form must not
    assert size_closure > param_bytes, (size_closure, param_bytes)
    assert size_threaded < size_closure - param_bytes // 2, (
        size_threaded, size_closure, param_bytes,
    )


def _ee_params_mode_setup():
    from duodiff_tpu.config import UViTConfig
    from duodiff_tpu.models.early_exit import init_early_exit_uvit

    cfg = UViTConfig(
        img_size=8, patch_size=4, in_chans=3, embed_dim=64, depth=3,
        num_heads=4, mlp_ratio=2, num_classes=5, normalize_timesteps=True,
    )
    model, params = init_early_exit_uvit(
        cfg, jax.random.PRNGKey(1), dtype=jnp.float32
    )
    sched = NoiseSchedule.create(steps=8)
    return model, params, sched, jax.random.PRNGKey(6), (2, 8, 8, 3)


def test_params_mode_early_exit_matches_closure():
    """ChunkedEarlyExitSampler params threading: identical samples and exit
    diagnostics vs the closure form."""
    from duodiff_tpu.diffusion.sampling import ChunkedEarlyExitSampler

    model, params, sched, key, shape = _ee_params_mode_setup()
    y = jnp.array([1, 2])

    closure = ChunkedEarlyExitSampler(
        lambda x, t, yy: model.apply({"params": params}, x, t, yy),
        sched, threshold=0.08, chunk=4,
    )
    threaded = ChunkedEarlyExitSampler(
        lambda p, x, t, yy: model.apply({"params": p}, x, t, yy),
        sched, threshold=0.08, chunk=4, params=params,
    )
    xc, errc, idxc = closure.sample(key, shape, y=y)
    xt, errt, idxt = threaded.sample(key, shape, y=y)
    np.testing.assert_array_equal(np.asarray(xc), np.asarray(xt))
    np.testing.assert_array_equal(errc, errt)
    np.testing.assert_array_equal(idxc, idxt)


@pytest.mark.slow  # default-set coverage: test_eesampler_cli_guided runs the
# guided+threaded EE path end to end; this pins the closure/threaded
# equivalence through the CFG-EE wrapper specifically
def test_params_mode_early_exit_guided_matches_closure():
    """The CFG-EE wrapper passes the threaded params tree through
    untouched: guided closure and guided threaded samplers agree."""
    from duodiff_tpu.diffusion import make_guided_apply_ee
    from duodiff_tpu.diffusion.sampling import ChunkedEarlyExitSampler

    model, params, sched, key, shape = _ee_params_mode_setup()
    y = jnp.array([1, 2])

    guided_closure = ChunkedEarlyExitSampler(
        make_guided_apply_ee(
            lambda x, t, yy: model.apply({"params": params}, x, t, yy),
            2.0, 4,
        ),
        sched, threshold=0.08, chunk=4,
    )
    guided_threaded = ChunkedEarlyExitSampler(
        make_guided_apply_ee(
            lambda p, x, t, yy: model.apply({"params": p}, x, t, yy),
            2.0, 4,
        ),
        sched, threshold=0.08, chunk=4, params=params,
    )
    xgc, _, idxgc = guided_closure.sample(key, shape, y=y)
    xgt, _, idxgt = guided_threaded.sample(key, shape, y=y)
    np.testing.assert_array_equal(np.asarray(xgc), np.asarray(xgt))
    np.testing.assert_array_equal(idxgc, idxgt)


def test_aux_mode_empty_range_returns_empty_rows():
    """run() with an empty timestep range must keep the aux contract total:
    a (0, ...)-rowed tree, not None (the trainer consumes aux rows
    unconditionally)."""
    from duodiff_tpu.diffusion.sampling import ChunkedDDPMSampler

    sched = NoiseSchedule.create(steps=8)

    def f(x, t, y):
        return x * 0.9

    sampler = ChunkedDDPMSampler(
        f, sched, chunk=4, aux_fn=lambda out: (out, jnp.mean(out, axis=(1, 2, 3)))
    )
    x = jnp.zeros((2, 4, 4, 3), jnp.float32)
    x2, key, aux = sampler.run(x, jax.random.PRNGKey(0), t_start=3, t_end=4)
    assert aux.shape == (0, 2)
    np.testing.assert_array_equal(np.asarray(x2), np.asarray(x))
    # non-empty range still stacks one row per step
    _, _, aux2 = sampler.run(x, jax.random.PRNGKey(0), t_start=3, t_end=1)
    assert aux2.shape == (3, 2)


def test_noise_table_row0_guard():
    """The t==0 step adds NO noise even if the injected table's row 0 is
    non-zero (same guard as the internal draw) — in both scan flavors."""
    from duodiff_tpu.diffusion.sampling import ddpm_scan, ee_scan

    sched = NoiseSchedule.create(steps=4)
    shape = (2, 4, 4, 3)
    rng = np.random.RandomState(0)
    table_clean = jnp.asarray(rng.randn(4, *shape), jnp.float32)
    table_clean = table_clean.at[0].set(0.0)
    table_dirty = table_clean.at[0].set(99.0)
    x0 = jnp.asarray(rng.randn(*shape), jnp.float32)
    ts = jnp.arange(3, -1, -1)
    key = jax.random.PRNGKey(0)

    def f(x, t, y):
        return x * 0.1

    for table in (table_clean, table_dirty):
        out, _ = ddpm_scan(
            f, sched, "predict_noise", x0, key, ts, None,
            noise_table=table,
        )
        if table is table_clean:
            want = np.asarray(out)
        else:
            np.testing.assert_array_equal(np.asarray(out), want)

    def f_ee(x, t, y):
        bb = x * 0.1
        u = jnp.zeros((2, x.shape[0]))
        g = jnp.stack([bb, bb], axis=0)
        return bb, u, g

    for table in (table_clean, table_dirty):
        out, _, _, _ = ee_scan(
            f_ee, sched, 0.5, x0, key, ts, None, noise_table=table
        )
        if table is table_clean:
            want_ee = np.asarray(out)
        else:
            np.testing.assert_array_equal(np.asarray(out), want_ee)

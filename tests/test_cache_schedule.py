"""Drift-derived cache anchor schedules (duodiff_tpu.diffusion.cache_schedule
+ the tools/derive_cache_schedule.py measurement path)."""

import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from duodiff_tpu.diffusion.cache_schedule import (
    anchors_to_table,
    budget_for_count,
    derive_anchor_table,
    load_cache_schedule,
    save_cache_schedule,
    segment_staleness,
    table_to_anchors,
    uniform_budget,
    uniform_table,
)


def test_segment_staleness_hand_case():
    # steps=6, anchors at t=3 and t=0; drift[t] = ||d_t - d_{t+1}||
    drift = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 99.0])
    table = anchors_to_table([0, 3], 6)
    stale = segment_staleness(drift, table)
    # t=5 is the (implicitly anchored) first step; t=4 accumulates drift[4];
    # t=3 anchors; t=2 drift[2]; t=1 +drift[1]; t=0 anchors
    np.testing.assert_allclose(stale, [0.0, 5.0, 3.0, 0.0, 5.0, 0.0])


def test_uniform_budget_is_max_staleness():
    rng = np.random.RandomState(0)
    drift = rng.rand(50)
    b = uniform_budget(drift, 4)
    stale = segment_staleness(drift, uniform_table(4, 50))
    assert b == pytest.approx(stale.max())


def test_derived_table_respects_budget_and_adapts():
    # drift concentrated at low t: the derived schedule must anchor densely
    # there and sparsely at high t, staying within the uniform-3 budget
    steps = 120
    t = np.arange(steps, dtype=np.float64)
    drift = np.where(t < 30, 1.0, 0.01)
    budget = uniform_budget(drift, 3)
    table = derive_anchor_table(drift, budget)
    stale = segment_staleness(drift, table)
    assert stale.max() <= budget + 1e-12
    lo, hi = table[:30], table[30:]
    assert lo.mean() > 3 * hi.mean()  # dense where drift is high
    assert table.sum() < uniform_table(3, steps).sum()  # fewer anchors
    assert table[0]  # final step always anchored


def test_single_step_drift_above_budget_anchors_immediately():
    drift = np.array([0.0, 10.0, 0.0, 0.0, 0.0])
    table = derive_anchor_table(drift, 1.0, anchor_zero=False)
    assert table[1]
    assert segment_staleness(drift, table).max() <= 10.0


def test_budget_for_count_monotone_and_bounded():
    rng = np.random.RandomState(1)
    drift = rng.rand(200)
    for k in (10, 40, 80):
        b = budget_for_count(drift, k)
        assert int(derive_anchor_table(drift, b).sum()) <= k
    assert budget_for_count(drift, 10) >= budget_for_count(drift, 80)


def test_schedule_json_roundtrip(tmp_path):
    table = anchors_to_table([0, 7, 13, 99], 100)
    p = tmp_path / "sched.json"
    save_cache_schedule(p, table, meta={"note": "test"})
    loaded = load_cache_schedule(p, num_timesteps=100)
    np.testing.assert_array_equal(loaded, table)
    assert table_to_anchors(loaded) == [0, 7, 13, 99]
    with pytest.raises(ValueError, match="num_timesteps=100"):
        load_cache_schedule(p, num_timesteps=50)


def test_anchors_to_table_validates_range():
    with pytest.raises(ValueError, match="lie in"):
        anchors_to_table([100], 100)


def test_drift_measurement_matches_manual():
    """The derivation tool's measuring apply (stateful + aux through
    ChunkedDDPMSampler) reports exactly ||delta_t - delta_{t+1}||_F along
    the dense trajectory."""
    import jax
    import jax.numpy as jnp

    from duodiff_tpu.config import UViTConfig
    from duodiff_tpu.diffusion import ChunkedDDPMSampler, NoiseSchedule
    from duodiff_tpu.models.uvit import init_uvit

    cfg = UViTConfig(
        img_size=16, patch_size=4, in_chans=3, embed_dim=32, depth=5,
        num_heads=4, mlp_ratio=2, num_classes=-1, normalize_timesteps=True,
    )
    m, p = init_uvit(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    steps, chunk, shape = 9, 4, (2, 16, 16, 3)
    sched = NoiseSchedule.create(steps=steps)
    token_len = 1 + (cfg.img_size // cfg.patch_size) ** 2

    def apply_fn(params, prev, x, t, y):
        out, delta = m.apply(
            {"params": params}, x, t, y, n_outer=1,
            method=m.forward_anchor,
        )
        d32 = delta.astype(jnp.float32)
        drift_sq = jnp.sum((d32 - prev.astype(jnp.float32)) ** 2)
        return (out, drift_sq), delta

    sampler = ChunkedDDPMSampler(
        apply_fn, sched, chunk=chunk, params=p,
        aux_fn=lambda mo: (mo[0], mo[1]),
        init_state_fn=lambda x: jnp.zeros(
            (x.shape[0], token_len, cfg.embed_dim)
        ),
    )
    key = jax.random.PRNGKey(2)
    x_final, drift_sq = sampler.sample(key, shape)
    assert drift_sq.shape == (steps,)

    # manual dense loop recording deltas
    k, init_key = jax.random.split(key)
    x = jax.random.normal(init_key, shape)
    deltas, xs = [], []
    for t in range(steps - 1, -1, -1):
        k, zkey = jax.random.split(k)
        tb = jnp.full((shape[0],), float(t))
        eps, delta = m.apply(
            {"params": p}, x, tb, None, n_outer=1, method=m.forward_anchor,
        )
        deltas.append(np.asarray(delta, np.float64))
        z = (
            jax.random.normal(zkey, shape)
            if t > 0 else jnp.zeros(shape)
        )
        x = sched.step("predict_noise", eps, x, t, z, "beta_tilde")
    np.testing.assert_allclose(
        np.asarray(x_final), np.asarray(x), atol=1e-5
    )
    want = [float(np.sum(deltas[0] ** 2))] + [
        float(np.sum((deltas[i] - deltas[i - 1]) ** 2))
        for i in range(1, steps)
    ]
    np.testing.assert_allclose(
        np.asarray(drift_sq, np.float64), want, rtol=1e-4
    )


# ---------------------------------------------------------------------------
# composition-aware derivation modes (tools/derive_cache_schedule.py
# --t_switch / --static_schedule; VERDICT r3 #2)
# ---------------------------------------------------------------------------

TINY_FULL = """model_params:
  img_size: 16
  patch_size: 4
  in_chans: 3
  embed_dim: 32
  depth: 5
  num_heads: 4
  mlp_ratio: 2
  num_classes: -1
  normalize_timesteps: True
"""

TINY_SHALLOW = TINY_FULL.replace("depth: 5", "depth: 3")

TINY_EE = TINY_FULL + '  classifier_type: "mlp_probe_per_layer"\n'


@pytest.fixture()
def tool_main():
    sys.path.insert(0, str(REPO / "tools"))
    from derive_cache_schedule import main as tool

    yield tool
    sys.path.remove(str(REPO / "tools"))


def test_derive_duodiff_mode(tmp_path, tool_main):
    """DuoDiff mode: anchors are derived over the late (cached) segment
    only; every shallow-segment row is written as an anchor (dense by
    construction)."""
    full = tmp_path / "full.yaml"
    full.write_text(TINY_FULL)
    shallow = tmp_path / "shallow.yaml"
    shallow.write_text(TINY_SHALLOW)
    out = tmp_path / "sched.json"
    tool_main([
        "--config", str(full), "--shallow_config", str(shallow),
        "--t_switch", "5", "--steps", "12", "--batch", "2",
        "--chunk", "6", "--out", str(out),
    ])
    table, meta = load_cache_schedule(str(out), num_timesteps=12,
                                      with_meta=True)
    assert meta["mode"] == "duodiff" and meta["t_switch"] == 5
    assert bool(table[7:].all())  # t >= steps - t_switch: all anchors
    assert table[:7].sum() < 7    # late segment actually derived


def test_derive_static_exit_mode(tmp_path, tool_main):
    """Static-exit mode: per-bucket drift with bucket-entry resets;
    non-cacheable buckets (exit at/inside the mid block) come back as
    all-anchor rows."""
    ee = tmp_path / "ee.yaml"
    ee.write_text(TINY_EE)
    out = tmp_path / "sched.json"
    # depth 5 -> k=2, default n_outer=1: cacheable needs exit_layer > 3
    tool_main([
        "--config", str(ee), "--static_schedule", "11-6:5,5-0:2",
        "--steps", "12", "--batch", "2", "--chunk", "6",
        "--out", str(out),
    ])
    table, meta = load_cache_schedule(str(out), num_timesteps=12,
                                      with_meta=True)
    assert meta["mode"] == "static_exit"
    assert meta["buckets"][0]["cacheable"] is True
    assert meta["buckets"][1]["cacheable"] is False  # layer 2 <= mid
    assert bool(table[:6].all())  # dense bucket rows are anchors
    assert table[6:].sum() < 6    # cacheable bucket actually derived


def test_derive_static_exit_rejects_gappy_schedule(tmp_path, tool_main):
    ee = tmp_path / "ee.yaml"
    ee.write_text(TINY_EE)
    with pytest.raises(SystemExit, match="cover"):
        tool_main([
            "--config", str(ee), "--static_schedule", "9-6:5,5-0:4",
            "--steps", "12", "--batch", "2", "--out",
            str(tmp_path / "x.json"),
        ])

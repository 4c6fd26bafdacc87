"""Cross-layer probe calibration (duodiff_tpu.diffusion.calibration):
affine fitting, trajectory stat collection, and the headline property —
a bidirectional adaptive walk that oscillates on RAW probe values
(the measured cross-layer scale mismatch, commit 501f462) stabilizes on
calibrated values."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from duodiff_tpu.config import UViTConfig
from duodiff_tpu.diffusion import NoiseSchedule
from duodiff_tpu.diffusion.calibration import (
    apply_probe_calibration,
    collect_probe_stats,
    fit_probe_calibration,
    load_probe_calibration,
    save_probe_calibration,
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


def _miscalibrated(params):
    """Force the measured failure mode: probe slot 1 pegged near 1.0,
    probe slot 4 pegged near 0.0 (each probe its own scale)."""
    probes = jax.tree_util.tree_map(np.asarray, params["probes"])
    kernel = probes["classifier"]["kernel"].copy()
    bias = probes["classifier"]["bias"].copy()
    kernel[1] = 0.0
    bias[1] = 20.0   # sigmoid -> ~1.0
    kernel[4] = 0.0
    bias[4] = -20.0  # sigmoid -> ~0.0
    out = dict(params)
    out["probes"] = {"classifier": {"kernel": jnp.asarray(kernel),
                                    "bias": jnp.asarray(bias)}}
    return out


def test_fit_recovers_affine():
    rng = np.random.RandomState(0)
    u = rng.rand(200, 3)
    a_true, b_true = np.array([2.0, 0.5, 3.0]), np.array([0.1, -0.2, 0.0])
    e = u * a_true + b_true
    calib = fit_probe_calibration(u, e)
    np.testing.assert_allclose(calib["a"], a_true, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(calib["b"], b_true, rtol=1e-6, atol=1e-8)
    assert all(r > 0.999 for r in calib["r"])
    assert apply_probe_calibration(calib, 0, 0.5) == pytest.approx(1.1)


def test_fit_degenerate_columns():
    """Zero-variance and anti-correlated probes fall back to the constant
    predictor a=0, b=mean(e) — a dead probe still lands on the layer's
    average realized error, keeping cross-layer comparisons sane."""
    rng = np.random.RandomState(1)
    u = np.stack([np.full(100, 0.7), rng.rand(100)], axis=1)
    e = np.stack([rng.rand(100), 1.0 - u[:, 1]], axis=1)  # const-u; anti
    calib = fit_probe_calibration(u, e)
    assert calib["a"][0] == 0.0
    assert calib["b"][0] == pytest.approx(e[:, 0].mean())
    assert calib["a"][1] == 0.0  # negative slope clamped
    assert calib["b"][1] == pytest.approx(e[:, 1].mean())


def test_apply_clips_to_fitted_range():
    """Out-of-range raw values clamp to the fitted input range instead of
    extrapolating (measured failure: a truncated-trajectory probe reading
    far below its dense-trajectory range extrapolated to error -107)."""
    rng = np.random.RandomState(2)
    u = 0.7 + 0.3 * rng.rand(100, 1)  # fitted on u in [0.7, 1.0]
    e = 200.0 * u - 100.0
    calib = fit_probe_calibration(u, e)
    lo = apply_probe_calibration(calib, 0, 0.0)   # far below range
    hi = apply_probe_calibration(calib, 0, 5.0)   # far above range
    assert lo == pytest.approx(calib["a"][0] * u.min() + calib["b"][0])
    assert hi == pytest.approx(calib["a"][0] * u.max() + calib["b"][0])
    assert lo >= 0.0  # no absurd negative error estimates
    # legacy files without the range fields keep plain affine behavior
    legacy = {"a": calib["a"], "b": calib["b"]}
    assert apply_probe_calibration(legacy, 0, 0.0) == pytest.approx(
        calib["b"][0]
    )


def test_apply_clamps_output_to_observed_errors():
    """A least-squares affine on a NONLINEAR e(u) can cross zero inside
    its own fitted input range (measured: slot 9 mapped u_min to -12.5).
    The output clamp floors estimates at the smallest realized error ever
    observed for the slot."""
    rng = np.random.RandomState(3)
    u = 0.4 + 0.6 * rng.rand(300, 1)
    e = np.maximum(0.5, 300.0 * (u - 0.7))  # flat floor then steep rise
    calib = fit_probe_calibration(u, e)
    # the affine itself is negative at the low end of the fitted range...
    assert calib["a"][0] * u.min() + calib["b"][0] < 0
    # ...but the applied estimate never drops below the observed floor
    assert apply_probe_calibration(calib, 0, float(u.min())) >= 0.5
    assert apply_probe_calibration(calib, 0, 0.0) >= 0.5


def test_fit_shape_mismatch():
    with pytest.raises(ValueError, match="shape"):
        fit_probe_calibration(np.zeros((10, 3)), np.zeros((10, 2)))


def test_collect_probe_stats(ee_model):
    model, params = ee_model
    schedule = NoiseSchedule.create(steps=8)
    u_rows, e_rows = collect_probe_stats(
        lambda x, t, y: model.apply({"params": params}, x, t, y),
        schedule, jax.random.PRNGKey(0), (2, 16, 16, 3),
    )
    assert u_rows.shape == (8, CFG.depth)
    assert e_rows.shape == (8, CFG.depth)
    assert np.isfinite(u_rows).all() and np.isfinite(e_rows).all()
    assert (e_rows >= 0).all()
    # probes are sigmoids
    assert (u_rows >= 0).all() and (u_rows <= 1).all()


def test_save_load_roundtrip(tmp_path):
    calib = {"a": [1.0, 2.0], "b": [0.0, -0.1], "r": [0.9, 0.8],
             "mean_error": [0.5, 0.2]}
    path = tmp_path / "calib.json"
    save_probe_calibration(path, calib, meta={"config": "x.yaml"})
    got = load_probe_calibration(path)
    assert got["a"] == calib["a"] and got["b"] == calib["b"]
    assert got["unit"] == "mse_vs_backbone"
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"anchors": [1, 2]}))
    with pytest.raises(ValueError, match="calibration"):
        load_probe_calibration(bad)


def test_calibration_depth_mismatch(ee_model):
    from duodiff_tpu.diffusion.static_exit import make_adaptive_exit_sampler

    _, params = ee_model
    schedule = NoiseSchedule.create(steps=8)
    with pytest.raises(ValueError, match="depth"):
        make_adaptive_exit_sampler(
            CFG, params, schedule=schedule, layers=[1, 4],
            calibration={"a": [1.0], "b": [0.0]},
        )


def _direction_changes(seq):
    deltas = [b - a for a, b in zip(seq, seq[1:]) if b != a]
    return sum(
        1 for d1, d2 in zip(deltas, deltas[1:])
        if (d1 > 0) != (d2 > 0)
    )


def test_bidirectional_below_gate_cannot_flipflop(ee_model):
    """The round-3 failure construction: probe slot 1 pegged ~1.0, slot 4
    pegged ~0.0. The OLD own-probe shallower-gate flip-flopped 1<->4 every
    chunk on exactly this input; the below-candidate gate reads slot 1's
    probe before moving to it (~1.0 > margin) and stays put — flip-flop is
    structurally impossible on static probe readings because the down
    decision and the subsequent up decision read the SAME probe."""
    from duodiff_tpu.diffusion.static_exit import make_adaptive_exit_sampler

    _, params0 = ee_model
    params = _miscalibrated(params0)
    schedule = NoiseSchedule.create(steps=20)
    shape = (2, 16, 16, 3)
    raw = make_adaptive_exit_sampler(
        CFG, params, schedule=schedule, layers=[1, 4], chunk=2,
        threshold=0.5, monotone=False, dtype=jnp.float32,
    )
    _, log_raw = raw(jax.random.PRNGKey(0), shape)
    seq_raw = [r["layer"] for r in log_raw]
    assert _direction_changes(seq_raw) == 0, seq_raw
    assert seq_raw == [4] * len(seq_raw), seq_raw  # below reads ~1.0: stay
    assert all("below_probe" in r for r in log_raw)
    assert log_raw[0]["below_probe"] == pytest.approx(1.0, abs=1e-3)


def test_bidirectional_no_down_move_on_contradictory_readings(ee_model):
    """At the deepest candidate with the OWN probe over threshold (deepen
    impossible) and the below-candidate's probe clearing the margin, the
    walk must STAY: contradictory readings must not resolve toward less
    compute (round-4 advisor finding — the shallow-move branch had
    dropped the own-value hysteresis condition)."""
    from duodiff_tpu.diffusion.static_exit import make_adaptive_exit_sampler

    _, params0 = ee_model
    probes = jax.tree_util.tree_map(np.asarray, params0["probes"])
    kernel = probes["classifier"]["kernel"].copy()
    bias = probes["classifier"]["bias"].copy()
    kernel[4] = 0.0
    bias[4] = 20.0   # deepest candidate's probe pegged ~1.0 (> threshold)
    kernel[1] = 0.0
    bias[1] = -20.0  # below candidate pegged ~0.0 (clears any margin)
    params = dict(params0)
    params["probes"] = {"classifier": {"kernel": jnp.asarray(kernel),
                                       "bias": jnp.asarray(bias)}}
    schedule = NoiseSchedule.create(steps=20)
    raw = make_adaptive_exit_sampler(
        CFG, params, schedule=schedule, layers=[1, 4], chunk=2,
        threshold=0.5, monotone=False, dtype=jnp.float32,
    )
    _, log = raw(jax.random.PRNGKey(0), (2, 16, 16, 3))
    seq = [r["layer"] for r in log]
    assert seq == [4] * len(seq), seq


def test_load_probe_calibration_rejects_missing_mean_error(tmp_path):
    """Legacy/hand-made files without mean_error fail with a clear error
    at load time, not a KeyError at the use site (round-4 advisor)."""
    p = tmp_path / "calib.json"
    p.write_text(json.dumps({"a": [1.0, 1.0], "b": [0.0, 0.0]}))
    with pytest.raises(ValueError, match="mean_error"):
        load_probe_calibration(str(p))


def test_bidirectional_calibrated_walk(ee_model):
    """With calibration fitted on the same (sabotaged) checkpoint the
    threshold lives in realized-error units: the walk steps down exactly
    when the below-candidate's calibrated error clears the margin, and
    settles without oscillation."""
    from duodiff_tpu.diffusion.static_exit import make_adaptive_exit_sampler

    model, params0 = ee_model
    params = _miscalibrated(params0)
    schedule = NoiseSchedule.create(steps=20)
    shape = (2, 16, 16, 3)
    u_rows, e_rows = collect_probe_stats(
        lambda x, t, y: model.apply({"params": params}, x, t, y),
        schedule, jax.random.PRNGKey(1), shape,
    )
    calib = fit_probe_calibration(u_rows, e_rows)
    assert calib["a"][1] == 0.0 and calib["a"][4] == 0.0  # pegged probes
    # threshold comfortably above both layers' mean realized errors: the
    # below-candidate (slot 1, constant predictor b1) clears the margin,
    # so the walk descends once and stays
    thr = 2.0 * max(calib["b"][1], calib["b"][4]) / 0.7
    cal = make_adaptive_exit_sampler(
        CFG, params, schedule=schedule, layers=[1, 4], chunk=2,
        threshold=thr, monotone=False, calibration=calib,
        dtype=jnp.float32,
    )
    x_cal, log_cal = cal(jax.random.PRNGKey(0), shape)
    seq_cal = [r["layer"] for r in log_cal]
    assert _direction_changes(seq_cal) == 0, seq_cal
    assert seq_cal[0] == 4 and seq_cal[-1] == 1, seq_cal
    assert all("calibrated" in r for r in log_cal)
    # decisions used the mapped values: constant predictors -> each row's
    # calibrated value equals its slot's intercept
    for r in log_cal:
        slot = min(r["layer"], CFG.depth - 1)
        assert r["calibrated"] == pytest.approx(calib["b"][slot], rel=1e-4)
    row0 = log_cal[0]
    assert row0["below_calibrated"] == pytest.approx(calib["b"][1],
                                                     rel=1e-4)
    assert np.isfinite(np.asarray(x_cal)).all()


def test_probed_apply_rejects_slot_past_truncation(ee_model):
    from duodiff_tpu.diffusion.static_exit import truncated_ee_apply_probed

    _, params = ee_model
    with pytest.raises(ValueError, match="probe_slots"):
        truncated_ee_apply_probed(
            CFG, params, 2, dtype=jnp.float32, probe_slots=[3]
        )

"""Cross-layer probe calibration for adaptive early exit (VERDICT r3 #3).

Each per-layer uncertainty probe is trained independently (sum-reduction
regression onto tanh pseudo-labels — reference trainer.py:381-389), so raw
probe outputs are NOT comparable across layers: on a textured-benchmark
DeeDiff checkpoint the layer-9 probe read ~1.0 while layer-4 read ~1e-4.
That miscalibration made the bidirectional adaptive bucket walk oscillate
between candidate depths (each chunk's probe said "too much error" at one
depth and "comfortably fine" at the other), destroying the trajectory
(fd ~ 91k) — which is why commit 501f462 cut the walk to
monotone-deepening-only.

This module restores real bidirectional adaptivity by fitting, per probe
slot, an affine map from probe output onto the probe's REALIZED exit error

    e_i(t) = mean((g_i - backbone)^2)

measured along a dense early-exit trajectory — the common unit every layer
shares. Calibrated values support cross-layer comparison, and the exit
threshold becomes a quantity in realized-error units instead of an
arbitrary per-probe scale.

Workflow (tools/calibrate_probes.py wraps this):

    apply_fn = <EarlyExitUViT apply returning (backbone, u, g)>
    u_rows, e_rows = collect_probe_stats(apply_fn, schedule, key, shape)
    calib = fit_probe_calibration(u_rows, e_rows)
    save_probe_calibration(path, calib)   # beside the checkpoint

then ``eesampler.py --adaptive_layers ... --adaptive_bidirectional
--probe_calibration path`` (make_adaptive_exit_sampler's ``calibration=``).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .schedule import NoiseSchedule


def collect_probe_stats(
    apply_fn: Callable,
    schedule: NoiseSchedule,
    key: jax.Array,
    shape: Sequence[int],
    y: Optional[jax.Array] = None,
):
    """Run one dense early-exit trajectory and log calibration pairs.

    The trajectory is driven by the BACKBONE output (the dense reference
    path — reference eesampler.py:74-82 semantics with threshold -inf), so
    the probes see exactly the states a full-quality sampler visits. At
    each step t the full model evaluates every probe and every head;
    we record batch means of

      u_rows[t, i] = mean(u_i)                      (probe outputs)
      e_rows[t, i] = mean((g_i - backbone_out)^2)   (realized exit errors)

    Returns ``(u_rows, e_rows)`` as (steps, depth) float32 arrays ordered
    by ascending t (row t = timestep t, matching the reference's
    error_prediction_by_timestep layout).
    """
    steps = schedule.steps
    key, init_key = jax.random.split(key)
    x = jax.random.normal(init_key, tuple(shape), dtype=jnp.float32)
    batch = x.shape[0]
    ts = jnp.arange(steps - 1, -1, -1)

    def body(carry, t):
        x, key = carry
        key, zkey = jax.random.split(key)
        t_batch = jnp.full((batch,), t, dtype=jnp.float32)
        backbone_out, u, g = apply_fn(x, t_batch, y)
        u_row = jnp.mean(u.astype(jnp.float32), axis=1)  # (depth,)
        err = (g.astype(jnp.float32) - backbone_out.astype(jnp.float32)[None])
        e_row = jnp.mean(err * err, axis=tuple(range(1, err.ndim)))  # (depth,)
        z = jnp.where(
            t > 0,
            jax.random.normal(zkey, x.shape, dtype=x.dtype),
            jnp.zeros_like(x),
        )
        x = schedule.step_predict_noise(backbone_out, x, t, z)
        return (x, key), (u_row, e_row)

    (_, _), (u_rows, e_rows) = jax.lax.scan(body, (x, key), ts)
    # scan emits t = T-1 .. 0; return ascending-t rows
    return np.asarray(u_rows)[::-1], np.asarray(e_rows)[::-1]


def fit_probe_calibration(u_rows, e_rows, *, min_rel_var: float = 1e-12):
    """Per-slot least-squares affine fit ``e ~= a * u + b``.

    Slopes are clamped to be non-negative (the probe is trained to be a
    monotone error predictor; a negative fitted slope means the probe
    carries no usable signal at this scale). Degenerate columns — zero
    probe variance or a non-positive slope — fall back to the constant
    predictor ``a = 0, b = mean(e)``: the layer's average realized error,
    which keeps cross-layer comparisons meaningful even for a dead probe.

    Returns ``{"a": [...], "b": [...], "r": [...], "mean_error": [...],
    "u_min": [...], "u_max": [...]}`` with one entry per probe slot;
    ``r`` is the Pearson correlation (diagnostic), ``u_min``/``u_max``
    the fitted input range — :func:`apply_probe_calibration` clips raw
    values into it, because the affine is meaningless outside the data it
    was fitted on (measured: a truncated-trajectory probe reading far
    below its dense-trajectory range extrapolated to error -107, poisoning
    every walk decision at that depth).
    """
    u = np.asarray(u_rows, np.float64)
    e = np.asarray(e_rows, np.float64)
    if u.shape != e.shape or u.ndim != 2:
        raise ValueError(f"shape mismatch: u {u.shape} vs e {e.shape}")
    a_out, b_out, r_out = [], [], []
    for i in range(u.shape[1]):
        ui, ei = u[:, i], e[:, i]
        mu, me = ui.mean(), ei.mean()
        var_u = ((ui - mu) ** 2).mean()
        var_e = ((ei - me) ** 2).mean()
        cov = ((ui - mu) * (ei - me)).mean()
        a = cov / var_u if var_u > min_rel_var * max(mu * mu, 1.0) else 0.0
        if a <= 0.0:
            a = 0.0
        b = me - a * mu
        r = (
            cov / np.sqrt(var_u * var_e)
            if var_u > 0 and var_e > 0 else 0.0
        )
        a_out.append(float(a))
        b_out.append(float(b))
        r_out.append(float(r))
    return {
        "a": a_out,
        "b": b_out,
        "r": r_out,
        "mean_error": [float(v) for v in e.mean(axis=0)],
        "u_min": [float(v) for v in u.min(axis=0)],
        "u_max": [float(v) for v in u.max(axis=0)],
        "e_min": [float(v) for v in e.min(axis=0)],
        "e_max": [float(v) for v in e.max(axis=0)],
    }


def apply_probe_calibration(calib, slot: int, value: float) -> float:
    """Map a raw probe mean at ``slot`` onto realized-error units.

    Two clamps bound the estimate to the data the fit actually saw:

    - the raw value is clipped into the slot's fitted INPUT range
      (nearest-neighbor extrapolation — a probe evaluated on a truncated
      trajectory's states can read far outside the dense-trajectory range
      it was calibrated on, and the unclamped affine extrapolated such a
      reading to error -107);
    - the output is clipped into the slot's observed REALIZED-ERROR range
      (the relation e(u) is nonlinear, so a least-squares affine can cross
      zero inside its own fitted input range — slot 9 mapped its in-range
      low end to -12.5, sanctioning a destructive shallow move and
      permanently disabling the deepen gate).

    The estimator therefore never claims an error smaller (or larger) than
    any it ever measured for that slot.
    """
    v = float(value)
    if "u_min" in calib and "u_max" in calib:
        v = min(max(v, float(calib["u_min"][slot])),
                float(calib["u_max"][slot]))
    out = float(calib["a"][slot]) * v + float(calib["b"][slot])
    if "e_min" in calib and "e_max" in calib:
        out = min(max(out, float(calib["e_min"][slot])),
                  float(calib["e_max"][slot]))
    return out


def save_probe_calibration(path, calib, *, meta: Optional[dict] = None):
    payload = dict(calib)
    payload["unit"] = "mse_vs_backbone"
    if meta:
        payload["meta"] = meta
    Path(path).write_text(json.dumps(payload, indent=1))


def load_probe_calibration(path) -> dict:
    calib = json.loads(Path(path).read_text())
    if "a" not in calib or "b" not in calib:
        raise ValueError(
            f"{path} is not a probe calibration file (expected 'a'/'b' "
            "slope/intercept lists; produce one with "
            "tools/calibrate_probes.py)"
        )
    if len(calib["a"]) != len(calib["b"]):
        raise ValueError(f"{path}: len(a) != len(b)")
    # consumers (the bidirectional adaptive walk, quality_matrix's
    # ee_adaptive_bidir row) derive depth and thresholds from mean_error;
    # reject legacy/hand-made files here with a clear message instead of a
    # bare KeyError at use site
    if "mean_error" not in calib:
        raise ValueError(
            f"{path}: missing 'mean_error' (per-layer realized-error "
            "means) — regenerate with tools/calibrate_probes.py"
        )
    if len(calib["mean_error"]) != len(calib["a"]):
        raise ValueError(f"{path}: len(mean_error) != len(a)")
    return calib

"""Drift-derived block-cache anchor schedules.

The uniform ``--cache_every N`` rule anchors the cached middle region on
``t % N == 0`` regardless of how fast the cached residual delta actually
drifts at each part of the trajectory.  Measuring the per-step drift
``d(t) = ||delta_t - delta_{t+1}||_F`` along a dense run (the DeepCache
observation quantified: deep features change at very different rates across
the reverse process) lets us place anchors adaptively — dense where the
delta moves fast, sparse where it barely moves — holding the worst-case
accumulated staleness at or below what a chosen uniform schedule already
tolerates, with fewer anchors overall.

Greedy placement (``derive_anchor_table``): walk t from high to low
accumulating drift since the last anchor; anchor whenever the accumulated
drift would exceed the budget.  By the triangle inequality the accumulated
per-step drift upper-bounds ``||delta_t - delta_anchor||``, so every cached
step's staleness proxy stays <= budget.  The budget comes either from a
validated uniform schedule (``uniform_budget``: the max accumulated drift
any of its cached steps tolerates) or from a target anchor count
(``budget_for_count``: bisected).

Schedules serialize as JSON {"num_timesteps": T, "anchors": [t...]} and run
through the same scan as the uniform rule — ``make_block_cached_apply``
accepts the boolean table in place of the int period.

No reference counterpart (beyond-parity; the caching feature itself is the
Delta-DiT / DeepCache family from PAPERS.md).
"""

from __future__ import annotations

import json

import numpy as np

__all__ = [
    "anchors_to_table",
    "table_to_anchors",
    "uniform_table",
    "uniform_budget",
    "segment_staleness",
    "derive_anchor_table",
    "budget_for_count",
    "save_cache_schedule",
    "load_cache_schedule",
]


def anchors_to_table(anchors, steps: int) -> np.ndarray:
    """(sorted or not) anchor timesteps -> boolean table indexed by t."""
    table = np.zeros((steps,), dtype=bool)
    a = np.asarray(list(anchors), dtype=np.int64)
    if a.size and (a.min() < 0 or a.max() >= steps):
        raise ValueError(
            f"anchor timesteps must lie in [0, {steps}), got "
            f"[{a.min()}, {a.max()}]"
        )
    table[a] = True
    return table


def table_to_anchors(table) -> list[int]:
    return [int(t) for t in np.flatnonzero(np.asarray(table, dtype=bool))]


def uniform_table(every: int, steps: int) -> np.ndarray:
    """The table equivalent of the ``t % every == 0`` uniform rule (the
    forced t_first anchor is applied by make_block_cached_apply in both
    forms, so it is deliberately NOT baked into tables)."""
    if every < 1:
        raise ValueError(f"every must be >= 1, got {every}")
    t = np.arange(steps)
    return (t % every) == 0


def segment_staleness(drift: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Accumulated-drift staleness proxy per step under an anchor table.

    ``drift[t]`` is the measured per-step delta drift d(t) =
    ||delta_t - delta_{t+1}|| for t in [0, steps-1); drift[steps-1] is
    unused (the first reverse step always anchors).  Returns ``stale`` with
    stale[t] = sum of drift over the open interval (t, anchor] walking down
    from the step's governing anchor — 0 at anchors and at t = steps-1.
    """
    drift = np.asarray(drift, dtype=np.float64)
    table = np.asarray(table, dtype=bool)
    steps = table.shape[0]
    if drift.shape[0] != steps:
        raise ValueError(f"drift length {drift.shape[0]} != steps {steps}")
    stale = np.zeros((steps,), dtype=np.float64)
    acc = 0.0
    for t in range(steps - 2, -1, -1):
        acc += drift[t]
        if table[t]:
            acc = 0.0
        stale[t] = acc
    return stale


def uniform_budget(drift: np.ndarray, every: int) -> float:
    """The max accumulated staleness any cached step tolerates under the
    uniform ``t % every == 0`` schedule — the quality-validated operating
    point's implicit drift budget."""
    steps = np.asarray(drift).shape[0]
    return float(segment_staleness(drift, uniform_table(every, steps)).max())


def derive_anchor_table(
    drift: np.ndarray, budget: float, *, anchor_zero: bool = True
) -> np.ndarray:
    """Greedy anchor placement: walking t = steps-1 -> 0, anchor whenever
    the drift accumulated since the last anchor exceeds ``budget``.

    Guarantees segment_staleness(drift, table).max() <= budget wherever a
    single step's drift itself fits the budget (a step whose own drift
    exceeds it anchors immediately — staleness can never accumulate across
    it).  t = steps-1 anchors implicitly at runtime (make_block_cached_apply
    t_first); ``anchor_zero`` forces the final t=0 step, where the full
    model matters most (matching the uniform rule, which always anchors 0).
    """
    drift = np.asarray(drift, dtype=np.float64)
    steps = drift.shape[0]
    table = np.zeros((steps,), dtype=bool)
    acc = 0.0
    for t in range(steps - 2, -1, -1):
        acc += drift[t]
        if acc > budget:
            table[t] = True
            acc = 0.0
    if anchor_zero:
        table[0] = True
    return table


def budget_for_count(
    drift: np.ndarray, num_anchors: int, *, iters: int = 60
) -> float:
    """Bisect the largest budget whose greedy table uses <= num_anchors
    anchors (anchor count is monotone non-increasing in the budget)."""
    drift = np.asarray(drift, dtype=np.float64)
    lo, hi = 0.0, float(drift.sum()) + 1.0
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        n = int(derive_anchor_table(drift, mid).sum())
        if n > num_anchors:
            lo = mid
        else:
            hi = mid
    return hi


def save_cache_schedule(path, table, meta: dict | None = None) -> None:
    steps = int(np.asarray(table).shape[0])
    payload = {
        "num_timesteps": steps,
        "anchors": table_to_anchors(table),
    }
    if meta:
        payload["meta"] = meta
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")


def load_cache_schedule(
    path, *, num_timesteps: int | None = None, with_meta: bool = False
):
    """Load a schedule JSON -> boolean table (validating the step count
    against the sampler's when given). ``with_meta=True`` also returns the
    derivation metadata dict (empty if the file has none)."""
    with open(path) as f:
        payload = json.load(f)
    steps = int(payload["num_timesteps"])
    if num_timesteps is not None and steps != num_timesteps:
        raise ValueError(
            f"cache schedule {path} was derived for num_timesteps={steps}, "
            f"sampler runs {num_timesteps}"
        )
    table = anchors_to_table(payload["anchors"], steps)
    if with_meta:
        return table, payload.get("meta", {})
    return table

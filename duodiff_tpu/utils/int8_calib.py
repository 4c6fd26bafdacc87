"""Static-scale calibration for the int8 sampling path.

The W8A8 kernels quantize activations dynamically per token. Replacing the
MLP sublayer's two quant sites (post-LN, post-GELU) with STATIC calibrated
scales removes the row-amax reduce + rank-1 dequant epilogue — measured 11%
faster per MLP call at the flagship geometry (tools/probe_int8_static.py;
the attention sites measured no win and stay dynamic).

Calibration = run a full reverse trajectory with the dynamic-int8
calibration forward (XLA reference math, ``int8_calibrate=True`` on the
model — each Block sows its MLP activation amaxes into the "int8_calib"
collection) and keep the running max per site, entirely on device inside
one chunked lax.scan. The resulting per-block (xn_amax, h_amax) pairs feed
``Block.int8_mlp_scales``; out-of-range activations at serve time saturate
at the calibrated amax (clip, not wraparound).

No reference counterpart (the reference is fp32/AMP eager); this
accelerates the sampling CLIs (reference sampler.py:82-155).
"""

from __future__ import annotations

import json
from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp


def _collect_leaves(tree, leaf: str, prefix="") -> Dict[str, jax.Array]:
    """Flatten the sown int8_calib collection to {block_name: value} for
    one leaf name ("mlp_amax" (2,) or "mlp_rowamax" (2, B*L))."""
    out: Dict[str, jax.Array] = {}
    for k, v in tree.items():
        if k == leaf:
            # flax sow stores a tuple of taps; one apply -> one tap
            val = v[0] if isinstance(v, (tuple, list)) else v
            out[prefix.rstrip("/")] = val
        elif isinstance(v, Mapping):
            name = k if not prefix else f"{prefix}{k}"
            out.update(_collect_leaves(v, leaf, prefix=f"{name}/"))
    return out


def _collect_amax_leaves(tree, prefix="") -> Dict[str, jax.Array]:
    return _collect_leaves(tree, "mlp_amax", prefix=prefix)


# Quantile fractions at which each step's per-row amax distribution is
# summarized (dense in the tail — that's where a clip scale lives). The
# union across steps is reconstructed from these curves offline
# (_union_percentile).
CALIB_FRACTIONS = tuple(
    [i / 19 * 0.95 for i in range(20)]
    + [0.97, 0.98, 0.99, 0.995, 0.998, 0.999, 0.9995, 0.9999, 1.0]
)


def _union_percentile(quants, fractions, p: float) -> float:
    """Percentile ``p`` (in [0, 100]) of the union (equal-weight mixture
    over steps) of per-step row-amax distributions, each summarized by its
    quantile curve ``quants[s]`` at ``fractions``."""
    import numpy as np

    q = np.asarray(quants, np.float64)  # (S, Q) nondecreasing rows
    f = np.asarray(fractions, np.float64)
    cand = np.unique(q.reshape(-1))
    cdf = np.zeros_like(cand)
    for row in q:
        cdf += np.interp(cand, row, f, left=0.0, right=1.0)
    cdf /= q.shape[0]
    idx = int(np.searchsorted(cdf, p / 100.0, side="left"))
    return float(cand[min(idx, len(cand) - 1)])


def calibrate_int8_stats(
    model_calib,
    params,
    schedule,
    key: jax.Array,
    shape: Tuple[int, ...],
    *,
    parametrization: str = "predict_noise",
    y: Optional[jax.Array] = None,
    chunk: int = 100,
):
    """Run one full reverse DDPM trajectory with the dynamic-int8
    calibration forward and return per-block activation statistics:

        (amax, quants) with
        amax:   {block_name: (2,) np.float32}  — global per-site amax
        quants: {block_name: (steps, 2, Q) np.float32} — per-step quantile
                curves of the per-ROW amaxes at CALIB_FRACTIONS

    ``model_calib`` must be built with attn_impl="fused_int8" and
    int8_calibrate=True (so its numerics match the deployed dynamic-int8
    path while sowing amaxes).

    Early-exit caveat: for EarlyExitUViT models the calibration trajectory
    steps on the BACKBONE output, while eesampler at serve time steps on
    the selected exit-head output. The block activations still cover every
    layer each step (dense compute + select), but the x trajectory itself
    diverges under aggressive thresholds, so activations past amax*margin
    saturate silently — raise ``margin`` (or calibrate at a representative
    threshold via a static schedule) when quality-matrixing low-threshold
    early exit with static scales.
    """
    import numpy as np

    steps = schedule.steps
    fracs = jnp.asarray(CALIB_FRACTIONS, jnp.float32)

    def apply_with_stats(params, x, t_batch, y):
        out, col = model_calib.apply(
            {"params": params}, x, t_batch, y, mutable=["int8_calib"]
        )
        if isinstance(out, tuple):  # EarlyExitUViT: gate on the backbone
            out = out[0]
        amax = _collect_leaves(col["int8_calib"], "mlp_amax")
        rows = _collect_leaves(col["int8_calib"], "mlp_rowamax")
        # summarize each site's (2, B*L) row amaxes into its per-step
        # quantile curve (2, Q) — small enough to stack across the scan
        quants = {
            k: jnp.quantile(v, fracs, axis=-1).T for k, v in rows.items()
        }
        return out, amax, quants

    # params/y are jit ARGUMENTS, not closure constants: closing over the
    # weight tree bakes it into the traced computation (385MB serialized
    # executable for the flagship — the same anti-pattern sampler.py:226-229
    # and ChunkedDDPMSampler's params-mode exist to avoid)
    @jax.jit
    def run_chunk(params, y, x, key, ts, amax_acc):
        def body(carry, t):
            x, amax_acc = carry
            t_batch = jnp.full((x.shape[0],), t, jnp.float32)
            out, amax, quants = apply_with_stats(params, x, t_batch, y)
            step_key = jax.random.fold_in(key, t)
            z = jnp.where(
                t > 0,
                jax.random.normal(step_key, x.shape, jnp.float32),
                jnp.zeros(x.shape, jnp.float32),
            )
            x = schedule.step(parametrization, out, x, t, z)
            amax_acc = jax.tree_util.tree_map(
                jnp.maximum, amax_acc, amax
            )
            return (x, amax_acc), quants

        (x, amax_acc), quants = jax.lax.scan(body, (x, amax_acc), ts)
        return x, amax_acc, quants

    # fold with `steps` for x0: per-step noise folds t in [0, steps)
    x = jax.random.normal(jax.random.fold_in(key, steps), shape, jnp.float32)
    # one probe apply to discover the amax tree structure
    amax0 = jax.eval_shape(
        lambda x: apply_with_stats(
            params, x, jnp.zeros((shape[0],), jnp.float32), y
        ),
        x,
    )[1]
    amax_acc = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.float32), amax0
    )

    ts_all = jnp.arange(steps - 1, -1, -1)
    quant_chunks = []
    for i in range(0, steps, chunk):
        ts = ts_all[i : i + chunk]
        x, amax_acc, quants = run_chunk(params, y, x, key, ts, amax_acc)
        quant_chunks.append(
            {k: np.asarray(v) for k, v in quants.items()}
        )

    def short(name):
        # strip module-path prefixes ("uvit/in_blocks_0" for EE models):
        # block names are unique within a backbone
        return name.split("/")[-1]

    amax = {short(k): np.asarray(v) for k, v in amax_acc.items()}
    quants = {
        short(k): np.concatenate([c[k] for c in quant_chunks], axis=0)
        for k in quant_chunks[0]
    }
    return amax, quants


def scales_from_stats(
    amax: Dict[str, "np.ndarray"],
    quants: Dict[str, "np.ndarray"],
    *,
    mode: str = "amax",
    percentile: float = 99.9,
    margin: float = 1.0,
) -> Dict[str, Tuple[float, float]]:
    """Turn trajectory statistics into per-block static scales.

    mode="amax":        global amax * margin (the round-3 calibration;
                        outlier-sensitive — one hot token sets the scale).
    mode="percentile":  the ``percentile``-th percentile of the union of
                        per-row amaxes across all steps, * margin. Rows
                        above the clip saturate (the kernels clip, not
                        wrap), the remaining ~p% of rows gain resolution.
    """
    if mode == "amax":
        return {
            k: (float(v[0]) * margin, float(v[1]) * margin)
            for k, v in amax.items()
        }
    if mode != "percentile":
        raise ValueError(f"unknown calibration mode {mode!r}")
    out = {}
    for k, q in quants.items():
        sx = _union_percentile(q[:, 0, :], CALIB_FRACTIONS, percentile)
        sh = _union_percentile(q[:, 1, :], CALIB_FRACTIONS, percentile)
        # never exceed the observed amax (percentile 100 == amax)
        out[k] = (
            min(sx * margin, float(amax[k][0])),
            min(sh * margin, float(amax[k][1])),
        )
    return out


def calibrate_int8_mlp_scales(
    model_calib,
    params,
    schedule,
    key: jax.Array,
    shape: Tuple[int, ...],
    *,
    parametrization: str = "predict_noise",
    y: Optional[jax.Array] = None,
    chunk: int = 100,
    margin: float = 1.0,
    mode: str = "amax",
    percentile: float = 99.9,
) -> Dict[str, Tuple[float, float]]:
    """One-call calibration: run the trajectory (calibrate_int8_stats) and
    reduce to static scales (scales_from_stats)."""
    amax, quants = calibrate_int8_stats(
        model_calib, params, schedule, key, shape,
        parametrization=parametrization, y=y, chunk=chunk,
    )
    return scales_from_stats(
        amax, quants, mode=mode, percentile=percentile, margin=margin
    )


# ---------------------------------------------------------------- JSON I/O


def save_int8_scales(path, scales: Dict[str, Tuple[float, float]],
                     meta: Optional[dict] = None) -> None:
    with open(path, "w") as f:
        json.dump(
            {"blocks": {k: list(v) for k, v in scales.items()},
             "meta": meta or {}},
            f, indent=2, sort_keys=True,
        )


def load_int8_scales(path) -> Dict[str, Tuple[float, float]]:
    with open(path) as f:
        data = json.load(f)
    return {k: (float(v[0]), float(v[1]))
            for k, v in data["blocks"].items()}


def scales_dict_to_tuple(scales: Dict[str, Tuple[float, float]],
                         depth: int) -> tuple:
    """{block_name: (sx, sh)} -> block-execution-order tuple for
    ``UViT.int8_mlp_scales`` (in_0..in_{k-1}, mid, out_0..out_{k-1})."""
    k = depth // 2
    names = (
        [f"in_blocks_{i}" for i in range(k)]
        + ["mid_block"]
        + [f"out_blocks_{i}" for i in range(k)]
    )
    missing = [n for n in names if n not in scales]
    if missing:
        raise ValueError(
            f"int8 scales file is missing blocks {missing} "
            f"(has {sorted(scales)}) — calibrated for a different depth?"
        )
    return tuple(tuple(scales[n]) for n in names)

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


def _collect_amax_leaves(tree, prefix="") -> Dict[str, jax.Array]:
    """Flatten the sown int8_calib collection to {block_name: (2,) amax}."""
    out: Dict[str, jax.Array] = {}
    for k, v in tree.items():
        if k == "mlp_amax":
            # flax sow stores a tuple of taps; one apply -> one tap
            val = v[0] if isinstance(v, (tuple, list)) else v
            out[prefix.rstrip("/")] = val
        elif isinstance(v, Mapping):
            name = k if not prefix else f"{prefix}{k}"
            out.update(_collect_amax_leaves(v, prefix=f"{name}/"))
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
) -> Dict[str, Tuple[float, float]]:
    """Run one full reverse DDPM trajectory and return per-block calibrated
    MLP activation amaxes {block_name: (xn_amax, h_amax)}.

    ``model_calib`` must be built with attn_impl="fused_int8" and
    int8_calibrate=True (so its numerics match the deployed dynamic-int8
    path while sowing amaxes). ``margin`` scales the returned amaxes
    (headroom beyond the calibration trajectory).

    Early-exit caveat: for EarlyExitUViT models the calibration trajectory
    steps on the BACKBONE output, while eesampler at serve time steps on
    the selected exit-head output. The block activations still cover every
    layer each step (dense compute + select), but the x trajectory itself
    diverges under aggressive thresholds, so activations past amax*margin
    saturate silently — raise ``margin`` (or calibrate at a representative
    threshold via a static schedule) when quality-matrixing low-threshold
    early exit with static scales.
    """
    steps = schedule.steps

    def apply_with_amax(params, x, t_batch, y):
        out, col = model_calib.apply(
            {"params": params}, x, t_batch, y, mutable=["int8_calib"]
        )
        if isinstance(out, tuple):  # EarlyExitUViT: gate on the backbone
            out = out[0]
        amax = _collect_amax_leaves(col["int8_calib"])
        return out, amax

    # params/y are jit ARGUMENTS, not closure constants: closing over the
    # weight tree bakes it into the traced computation (385MB serialized
    # executable for the flagship — the same anti-pattern sampler.py:226-229
    # and ChunkedDDPMSampler's params-mode exist to avoid)
    @jax.jit
    def run_chunk(params, y, x, key, ts, amax_acc):
        def body(carry, t):
            x, amax_acc = carry
            t_batch = jnp.full((x.shape[0],), t, jnp.float32)
            out, amax = apply_with_amax(params, x, t_batch, y)
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
            return (x, amax_acc), None

        (x, amax_acc), _ = jax.lax.scan(body, (x, amax_acc), ts)
        return x, amax_acc

    # fold with `steps` for x0: per-step noise folds t in [0, steps)
    x = jax.random.normal(jax.random.fold_in(key, steps), shape, jnp.float32)
    # one probe apply to discover the amax tree structure
    _, amax0 = jax.eval_shape(
        lambda x: apply_with_amax(
            params, x, jnp.zeros((shape[0],), jnp.float32), y
        ),
        x,
    )
    amax_acc = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.float32), amax0
    )

    ts_all = jnp.arange(steps - 1, -1, -1)
    for i in range(0, steps, chunk):
        ts = ts_all[i : i + chunk]
        x, amax_acc = run_chunk(params, y, x, key, ts, amax_acc)

    return {
        # strip module-path prefixes ("uvit/in_blocks_0" for EE models):
        # block names are unique within a backbone
        name.split("/")[-1]: (float(v[0]) * margin, float(v[1]) * margin)
        for name, v in amax_acc.items()
    }


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

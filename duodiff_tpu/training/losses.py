"""Training losses (reference trainer.py:307-407, re-derived functionally).

All losses are pure functions of (model outputs, targets) so they jit/grad
cleanly and run in fp32 regardless of the forward compute dtype.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from duodiff_tpu.diffusion.schedule import NoiseSchedule


def mse(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))


def uvit_loss(
    prediction: jax.Array,
    *,
    parametrization: str,
    noise: jax.Array,
    clean: jax.Array,
    noisy: jax.Array,
    timesteps: jax.Array,
    schedule: NoiseSchedule,
) -> jax.Array:
    """MSE under one of three parametrizations (reference trainer.py:319-352).

    - predict_noise:    target = epsilon
    - predict_original: target = x_0
    - predict_previous: target = closed-form posterior mean of x_{t-1}
    """
    if parametrization == "predict_noise":
        target = noise
    elif parametrization == "predict_original":
        target = clean
    elif parametrization == "predict_previous":
        target = schedule.predict_previous_target(clean, noisy, timesteps)
    else:
        raise ValueError(f"Unknown parametrization type {parametrization}")
    return mse(prediction, target)


def deediff_loss(
    backbone_output: jax.Array,
    classifier_outputs: jax.Array,  # (L, B)
    ee_outputs: jax.Array,  # (L, B, H, W, C)
    *,
    parametrization: str,
    noise: jax.Array,
    clean: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """DeeDiff 4-term loss (reference trainer.py:358-405).

    Returns (L_simple, L_u_t, L_UAL_t, unweighted):
      - L_simple: backbone MSE against the parametrization target.
      - L_u_t: probe regression onto the pseudo-label
        u_t_hat = mean_CHW(tanh|g_i - target|), summed over (L, B)
        (reference uses reduction="sum", trainer.py:389).
      - L_UAL_t: uncertainty-weighted per-layer loss
        ((1 - u_t_hat) * L_n_t).mean(batch).sum(layers). Note the reference
        does NOT stop gradients through u_t_hat here — replicated.
      - unweighted: L_n_t.mean(batch).sum(layers), only added to the total
        under --use_unweighted_loss (reference trainer.py:400-402,190-194).
    """
    if parametrization == "predict_noise":
        target = noise
    elif parametrization == "predict_original":
        target = clean
    else:
        raise ValueError(f"Unknown parametrization type {parametrization}")

    target = target.astype(jnp.float32)
    ee = ee_outputs.astype(jnp.float32)
    u = classifier_outputs.astype(jnp.float32)

    l_simple = mse(backbone_output, target)

    diff = ee - target[None]
    u_t_hat = jnp.tanh(jnp.abs(diff)).mean(axis=(-1, -2, -3))  # (L, B)
    l_u_t = jnp.sum(jnp.square(u - u_t_hat))

    l_n_t = jnp.square(diff).mean(axis=(-1, -2, -3))  # (L, B)
    l_ual_t = jnp.sum(jnp.mean((1.0 - u_t_hat) * l_n_t, axis=1))

    unweighted = jnp.sum(jnp.mean(l_n_t, axis=1))

    return l_simple, l_u_t, l_ual_t, unweighted


def total_deediff_loss(parts, use_unweighted_loss: bool) -> jax.Array:
    """Combine the 4 terms (reference trainer.py:190-194)."""
    l_simple, l_u_t, l_ual_t, unweighted = parts
    total = l_simple + l_u_t + l_ual_t
    if use_unweighted_loss:
        total = total + unweighted
    return total

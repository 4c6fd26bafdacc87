"""Train state + jitted train step.

TPU replacements for the reference's eager loop (trainer.py:182-215):
  - native bf16 forward (no GradScaler — bf16 needs no loss scaling),
  - optax chain: global-norm clip (max_grad_norm) -> AdamW with the
    cosine-warmup schedule,
  - one jitted, donated train_step with batch sharded over the "data" mesh
    axis and optional tensor parallelism over "model" (gradient reduction is
    the psum XLA inserts — the reference has no equivalent, SURVEY.md §2b).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from duodiff_tpu.diffusion.schedule import NoiseSchedule
from duodiff_tpu.training.losses import deediff_loss, total_deediff_loss, uvit_loss
from duodiff_tpu.training.lr import cosine_schedule_with_warmup


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # Opt-in EMA of the params (the reference lacks EMA, but U-ViT upstream
    # trains with it and it matters for FID; enable with --ema_decay).
    ema_params: Any = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None:
            d = self.ema_decay
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                new_ema,
                new_params,
            )
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )


def make_optimizer(
    *,
    lr: float,
    weight_decay: float,
    beta1: float,
    beta2: float,
    max_grad_norm: float,
    num_warmup_steps: int,
    num_training_steps: int,
    skip_nonfinite: int = 0,
    grad_accum: int = 1,
) -> optax.GradientTransformation:
    """AdamW + cosine-warmup + global-norm clipping
    (reference trainer.py:121-130,166-172,210).

    Production knobs beyond the reference (both fully on-device — no
    per-step host syncs, unlike a host-side ``if not finite`` check):
      - ``skip_nonfinite > 0``: wrap in ``optax.apply_if_finite`` — a step
        whose gradients contain inf/NaN leaves params and Adam moments
        untouched; errors only after that many CONSECUTIVE bad steps.
      - ``grad_accum > 1``: ``optax.MultiSteps`` micro-batching — gradients
        average across k data steps and the wrapped update (clip, Adam,
        LR-schedule position) advances once per k. ``num_warmup_steps`` /
        ``num_training_steps`` therefore count OPTIMIZER UPDATES, not data
        steps; callers divide their data-step budget by ``grad_accum``.
    """
    schedule = cosine_schedule_with_warmup(lr, num_warmup_steps, num_training_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(
            learning_rate=schedule,
            b1=beta1,
            b2=beta2,
            weight_decay=weight_decay,
        ),
    )
    if skip_nonfinite:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=skip_nonfinite)
    if grad_accum > 1:
        tx = optax.MultiSteps(
            tx, every_k_schedule=grad_accum
        ).gradient_transformation()
    return tx


def create_train_state(
    params, tx: optax.GradientTransformation, ema_decay: float = 0.0
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        ema_params=jax.tree_util.tree_map(jnp.copy, params)
        if ema_decay > 0.0
        else None,
        ema_decay=ema_decay,
    )


def make_train_step(
    apply_fn: Callable,
    schedule: NoiseSchedule,
    *,
    model_kind: str,  # "uvit" | "deediff_uvit"
    parametrization: str,
    use_unweighted_loss: bool = False,
    has_labels: bool = False,
    teacher_apply: Optional[Callable] = None,
    distill_alpha: float = 1.0,
    t_min: int = 0,
    label_dropout: float = 0.0,
    null_label: Optional[int] = None,
):
    """Build the pure train-step function.

    step(state, batch, key[, teacher_params]) -> (state, metrics)
      batch: dict with "image" (B, H, W, C) [latents already encoded for
      imagenet256] and optionally "label" (B,).

    The per-step flow mirrors reference trainer.py:307-352: draw uniform
    timesteps, add noise via q(x_t|x_0), forward, parametrization loss.

    Distillation (no reference equivalent; NOTES.md candidate): when
    ``teacher_apply(teacher_params, x, t, y)`` is given, the loss becomes
    ``alpha * MSE(student, stop_grad(teacher)) + (1-alpha) * task_loss`` —
    e.g. distill the DuoDiff shallow model from the trained full model on
    its deployment regime by setting ``t_min`` to the planned
    ``steps - t_switch`` (the shallow model only ever serves t >= t_min).
    Teacher params are a traced argument (constants would bloat the jitted
    module past remote-compile limits).
    """

    def loss_fn(params, batch, key, teacher_params=None):
        clean = batch["image"].astype(jnp.float32)
        labels = batch.get("label") if has_labels else None
        b = clean.shape[0]
        t_key, n_key = jax.random.split(key)
        if labels is not None and label_dropout > 0.0:
            # classifier-free-guidance training (beyond-parity): replace a
            # random fraction of labels with the null token so the model
            # learns the unconditional distribution alongside. d_key comes
            # from fold_in, NOT a 3-way split — t_key/n_key must stay
            # bit-identical to label_dropout=0 runs (seed reproducibility).
            d_key = jax.random.fold_in(key, 0x1ABE1)
            drop = jax.random.bernoulli(d_key, label_dropout, (b,))
            labels = jnp.where(drop, null_label, labels)
        timesteps = jax.random.randint(t_key, (b,), t_min, schedule.steps)
        noise, noisy = schedule.add_noise(n_key, clean, timesteps)

        if model_kind == "uvit":
            pred = apply_fn(params, noisy, timesteps.astype(jnp.float32), labels)
            loss = uvit_loss(
                pred,
                parametrization=parametrization,
                noise=noise,
                clean=clean,
                noisy=noisy,
                timesteps=timesteps,
                schedule=schedule,
            )
            metrics = {"train_loss": loss}
            if teacher_apply is not None:
                teacher_out = jax.lax.stop_gradient(
                    teacher_apply(
                        teacher_params, noisy,
                        timesteps.astype(jnp.float32), labels,
                    )
                ).astype(jnp.float32)
                distill = jnp.mean(
                    jnp.square(pred.astype(jnp.float32) - teacher_out)
                )
                loss = distill_alpha * distill + (1.0 - distill_alpha) * loss
                metrics = {
                    "train_loss": loss,
                    "distill_loss": distill,
                    "task_loss": metrics["train_loss"],
                }
        elif model_kind == "deediff_uvit":
            backbone, u, g = apply_fn(
                params, noisy, timesteps.astype(jnp.float32), labels
            )
            parts = deediff_loss(
                backbone,
                u,
                g,
                parametrization=parametrization,
                noise=noise,
                clean=clean,
            )
            loss = total_deediff_loss(parts, use_unweighted_loss)
            metrics = {
                "train_loss": loss,
                "regular_train_loss": parts[0],
                "classifier_train_loss": parts[1],
                "weighted_train_loss": parts[2],
                "unweighted_loss": parts[3],
            }
        else:
            raise ValueError(f"Unknown model kind {model_kind}")
        return loss, metrics

    def train_step(state: TrainState, batch, key, teacher_params=None):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, batch, key, teacher_params)
        new_state = state.apply_gradients(grads)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    # expose the loss assembly for tests of loss-level semantics (label
    # dropout, distillation mixing) without a full grad+optimizer compile
    train_step.loss_fn = loss_fn
    return train_step

"""DDPM noise schedule as pure, precomputed arrays.

The reference defines the identical linear-beta schedule in three places
(ddpm_core.py:64-70, sampler.py:40-44, eesampler.py:33-37); here it is one
frozen pytree of ``jnp`` arrays closed over by jitted functions. All
per-timestep coefficients used by the forward process, ancestral reverse
step, and the three model parametrizations are precomputed once in float32.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """Linear beta schedule, beta in [beta_init, beta_final] over ``steps``.

    Matches reference ddpm_core.py:55-79:
      betas        = linspace(1e-4, 0.02, 1000)
      alphas       = 1 - betas
      alphas_bar   = cumprod(alphas)
      alpha_bar_prev = [1.0, alphas_bar[:-1]]
      betas_tilde  = (1 - alpha_bar_prev) / (1 - alphas_bar) * betas
    """

    betas: jax.Array
    alphas: jax.Array
    alphas_bar: jax.Array
    alphas_bar_prev: jax.Array
    betas_tilde: jax.Array

    @classmethod
    def create(
        cls,
        beta_init: float = 1e-4,
        beta_final: float = 0.02,
        steps: int = 1000,
        dtype=jnp.float32,
    ) -> "NoiseSchedule":
        betas = jnp.linspace(beta_init, beta_final, steps, dtype=dtype)
        alphas = 1.0 - betas
        alphas_bar = jnp.cumprod(alphas)
        alphas_bar_prev = jnp.concatenate([jnp.ones((1,), dtype=dtype), alphas_bar[:-1]])
        betas_tilde = (1.0 - alphas_bar_prev) / (1.0 - alphas_bar) * betas
        return cls(
            betas=betas,
            alphas=alphas,
            alphas_bar=alphas_bar,
            alphas_bar_prev=alphas_bar_prev,
            betas_tilde=betas_tilde,
        )

    @property
    def steps(self) -> int:
        return self.betas.shape[0]

    def sigma_squared(self, variance_mode: str = "beta") -> jax.Array:
        """Reverse-process variance (reference ddpm_core.py:72-79)."""
        if variance_mode == "beta":
            return self.betas
        elif variance_mode == "beta_tilde":
            return self.betas_tilde
        raise ValueError("Invalid variance mode. Choose 'beta' or 'beta_tilde'.")

    def add_noise(self, key: jax.Array, x0: jax.Array, timesteps: jax.Array):
        """Forward process q(x_t | x_0) (reference ddpm_core.py:81-104).

        Args:
          key: PRNG key for the noise draw.
          x0: clean batch, shape (B, ...).
          timesteps: int array (B,).
        Returns:
          (noise, noisy_x), both shaped like x0.
        """
        alpha_bar_t = _bcast(self.alphas_bar[timesteps], x0.ndim)
        noise = jax.random.normal(key, x0.shape, dtype=x0.dtype)
        noisy_x = jnp.sqrt(alpha_bar_t) * x0 + jnp.sqrt(1.0 - alpha_bar_t) * noise
        return noise, noisy_x

    # ------------------------------------------------------------------
    # Reverse-step posteriors for the three parametrizations
    # (reference sampler.py:47-79). ``t`` is a scalar (traced) timestep; the
    # caller supplies z ~ N(0, I) (z must be 0 at t == 0).
    # ------------------------------------------------------------------

    def sigma(self, t, variance_mode: str = "beta_tilde"):
        """Reverse-step noise scale sqrt(sigma^2_t). The CLI samplers use
        beta_tilde (reference sampler.py:50, eesampler.py:76); the in-training
        logging sampler uses beta (reference ddpm_core.py:72-79 default)."""
        return jnp.sqrt(self.sigma_squared(variance_mode)[t])

    def step_predict_noise(self, model_output, x, t, z, variance_mode="beta_tilde"):
        """x_{t-1} from predicted epsilon (reference sampler.py:47-56)."""
        alpha_t = self.alphas[t]
        alpha_bar_t = self.alphas_bar[t]
        mean = jnp.sqrt(1.0 / alpha_t) * (
            x - (1.0 - alpha_t) / jnp.sqrt(1.0 - alpha_bar_t) * model_output
        )
        return mean + self.sigma(t, variance_mode) * z

    def step_predict_original(self, model_output, x, t, z, variance_mode="beta_tilde"):
        """x_{t-1} from predicted x_0 via the closed-form posterior mean
        (reference sampler.py:59-72)."""
        alpha_t = self.alphas[t]
        alpha_bar_t = self.alphas_bar[t]
        alpha_bar_prev = self.alphas_bar_prev[t]
        beta_t = self.betas[t]
        mean = (
            jnp.sqrt(alpha_bar_prev) * beta_t * model_output / (1.0 - alpha_bar_t)
            + jnp.sqrt(alpha_t) * (1.0 - alpha_bar_prev) * x / (1.0 - alpha_bar_t)
        )
        return mean + self.sigma(t, variance_mode) * z

    def step_predict_previous(self, model_output, x, t, z, variance_mode="beta_tilde"):
        """x_{t-1} predicted directly (reference sampler.py:75-79)."""
        del x
        return model_output + self.sigma(t, variance_mode) * z

    def step(self, parametrization: str, model_output, x, t, z,
             variance_mode: str = "beta_tilde"):
        if parametrization == "predict_noise":
            return self.step_predict_noise(model_output, x, t, z, variance_mode)
        elif parametrization == "predict_original":
            return self.step_predict_original(model_output, x, t, z, variance_mode)
        elif parametrization == "predict_previous":
            return self.step_predict_previous(model_output, x, t, z, variance_mode)
        raise ValueError(f"Invalid parametrization {parametrization}")

    def ddim_step(self, model_output, x, t, s, z, eta: float = 0.0):
        """One DDIM step t -> s (s < t), reference sampler.py:103-120.

        sigma_t^2 = eta * beta_tilde_t;
        mean = sqrt(abar_s/abar_t) (x - sqrt(1-abar_t) eps) + sqrt(1-abar_s-sigma^2) eps.
        Note: the reference adds ``sigma_t_squared * z`` (sampler.py:120); with
        the default eta=0 that term vanishes. We use the standard
        ``sqrt(sigma_t_squared) * z``.
        """
        abar_t = self.alphas_bar[t]
        abar_s = self.alphas_bar[s]
        sigma_sq = self.betas_tilde[t] * eta
        mean = jnp.sqrt(abar_s / abar_t) * (x - jnp.sqrt(1.0 - abar_t) * model_output)
        mean = mean + jnp.sqrt(jnp.clip(1.0 - abar_s - sigma_sq, 0.0)) * model_output
        return mean + jnp.sqrt(sigma_sq) * z

    def predict_previous_target(self, clean, noisy, timesteps):
        """Posterior-mean regression target for the ``predict_previous``
        parametrization (reference trainer.py:326-352)."""
        clean_coef = _bcast(
            jnp.sqrt(self.alphas_bar_prev[timesteps])
            * self.betas[timesteps]
            / (1.0 - self.alphas_bar[timesteps]),
            clean.ndim,
        )
        noisy_coef = _bcast(
            jnp.sqrt(self.alphas[timesteps])
            * (1.0 - self.alphas_bar_prev[timesteps])
            / (1.0 - self.alphas_bar[timesteps]),
            clean.ndim,
        )
        return clean_coef * clean + noisy_coef * noisy


def _bcast(coeffs: jax.Array, ndim: int) -> jax.Array:
    """Reshape (B,) coefficients to (B, 1, ..., 1) for broadcasting
    (reference ddpm_core.py:296-308)."""
    return coeffs.reshape(coeffs.shape[0], *((1,) * (ndim - 1)))

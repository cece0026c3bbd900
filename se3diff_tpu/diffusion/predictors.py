"""Euler–Maruyama predictor steps for Euclidean and SO(3) channels.

Functional counterpart of the reference `EulerMaruyamaPredictor`
(`bioemu/src/bioemu/denoiser.py:30-166`). Each helper is a pure function of
``(sde, x, t, ...)`` so it can live inside ``jax.lax.scan``; the SO(3) update
composes rotation-vector increments on the manifold while the Euclidean
update is additive.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from se3diff_tpu.ops import so3 as so3_ops
from se3diff_tpu.sde.base import SDE
from se3diff_tpu.sde.so3_sde import SO3SDE


@dataclass(frozen=True)
class EulerMaruyamaPredictor:
    """Reverse-SDE integrator step (denoiser.py:30-131).

    Attributes:
        corruption: The forward SDE being reversed.
        noise_weight: 1.0 = Euler–Maruyama, 0.0 = probability-flow ODE.
        marginal_concentration_factor: Samples from ``p(x)^MCF``.
    """

    corruption: SDE
    noise_weight: float = 1.0
    marginal_concentration_factor: float = 1.0

    @property
    def _is_so3(self) -> bool:
        return isinstance(self.corruption, SO3SDE)

    def reverse_drift_and_diffusion(
        self,
        x: jax.Array,
        t: jax.Array,
        score: jax.Array,
        finetune_score: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        """``f - g^2 score w  (+ g u w)`` with ``w = MCF (1 + nw^2)/2``."""
        score_weight = (
            0.5 * self.marginal_concentration_factor * (1 + self.noise_weight**2)
        )
        drift, diffusion = self.corruption.sde(x=x, t=t)
        drift = drift - diffusion**2 * score * score_weight
        if finetune_score is not None:
            drift = drift + diffusion * finetune_score * score_weight
        return drift, diffusion

    def update_given_drift_and_diffusion(
        self,
        key: jax.Array,
        x: jax.Array,
        dt: jax.Array,
        drift: jax.Array,
        diffusion: jax.Array | float,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """One integrator step; returns ``(sample, mean, dW)``.

        SO(3): ``mean = x exp(drift dt)``, ``sample = mean exp(g dW)``
        (denoiser.py:72-97). Euclidean: additive.
        """
        z = jax.random.normal(key, drift.shape, drift.dtype)
        dW = self.noise_weight * jnp.sqrt(jnp.abs(dt)) * z

        if self._is_so3:
            tol = self.corruption.tol  # type: ignore[union-attr]
            mean = so3_ops.apply_rotvec_to_rotmat(x, drift * dt, tol=tol)
            sample = so3_ops.apply_rotvec_to_rotmat(mean, diffusion * dW, tol=tol)
        else:
            mean = x + drift * dt
            sample = mean + diffusion * dW
        return sample, mean, dW

    def update_given_score(
        self,
        key: jax.Array,
        x: jax.Array,
        t: jax.Array,
        dt: jax.Array,
        score: jax.Array,
        finetune_score: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        drift, diffusion = self.reverse_drift_and_diffusion(
            x=x, t=t, score=score, finetune_score=finetune_score
        )
        return self.update_given_drift_and_diffusion(
            key=key, x=x, dt=dt, drift=drift, diffusion=diffusion
        )

    def forward_sde_step(
        self, key: jax.Array, x: jax.Array, t: jax.Array, dt: jax.Array
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Forward (noising) step used by Heun's churn phase (denoiser.py:118-131)."""
        drift, diffusion = self.corruption.sde(x=x, t=t)
        return self.update_given_drift_and_diffusion(
            key=key, x=x, dt=dt, drift=drift, diffusion=diffusion
        )

    def mean_update(
        self, x: jax.Array, dt: jax.Array, drift: jax.Array
    ) -> jax.Array:
        """Deterministic (diffusion=0) step, returning the mean only."""
        if self._is_so3:
            tol = self.corruption.tol  # type: ignore[union-attr]
            return so3_ops.apply_rotvec_to_rotmat(x, drift * dt, tol=tol)
        return x + drift * dt

    def traceback_brownian_motion(
        self,
        x_next: jax.Array,
        x: jax.Array,
        t: jax.Array,
        dt: jax.Array,
        score: jax.Array,
        finetune_score: jax.Array | None = None,
    ) -> jax.Array:
        """Recover the Brownian increment that maps ``x -> x_next``.

        Needed by the Heun finetune path where the integrator update is not a
        plain EM step (denoiser.py:133-166).
        """
        drift, diffusion = self.reverse_drift_and_diffusion(
            x=x, t=t, score=score, finetune_score=finetune_score
        )
        mean = self.mean_update(x=x, dt=dt, drift=drift)
        if self._is_so3:
            rel = jnp.einsum("...ji,...jk->...ik", mean, x_next)
            return so3_ops.rotmat_to_rotvec(rel) / diffusion
        return (x_next - mean) / diffusion

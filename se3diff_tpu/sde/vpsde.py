"""Variance-preserving SDEs for the translation channel.

TPU-native counterpart of `bioemu/src/bioemu/sde_lib.py:105-167`:
``dx = -1/2 beta(t) x dt + sqrt(beta(t)) dW`` with the cosine schedule
``alpha(t) = cos((t+s)/(1+s) * pi/2) / cos(s/(1+s) * pi/2)``, ``s = 0.008``.
"""

from __future__ import annotations

import abc

import jax
import jax.numpy as jnp
import numpy as np

from se3diff_tpu.sde.base import SDE, bcast_right


class BaseVPSDE(SDE):
    """dx = -1/2 beta_t x dt + sqrt(beta_t) dW."""

    @abc.abstractmethod
    def beta(self, t: jax.Array) -> jax.Array: ...

    @abc.abstractmethod
    def _marginal_mean_coeff(self, t: jax.Array) -> jax.Array:
        """exp(-1/2 int_0^t beta(s) ds); eq. (29) of Song et al."""

    def marginal_prob(self, x: jax.Array, t: jax.Array) -> tuple[jax.Array, jax.Array]:
        mean_coeff = bcast_right(self._marginal_mean_coeff(t), x)
        mean = mean_coeff * x
        std = jnp.sqrt(1.0 - jnp.square(mean_coeff)) * jnp.ones_like(x)
        return mean, std

    def prior_sampling(self, key: jax.Array, shape: tuple[int, ...]) -> jax.Array:
        return jax.random.normal(key, shape)

    def sde(self, x: jax.Array, t: jax.Array) -> tuple[jax.Array, jax.Array]:
        beta_t = bcast_right(self.beta(t), x)
        drift = -0.5 * beta_t * x
        diffusion = jnp.sqrt(beta_t) * jnp.ones_like(x)
        return drift, diffusion


class CosineVPSDE(BaseVPSDE):
    """VP SDE with the cosine noise schedule (sde_lib.py:153-167)."""

    def __init__(self, s: float = 0.008):
        self.s = s
        # Python float, not np scalar: keeps weak typing under jax x64.
        self.c = float(np.cos(s / (1 + s) * np.pi / 2))

    def beta(self, t: jax.Array) -> jax.Array:
        return jnp.tan((t + self.s) / (1 + self.s) * np.pi / 2) * np.pi / (1 + self.s)

    def _marginal_mean_coeff(self, t: jax.Array) -> jax.Array:
        mean_coeff = jnp.cos((t + self.s) / (1 + self.s) * np.pi / 2) / self.c
        # cos can dip below 0 at t ~ 1 in floating point; clamp to [0, 1].
        return jnp.clip(mean_coeff, 0.0, 1.0)

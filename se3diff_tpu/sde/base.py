"""Abstract SDE interface for the corruption processes.

TPU-native counterpart of the reference `bioemu/src/bioemu/sde_lib.py:50-102`.
Differences by design:

* No sparse ``batch_idx`` machinery — batches are dense ``[B, L, ...]``
  arrays from the start (SURVEY.md section 7), so per-graph scalars broadcast
  with ordinary numpy-style rules.
* Sampling takes explicit ``jax.random`` keys instead of global RNG state so
  whole denoising loops can live inside ``jax.lax.scan``.
"""

from __future__ import annotations

import abc

import jax
import jax.numpy as jnp


def bcast_right(x: jax.Array, like: jax.Array) -> jax.Array:
    """Append singleton axes to ``x`` so it broadcasts against ``like``.

    Equivalent of the reference `_broadcast_like` (sde_lib.py:18-23).
    """
    if x.ndim > like.ndim:
        raise ValueError(f"cannot broadcast {x.shape} to {like.shape}")
    return x.reshape(x.shape + (1,) * (like.ndim - x.ndim))


class SDE(abc.ABC):
    """Corruption process defined by an SDE ``dx = f dt + g dW``."""

    @property
    def T(self) -> float:
        return 1.0

    @abc.abstractmethod
    def sde(self, x: jax.Array, t: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Drift ``f`` and diffusion coefficient ``g`` at ``(x, t)``.

        ``t`` has the batch shape; outputs broadcast against ``x``.
        """

    @abc.abstractmethod
    def marginal_prob(self, x: jax.Array, t: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Mean and standard deviation of the marginal ``p_t(x(t) | x(0)=x)``."""

    def mean_coeff_and_std(self, x: jax.Array, t: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Marginal mean coefficient and std, both broadcast like ``x``."""
        return self.marginal_prob(jnp.ones_like(x), t)

    @abc.abstractmethod
    def prior_sampling(self, key: jax.Array, shape: tuple[int, ...]) -> jax.Array:
        """Sample from the ``t=T`` prior."""

    def sample_marginal(self, key: jax.Array, x: jax.Array, t: jax.Array) -> jax.Array:
        """Sample ``x(t) ~ p_t(. | x(0)=x)`` (Euclidean default: mean + std*z)."""
        mean, std = self.marginal_prob(x=x, t=t)
        z = jax.random.normal(key, x.shape, x.dtype)
        return mean + std * z

"""IGSO(3) series-expansion densities as vectorized JAX ops.

Functional equivalents of the reference series expansions
(`bioemu/src/bioemu/so3_sde.py:1731-1940`), re-derived from the heat kernel
on SO(3). The isotropic Gaussian on SO(3) at scale ``sigma`` has angle
density (up to the Haar prefactor)

    f(omega; sigma) = sum_l w_l(sigma) * chi_l(omega),

where ``w_l = (2l+1) exp(-l(l+1) sigma^2 / 2)`` are the heat-kernel weights
and ``chi_l(omega) = sin((l+1/2) omega) / sin(omega/2)`` is the character of
the irrep of order ``l`` (a Dirichlet-type kernel). This matches Brownian
motion on SO(3) at t = sigma^2 (Yim et al. 2023, eq. 5).

All functions broadcast ``omega`` and ``sigma`` against each other and
reduce over the trailing ``orders`` axis, so a single call evaluates
arbitrary batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "igso3_expansion",
    "igso3_marginal_pdf",
    "digso3_expansion",
    "dlog_igso3_expansion",
    "uniform_so3_density",
]


def _finite_or_zero(x: jax.Array) -> jax.Array:
    """Zero out inf/nan artifacts of the truncated series."""
    return jnp.where(jnp.isfinite(x), x, 0.0)


def _heat_weights(sigma: jax.Array, orders: jax.Array) -> jax.Array:
    """Heat-kernel coefficients exp(-l(l+1) sigma^2 / 2), one per order.

    ``sigma`` gains a trailing broadcast axis against the 1D ``orders`` grid.
    """
    eigenvalue = -orders * (orders + 1.0)
    return jnp.exp(0.5 * eigenvalue * jnp.square(sigma[..., None]))


def igso3_expansion(
    omega: jax.Array, sigma: jax.Array, orders: jax.Array, tol: float = 1e-7
) -> jax.Array:
    """Truncated IGSO(3) angle density (without the uniform-SO(3) prefactor).

    Args:
        omega: Angles in [0, pi]; any shape broadcastable with ``sigma``.
        sigma: IGSO(3) std devs, broadcastable with ``omega``.
        orders: 1D grid of expansion orders 0..l_max.
        tol: Stability offset; for ``omega <= tol`` the analytic small-angle
            limit ``sum_l (2l+1)^2 w_l`` is used (chi_l(0) = 2l+1).

    Returns:
        Density values with the broadcast shape of ``omega``/``sigma``.

    Reference behavior: so3_sde.py:1731-1792.
    """
    omega, sigma = jnp.broadcast_arrays(omega, sigma)
    multiplicity = 2.0 * orders + 1.0
    weighted = multiplicity * _heat_weights(sigma, orders)

    # chi_l(omega) split into the shared denominator sin(omega/2) (positive
    # on [0, pi], so a +tol offset is safe) and the per-order numerator.
    series = jnp.sum(weighted * jnp.sin((orders + 0.5) * omega[..., None]), axis=-1)
    density = series / (jnp.sin(0.5 * omega) + tol)

    at_zero = jnp.sum(weighted * multiplicity, axis=-1)
    density = jnp.where(omega <= tol, at_zero, density)
    return jnp.clip(_finite_or_zero(density), min=0.0)


def igso3_marginal_pdf(
    omega: jax.Array,
    omega_0: jax.Array,
    sigma: jax.Array,
    orders: jax.Array,
    tol: float = 1e-7,
) -> jax.Array:
    """Marginal pdf of the angle between an IGSO(3) sample and a fixed rotation.

    ``omega_0`` is the angle of the reference rotation relative to the
    distribution mean. By the product formula for characters, the series has
    one sine factor per angle; the sin(omega/2) from the Haar volume element
    survives in the numerator while sin(omega_0/2) divides out. Used by the
    toy mixture model for analytic reference curves (reference behavior:
    so3_sde.py:1795-1854).
    """
    omega, omega_0, sigma = jnp.broadcast_arrays(omega, omega_0, sigma)
    weights = _heat_weights(sigma, orders)
    half_angles = (orders + 0.5) * omega[..., None]

    series = jnp.sum(weights * jnp.sin(half_angles) * jnp.sin((orders + 0.5) * omega_0[..., None]), axis=-1)
    pdf = series * jnp.sin(0.5 * omega) / (jnp.sin(0.5 * omega_0) + tol)

    # omega_0 -> 0: the reference-rotation character ratio tends to 2l+1.
    at_zero = jnp.sum(weights * (2.0 * orders + 1.0) * jnp.sin(half_angles), axis=-1)
    pdf = jnp.where(omega_0 <= tol, at_zero * jnp.sin(0.5 * omega), pdf)
    return jnp.clip(_finite_or_zero(pdf) * (2.0 / np.pi), min=0.0)


def digso3_expansion(
    omega: jax.Array, sigma: jax.Array, orders: jax.Array, tol: float = 1e-7
) -> jax.Array:
    """Analytic d/d(omega) of :func:`igso3_expansion`.

    The character derivative has the closed form

        chi_l'(omega) = [ l sin((l+1) omega) - (l+1) sin(l omega) ]
                        / (1 - cos omega),

    avoiding a second autodiff pass (reference behavior: so3_sde.py:1857-1913).
    """
    omega, sigma = jnp.broadcast_arrays(omega, sigma)
    weighted = (2.0 * orders + 1.0) * _heat_weights(sigma, orders)

    w = omega[..., None]
    char_grad = orders * jnp.sin((orders + 1.0) * w) - (orders + 1.0) * jnp.sin(orders * w)
    slope = jnp.sum(weighted * char_grad, axis=-1) / (1.0 - jnp.cos(omega) + tol)

    # chi_l' is odd in omega, so the derivative vanishes at the origin.
    slope = jnp.where(omega <= tol, 0.0, slope)
    return _finite_or_zero(slope)


def dlog_igso3_expansion(
    omega: jax.Array, sigma: jax.Array, orders: jax.Array, tol: float = 1e-7
) -> jax.Array:
    """d/d(omega) log f(omega) = f'(omega) / f(omega); the SO(3) score radial part."""
    density = igso3_expansion(omega, sigma, orders, tol=tol)
    slope = digso3_expansion(omega, sigma, orders, tol=tol)
    return slope / (density + tol)


def uniform_so3_density(omega: jax.Array) -> jax.Array:
    """Angle density of the Haar-uniform SO(3) distribution, (1 - cos w) / pi."""
    return (1.0 - jnp.cos(omega)) / np.pi

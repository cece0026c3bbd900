"""IGSO(3) series-expansion densities as vectorized JAX ops.

Functional equivalents of the reference series expansions
(`bioemu/src/bioemu/so3_sde.py:1731-1940`), re-derived as pure jnp functions.
The truncated expansion of the isotropic Gaussian on SO(3) is

    f(omega; sigma) = sum_l (2l+1) exp(-l(l+1) sigma^2 / 2)
                      * sin((l + 1/2) omega) / sin(omega / 2)

which matches Brownian motion on SO(3) at t = sigma^2. All functions
broadcast ``omega`` and ``sigma`` against each other and reduce over the
trailing ``l_grid`` axis, so a single call evaluates arbitrary batches.
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


def _scrub(x: jax.Array) -> jax.Array:
    """Replace inf/nan artifacts of the truncated series with zeros."""
    return jnp.where(jnp.isfinite(x), x, jnp.zeros_like(x))


def igso3_expansion(
    omega: jax.Array, sigma: jax.Array, l_grid: jax.Array, tol: float = 1e-7
) -> jax.Array:
    """Truncated IGSO(3) angle density (without the uniform-SO(3) prefactor).

    Args:
        omega: Angles in [0, pi]; any shape broadcastable with ``sigma``.
        sigma: IGSO(3) std devs, broadcastable with ``omega``.
        l_grid: 1D grid of expansion orders 0..l_max.
        tol: Stability offset; for ``omega <= tol`` the analytic small-angle
            limit ``sum_l (2l+1)^2 exp(...)`` is used.

    Returns:
        Density values with the broadcast shape of ``omega``/``sigma``.

    Reference behavior: so3_sde.py:1731-1792.
    """
    omega, sigma = jnp.broadcast_arrays(omega, sigma)
    denom_sin = jnp.sin(0.5 * omega)

    l_fac_1 = 2.0 * l_grid + 1.0
    l_fac_2 = -l_grid * (l_grid + 1.0)

    numerator_sin = jnp.sin((l_grid + 0.5) * omega[..., None])
    exponential_term = l_fac_1 * jnp.exp(l_fac_2 * jnp.square(sigma[..., None]) / 2.0)

    f_igso = jnp.sum(exponential_term * numerator_sin, axis=-1)
    # lim[x->0] sin((l+1/2)x) / sin(x/2) = 2l + 1
    f_limw = jnp.sum(exponential_term * l_fac_1, axis=-1)

    f_igso = f_igso / (denom_sin + tol)
    f_igso = jnp.where(omega <= tol, f_limw, f_igso)
    return jnp.clip(_scrub(f_igso), min=0.0)


def igso3_marginal_pdf(
    omega: jax.Array,
    omega_0: jax.Array,
    sigma: jax.Array,
    l_grid: jax.Array,
    tol: float = 1e-7,
) -> jax.Array:
    """Marginal pdf of the angle between an IGSO(3) sample and a fixed rotation.

    ``omega_0`` is the angle of the reference rotation relative to the
    distribution mean. Used by the toy mixture model for analytic reference
    curves (reference behavior: so3_sde.py:1795-1854).
    """
    omega, omega_0, sigma = jnp.broadcast_arrays(omega, omega_0, sigma)
    denom_sin_0 = jnp.sin(0.5 * omega_0)
    denom_sin = jnp.sin(0.5 * omega)

    l_fac_1 = 2.0 * l_grid + 1.0
    l_fac_2 = -l_grid * (l_grid + 1.0)

    numerator_sin_0 = jnp.sin((l_grid + 0.5) * omega_0[..., None])
    numerator_sin = jnp.sin((l_grid + 0.5) * omega[..., None])
    exponential_term = jnp.exp(l_fac_2 * jnp.square(sigma[..., None]) / 2.0)

    f_igso = jnp.sum(exponential_term * numerator_sin * numerator_sin_0, axis=-1)
    f_igso = f_igso * denom_sin / (denom_sin_0 + tol)

    # Small omega_0 limit: sin((l+1/2)w0)/sin(w0/2) -> 2l+1.
    f_limw = jnp.sum(exponential_term * l_fac_1 * numerator_sin, axis=-1)
    f_limw = f_limw * denom_sin

    f_igso = jnp.where(omega_0 <= tol, f_limw, f_igso)
    f_igso = _scrub(f_igso) * 2.0 / np.pi
    return jnp.clip(f_igso, min=0.0)


def digso3_expansion(
    omega: jax.Array, sigma: jax.Array, l_grid: jax.Array, tol: float = 1e-7
) -> jax.Array:
    """Analytic d/d(omega) of :func:`igso3_expansion`.

    Uses the closed-form derivative of the sine ratio,

        d/dw [ sin((l+1/2)w) / sin(w/2) ]
            = [ l sin((l+1)w) - (l+1) sin(l w) ] / (1 - cos w),

    avoiding a second autodiff pass (reference behavior: so3_sde.py:1857-1913).
    """
    omega, sigma = jnp.broadcast_arrays(omega, sigma)
    denom_cos = 1.0 - jnp.cos(omega)

    l_fac_1 = 2.0 * l_grid + 1.0
    l_fac_2 = l_grid + 1.0
    l_fac_3 = -l_grid * l_fac_2

    numerator_sin = l_grid * jnp.sin(l_fac_2 * omega[..., None]) - l_fac_2 * jnp.sin(
        l_grid * omega[..., None]
    )
    df_igso = jnp.sum(
        l_fac_1 * jnp.exp(l_fac_3 * jnp.square(sigma[..., None]) / 2.0) * numerator_sin,
        axis=-1,
    )
    df_igso = df_igso / (denom_cos + tol)
    df_igso = jnp.where(omega <= tol, jnp.zeros_like(df_igso), df_igso)
    return _scrub(df_igso)


def dlog_igso3_expansion(
    omega: jax.Array, sigma: jax.Array, l_grid: jax.Array, tol: float = 1e-7
) -> jax.Array:
    """d/d(omega) log f(omega) = f'(omega) / f(omega); the SO(3) score radial part."""
    f_igso3 = igso3_expansion(omega, sigma, l_grid, tol=tol)
    df_igso3 = digso3_expansion(omega, sigma, l_grid, tol=tol)
    return df_igso3 / (f_igso3 + tol)


def uniform_so3_density(omega: jax.Array) -> jax.Array:
    """Angle density of the Haar-uniform SO(3) distribution, (1 - cos w) / pi."""
    return (1.0 - jnp.cos(omega)) / np.pi

"""Riemannian stochastic integrals for PPFT fine-tuning.

Functional counterparts of `bioemu/src/bioemu/ppft.py:4-78`. All take stacked
paths ``[T, B, ...D]`` (time-major, matching the scan-recorded
``DenoisedSDEPath``) and reduce over time and the trailing feature axes,
returning per-sample ``[B]`` (or ``[B, ...]`` for extra batch axes).

Note the sign convention: the paths are recorded in *reverse* time (t: 1->0),
so the integrals are evaluated against ``-dW`` / ``-dt`` exactly as the
reference does (ppft.py:57-61, 76-78).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def riemannian_ito_integral(fs: jax.Array, dWs: jax.Array) -> jax.Array:
    """``einsum('tb...i,tb...i->b...')`` (ppft.py:4-13).

    ``fs, dWs: [T, B, ..., D]`` -> ``[B, ...]``: reduces time and the trailing
    coordinate axis, keeping intermediate batch axes (e.g. residues).
    """
    return jnp.sum(fs * dWs, axis=(0, -1))


def riemannian_quadratic_covariation(
    fs: jax.Array, gs: jax.Array, dts: jax.Array
) -> jax.Array:
    """``einsum('tb...i,tb...i,t->b...')`` (ppft.py:16-28). ``dts: [T]``."""
    dts = dts.reshape((-1,) + (1,) * (fs.ndim - 1))
    return jnp.sum(fs * gs * dts, axis=(0, -1))


def rloo_baseline(fs: jax.Array) -> jax.Array:
    """Leave-one-out baseline over the batch axis (ppft.py:31-42)."""
    B = fs.shape[0]
    return (jnp.sum(fs, axis=0, keepdims=True) - fs) / (B - 1)


def compute_ws(*, us: jax.Array, dWs: jax.Array, dts: jax.Array) -> jax.Array:
    """Importance weights ``w = exp(int <u - sg(u), -dW> - 1/2 int |u - sg(u)|^2 dt)``.

    Equals 1 in value; its gradient is the pathwise derivative of the measure
    change (ppft.py:45-62).
    """
    diff = us - jax.lax.stop_gradient(us)
    int_diff_dw = riemannian_ito_integral(diff, -dWs)
    int_diff_diff_dt = riemannian_quadratic_covariation(diff, diff, -dts)
    return jnp.exp(int_diff_dw - int_diff_diff_dt / 2.0)


def compute_int_dws(*, us: jax.Array, dWs: jax.Array) -> jax.Array:
    """Linearized importance weight ``int <u, -dW>``: grad(int_dws) = grad(w)
    (ppft.py:65-78)."""
    return riemannian_ito_integral(us, -dWs)


def compute_int_u_u_dt(*, us: jax.Array, dts: jax.Array) -> jax.Array:
    """``int |u|^2 (-dt)`` — reverse-time quadratic variation (ppft.py:140-149)."""
    return riemannian_quadratic_covariation(us, us, -dts)

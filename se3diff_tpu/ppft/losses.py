"""PPFT expected-value and KL losses.

Functional counterparts of `bioemu/src/bioemu/ppft.py:81-194` (minus the
reference's stray debug print at ppft.py:106). Both support the
``from_int_dws`` linearization where the gradient of the importance weight
``w`` is estimated via ``int <u, -dW>``.

Keyword names (``ws``, ``hs``, ``h_stars``, ...) match the reference API so
configs and call sites translate one-to-one.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from se3diff_tpu.ppft.integrals import rloo_baseline


def _stability_weights(hs: jax.Array, tol: float) -> jax.Array:
    """Per-observable reweighting ~ 1/mean(h), normalized to unit mean.

    Observables with small batch-mean probability would otherwise contribute
    vanishing gradient signal relative to near-saturated ones.
    """
    batch_mean = jnp.mean(hs, axis=0)  # [K]
    inverse = jnp.sum(batch_mean) / (batch_mean + tol)
    return inverse / jnp.mean(inverse)


def compute_ev_loss(
    *,
    ws: jax.Array,
    hs: jax.Array,
    h_stars: jax.Array,
    from_int_dws: bool = True,
    use_stab: bool = True,
    tol: float = 1e-7,
) -> jax.Array:
    """Unbiased U-statistic estimator of ``(E[h] - h*)^2`` (ppft.py:81-137).

    Args:
        ws: ``[B]`` importance weights (or linearized ``int_dws``).
        hs: ``[B, K]`` sampled observable values.
        h_stars: ``[K]`` or ``[B, K]`` target expectations.
        from_int_dws: Estimate the weight-product gradient from the
            linearized weights: over ordered pairs ``i != j`` the U-statistic
            kernel becomes ``(w_i + w_j) r_i r_j``, which reduces to
            ``2 [ (w.r)(1.r) - w.r^2 ]`` per observable, so ``grad(loss)``
            matches the full estimator at first order.
        use_stab: Per-observable stability reweighting by 1/mean(h).
    """
    n = ws.shape[0]
    residual = hs - h_stars  # [B, K]

    if use_stab and n > 1:  # needs >1 degree of freedom
        scale = _stability_weights(hs, tol)
    else:
        scale = jnp.asarray(1.0, ws.dtype)

    if from_int_dws:
        first = jnp.einsum("b,bk->k", ws, residual)
        plain = jnp.sum(residual, axis=0)
        diagonal = jnp.einsum("b,bk->k", ws, jnp.square(residual))
        per_observable = 2.0 * (first * plain - diagonal)
    else:
        weighted = ws[:, None] * residual  # [B, K]
        per_observable = jnp.square(jnp.sum(weighted, axis=0)) - jnp.sum(
            jnp.square(weighted), axis=0
        )
    # Off-diagonal pair count normalizes the U-statistic.
    return jnp.sum(per_observable * scale) / (n * (n - 1))


def compute_kl_loss(
    *,
    ws: jax.Array,
    int_u_u_dt: jax.Array,
    int_u_u_dt_sg: jax.Array,
    from_int_dws: bool = True,
    use_rloo: bool = True,
) -> jax.Array:
    """KL control cost ``1/2 E[w int |u|^2 dt]`` with stop-gradient split.

    ``int_u_u_dt_sg`` is the *full-path* integral under stop-gradient (NOT
    ``int_u_u_dt.detach()``: the latter may cover only a time chunk when
    gradients are accumulated chunkwise), see ppft.py:152-194. RLOO reduces
    the variance of the score-function term.
    """
    if use_rloo:
        centered = int_u_u_dt - rloo_baseline(jax.lax.stop_gradient(int_u_u_dt))
        centered_sg = int_u_u_dt_sg - rloo_baseline(int_u_u_dt_sg)
    else:
        centered, centered_sg = int_u_u_dt, int_u_u_dt_sg

    if from_int_dws:
        objective = centered + centered_sg * ws
    else:
        # Not applicable when integrals are chunked in time; used for
        # validation with ws = 1.
        objective = centered * ws
    return 0.5 * jnp.mean(objective)

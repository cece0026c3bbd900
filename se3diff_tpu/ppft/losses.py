"""PPFT expected-value and KL losses.

Functional counterparts of `bioemu/src/bioemu/ppft.py:81-194` (minus the
reference's stray debug print at ppft.py:106). Both support the
``from_int_dws`` linearization where the gradient of the importance weight
``w`` is estimated via ``int <u, -dW>``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from se3diff_tpu.ppft.integrals import rloo_baseline


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
        from_int_dws: Use the ``2(s1 s2 - s3)`` identity for the linearized
            weights so that ``grad(loss)`` matches the full estimator.
        use_stab: Per-observable stability reweighting by 1/mean(h).
    """
    B = ws.shape[0]
    ws_ = ws[:, None]  # [B, 1]
    dhs = hs - h_stars  # [B, K]

    if use_stab and B > 1:
        pbar = jnp.mean(hs, axis=0)  # [K]
        stab = jnp.sum(pbar, axis=0) / (pbar + tol)
        stab = stab / jnp.mean(stab)
    else:
        stab = jnp.asarray(1.0, ws.dtype)

    if from_int_dws:
        s_1 = jnp.sum(ws_ * dhs, axis=0)  # [K]
        s_2 = jnp.sum(dhs, axis=0)  # [K]
        s_3 = jnp.sum(ws_ * dhs**2, axis=0)  # [K]
        # 2(s1 s2 - s3) = sum_{i != j} (w_i + w_j) h_i h_j
        loss_ev = 2.0 * (s_1 * s_2 - s_3) * stab / (B * (B - 1))
    else:
        w_dhs = ws_ * dhs
        loss_ev = (
            (jnp.sum(w_dhs, axis=0) ** 2 - jnp.sum(w_dhs**2, axis=0))
            * stab
            / (B * (B - 1))
        )
    return jnp.sum(loss_ev)


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
        baseline = rloo_baseline(jax.lax.stop_gradient(int_u_u_dt))
        baseline_sg = rloo_baseline(int_u_u_dt_sg)
    else:
        baseline = jnp.zeros_like(int_u_u_dt)
        baseline_sg = jnp.zeros_like(int_u_u_dt_sg)

    if from_int_dws:
        w_int = int_u_u_dt - baseline + (int_u_u_dt_sg - baseline_sg) * ws
    else:
        # Not applicable when integrals are chunked in time; used for
        # validation with ws = 1.
        w_int = (int_u_u_dt - baseline) * ws
    return jnp.mean(w_int) / 2.0

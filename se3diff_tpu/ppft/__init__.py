from se3diff_tpu.ppft.integrals import (
    compute_int_dws,
    compute_int_u_u_dt,
    compute_ws,
    riemannian_ito_integral,
    riemannian_quadratic_covariation,
    rloo_baseline,
)
from se3diff_tpu.ppft.losses import compute_ev_loss, compute_kl_loss

__all__ = [
    "compute_int_dws",
    "compute_int_u_u_dt",
    "compute_ws",
    "riemannian_ito_integral",
    "riemannian_quadratic_covariation",
    "rloo_baseline",
    "compute_ev_loss",
    "compute_kl_loss",
]

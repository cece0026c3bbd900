"""Reverse-diffusion samplers (single-scan) and predictors.

`denoise.parallel_picard_em` is deliberately NOT re-exported: on one chip
it loses 8-46x to the sequential scan at every sweep count (v5e, B=1,
L=100, em-200 — docs/PERF.md "Round-4 Picard verdict"). It stays
importable from `denoise` (terminal-law tests keep it honest) for the
multi-chip time-sharded regime where it could pay off.
"""

from se3diff_tpu.diffusion.denoise import (
    SDEs,
    DenoisedSDEPath,
    dpm_solver,
    euler_maruyama,
    euler_maruyama_finetune,
    get_score,
    heun,
    heun_finetune,
    sde_dpm_solver_finetune,
)
from se3diff_tpu.diffusion.predictors import EulerMaruyamaPredictor

__all__ = [
    "SDEs",
    "DenoisedSDEPath",
    "EulerMaruyamaPredictor",
    "dpm_solver",
    "euler_maruyama",
    "euler_maruyama_finetune",
    "get_score",
    "heun",
    "heun_finetune",
    "sde_dpm_solver_finetune",
]

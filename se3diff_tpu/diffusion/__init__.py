"""Reverse-diffusion samplers (single-scan) and predictors."""

from se3diff_tpu.diffusion.denoise import (
    SDEs,
    DenoisedSDEPath,
    dpm_solver,
    euler_maruyama,
    euler_maruyama_finetune,
    get_score,
    heun,
    heun_finetune,
    parallel_picard_em,
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
    "parallel_picard_em",
    "sde_dpm_solver_finetune",
]

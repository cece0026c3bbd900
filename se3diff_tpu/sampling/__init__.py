"""Sampling pipeline: bundles, embeddings, orchestration."""

from se3diff_tpu.sampling.bundle import (
    Bundle,
    load_bundle,
    make_denoiser,
    maybe_download_checkpoint,
    random_bundle,
)
from se3diff_tpu.sampling.pipeline import (
    batch_size_heuristic,
    generate_batch,
    sample,
    stage_conditioning,
    write_structure_outputs,
)

__all__ = [
    "Bundle",
    "load_bundle",
    "make_denoiser",
    "maybe_download_checkpoint",
    "random_bundle",
    "batch_size_heuristic",
    "generate_batch",
    "sample",
    "stage_conditioning",
    "write_structure_outputs",
]

"""Device-mesh parallelism: DP sampling, TP/DP training shardings.

New capability relative to the reference, which is single-process/single-GPU
(SURVEY.md section 2.10): here scaling is expressed through
``jax.sharding.Mesh`` + NamedSharding under ``jax.jit``; XLA inserts the
ICI collectives (all-reduce for gradient sync, all-gather/reduce-scatter for
tensor parallelism).
"""

from se3diff_tpu.parallel.mesh import make_mesh
from se3diff_tpu.parallel.pipeline import make_pp_score_fn, stack_layer_params
from se3diff_tpu.parallel.sharding import (
    batch_sharding,
    dig_tp_param_specs,
    replicated,
    shard_params,
)

__all__ = [
    "make_mesh",
    "make_pp_score_fn",
    "stack_layer_params",
    "batch_sharding",
    "dig_tp_param_specs",
    "replicated",
    "shard_params",
]

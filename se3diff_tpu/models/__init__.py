from se3diff_tpu.models.convert import (
    flax_to_torch_state_dict,
    load_torch_checkpoint,
    torch_state_dict_to_flax,
)
from se3diff_tpu.models.dig import (
    DiGConditionalScoreModel,
    DistributionalGraphormer,
    SAAttention,
    StructureModule,
    count_params,
)

__all__ = [
    "DiGConditionalScoreModel",
    "DistributionalGraphormer",
    "SAAttention",
    "StructureModule",
    "count_params",
    "flax_to_torch_state_dict",
    "load_torch_checkpoint",
    "torch_state_dict_to_flax",
]

"""Device mesh + sharding layer (greenfield — the reference has no distributed
execution at all, SURVEY.md §2.4; scale-out here is dp × tp over ICI via
jax.sharding + jit, plus GPipe-style dp × pp for deep configs in .pipeline)."""

from .pipeline import (
    PipelinePlan,
    make_pipeline_mesh,
    make_pipeline_train_step,
    merge_encoder_params,
    pipeline_forward,
    split_encoder_params,
)
from .multihost import (
    initialize_from_env,
    is_main_process,
    global_mesh,
    local_batch_slice,
)
from .mesh import (
    make_mesh,
    data_sharding,
    replicated,
    param_partition_specs,
    shard_params,
    MeshPlan,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "param_partition_specs",
    "shard_params",
    "MeshPlan",
    "initialize_from_env",
    "is_main_process",
    "global_mesh",
    "local_batch_slice",
    "PipelinePlan",
    "make_pipeline_mesh",
    "make_pipeline_train_step",
    "merge_encoder_params",
    "pipeline_forward",
    "split_encoder_params",
]

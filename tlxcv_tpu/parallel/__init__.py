from . import distributed
from .mesh import (data_parallel_shardings, get_mesh, make_mesh,
                   shard_batch, shard_params)
from .pipeline import pipeline_apply, stack_stage_params

__all__ = ["data_parallel_shardings", "get_mesh", "make_mesh", "shard_batch",
           "shard_params", "pipeline_apply", "stack_stage_params",
           "distributed"]

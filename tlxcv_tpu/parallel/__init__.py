from .mesh import (data_parallel_shardings, get_mesh, make_mesh,
                   shard_batch, shard_params)

__all__ = ["data_parallel_shardings", "get_mesh", "make_mesh", "shard_batch",
           "shard_params"]

from .mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    jit_data_parallel_step,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "jit_data_parallel_step",
]

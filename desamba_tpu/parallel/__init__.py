"""Distributed/mesh layer: data-parallel reads, sharded indexes, collectives.

See SURVEY.md sections 2.2-2.3 for the mapping from the reference's pthread
constructs to these TPU-native equivalents.
"""
from .mesh import (  # noqa: F401
    data_sharded,
    init_distributed,
    make_mesh,
    pad_batch,
    put_batch,
    put_replicated,
    replicated,
)

__all__ = [
    "make_mesh", "init_distributed", "replicated", "data_sharded",
    "put_replicated", "put_batch", "pad_batch",
]

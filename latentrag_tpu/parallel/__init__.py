from .mesh import (
    DATA_AXIS,
    make_mesh,
    replicated,
    row_sharded,
    shard_rows,
)
from .distributed import global_mesh, initialize_distributed
from .checkpoint import load_sharded_index, save_sharded_index
from .ivf import ShardedIVF, build_sharded_ivf, make_sharded_ivf_topk
from .sharded_topk import make_sharded_topk
from .knn import sharded_knn_graph

__all__ = [
    "DATA_AXIS",
    "make_mesh",
    "replicated",
    "row_sharded",
    "shard_rows",
    "make_sharded_topk",
    "ShardedIVF",
    "build_sharded_ivf",
    "make_sharded_ivf_topk",
    "sharded_knn_graph",
    "load_sharded_index",
    "save_sharded_index",
    "global_mesh",
    "initialize_distributed",
]

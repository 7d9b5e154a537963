from plotpointe_tpu.parallel.mesh import make_mesh, parse_mesh_shape
from plotpointe_tpu.parallel.spmd import (
    shard_graph_by_edges,
    sharded_attention,
    make_sharded_train_step,
)

__all__ = [
    "make_mesh",
    "parse_mesh_shape",
    "shard_graph_by_edges",
    "sharded_attention",
    "make_sharded_train_step",
]

from pfann_tpu.parallel.mesh import make_mesh
from pfann_tpu.parallel.sharded_search import ShardedDatabase

__all__ = ["make_mesh", "ShardedDatabase"]

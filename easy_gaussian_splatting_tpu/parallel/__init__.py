"""Multi-chip scaling: device meshes + shard_map'd training steps.

The reference is strictly single-GPU (SURVEY.md §2-bis: no collectives of
any kind); everything here is new TPU-native scope. Parallelism follows the
scaling-book recipe: pick a mesh, annotate shardings, let XLA insert the
collectives over ICI.
"""

from .mesh import make_mesh
from .shard import make_sharded_train_step

__all__ = ["make_mesh", "make_sharded_train_step"]

"""Multi-chip scaling: device meshes + shard_map'd training steps.

The reference is strictly single-GPU (SURVEY.md §2-bis: no collectives of
any kind); everything here is new TPU-native scope. Parallelism follows the
scaling-book recipe: pick a mesh, annotate shardings, let XLA insert the
collectives over ICI.
"""

from .distributed import maybe_initialize_from_env
from .mesh import make_mesh, make_mesh2d
from .shard import make_sharded_train_step

__all__ = [
    "make_mesh",
    "make_mesh2d",
    "make_sharded_train_step",
    "maybe_initialize_from_env",
]

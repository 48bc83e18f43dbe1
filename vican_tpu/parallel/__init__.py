"""Device-mesh parallelism: sharded solver paths over jax.sharding meshes."""

from .mesh import global_mesh, init_distributed, make_mesh  # noqa: F401
from .sharded import se3sync_sharded, so3_sync_sharded  # noqa: F401

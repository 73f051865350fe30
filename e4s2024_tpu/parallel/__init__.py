from e4s2024_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
)
from e4s2024_tpu.parallel.mesh import (  # noqa: F401
    make_mesh_2d,
    shard_batch_spatial,
)

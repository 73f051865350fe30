from e4s2024_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
)

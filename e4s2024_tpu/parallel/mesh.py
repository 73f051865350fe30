"""Device-mesh utilities — the TPU-native replacement for DDP/NCCL.

The reference's only parallelism is data-parallel DDP over NCCL (reference
training/coach.py:38-85, SURVEY.md §2.10). On TPU the same strategy is a 1-D
`jax.sharding.Mesh` over ICI: the batch axis is sharded across devices
('dp'), parameters are replicated, and XLA inserts the gradient all-reduce
automatically when a jitted loss averages over the global batch — no
DistributedSampler, no find_unused_parameters, no SyncBatchNorm machinery.

A second mesh axis ('fr') is used by the PTI video coach to shard the frame
axis of a clip (SURVEY.md §5.7).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    """1-D mesh over the first n devices (default: all).

    Raises if fewer than n_devices are available — silently shrinking the
    mesh would let a "multi-chip" run degrade to single-device unnoticed
    (for virtual CPU devices set XLA_FLAGS=--xla_force_host_platform_
    device_count=N before jax initializes)."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"requested a {n_devices}-device mesh but only {len(devs)} "
                f"device(s) are visible on platform "
                f"{devs[0].platform if devs else '?'}")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))

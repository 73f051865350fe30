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


def make_mesh_2d(dp: int, sp: int, axes: tuple[str, str] = ("dp", "sp")) -> Mesh:
    """2-D (batch x spatial) mesh: 'dp' shards the batch axis, 'sp' shards
    image HEIGHT. GSPMD partitions the convolutions spatially and inserts
    the halo exchanges — the TPU-native answer when a 1024^2 per-device
    batch slice doesn't fit HBM (SURVEY.md §5.7). Raises if dp*sp devices
    are unavailable (see make_mesh)."""
    devs = jax.devices()
    n = dp * sp
    if len(devs) < n:
        raise RuntimeError(
            f"requested a {dp}x{sp} mesh but only {len(devs)} device(s) "
            f"are visible on platform {devs[0].platform if devs else '?'}")
    return Mesh(np.asarray(devs[:n]).reshape(dp, sp), axes)


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def shard_batch_spatial(mesh: Mesh, axes: tuple[str, str] = ("dp", "sp")
                        ) -> NamedSharding:
    """(B, H, W, C): batch over `dp`, height over `sp` (halo exchanges for
    convs are GSPMD-inserted)."""
    return NamedSharding(mesh, P(axes[0], axes[1]))

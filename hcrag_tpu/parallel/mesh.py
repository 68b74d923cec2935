"""Device mesh helpers.

The reference has no distributed execution at all (SURVEY §2.3); the TPU
framework's first-class parallelism strategy is data-parallel sharding of the
index rows (and graph adjacency) across chips over ICI, with query batches
replicated.  This module owns mesh construction; sharding rules live in
`parallel.sharded_engine`.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

#: Mesh axis over which index rows / graph adjacency are sharded.
ROWS_AXIS = "rows"
#: Optional second axis for sharding the query batch (data parallel queries).
BATCH_AXIS = "batch"


def _auto_axis_types(n: int):
    # jax >= 0.9 defaults make_mesh to Explicit axis types; the engine uses
    # classic Auto sharding (shard_map + sharding-annotated jit).
    from jax.sharding import AxisType

    return (AxisType.Auto,) * n


def make_row_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over all (or the first `num_devices`) devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return jax.make_mesh(
        (len(devices),),
        (ROWS_AXIS,),
        devices=devices,
        axis_types=_auto_axis_types(1),
    )


def make_batch_row_mesh(batch: int, rows: int) -> Mesh:
    """2-D (batch, rows) mesh: queries sharded over `batch`, index rows over
    `rows`."""
    return jax.make_mesh(
        (batch, rows), (BATCH_AXIS, ROWS_AXIS), axis_types=_auto_axis_types(2)
    )


def row_sharding(mesh: Mesh) -> NamedSharding:
    """[N, ...] arrays split along the row axis."""
    return NamedSharding(mesh, P(ROWS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

"""Sharded index checkpointing (orbax).

`DenseIndex.save/load` (npz) covers single-host artifacts; at 10M+ rows the
embedding matrix should be written/restored shard-parallel without ever
gathering onto one host.  This module checkpoints the engine's device arrays
with their shardings via orbax — the scale analogue of the reference's
pickled index (SURVEY §5.4).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_sharded_index(engine, directory) -> None:
    """Write the engine's device-resident index bank (preserving shardings)."""
    directory = Path(directory).absolute()
    tree = {
        "emb": engine.d_emb,
        "type_ids": engine.d_type_ids,
        "entity_bits": engine.d_bits,
        "entity_counts": engine.d_counts,
        "graph_ids": engine.d_graph_ids,
    }
    if engine.d_neighbors is not None:
        tree["neighbors"] = engine.d_neighbors
        tree["neighbors_hop2"] = engine.d_neighbors_hop2
        tree["g_type_ids"] = engine.d_g_type_ids
        tree["g_row"] = engine.d_g_row
    _checkpointer().save(directory, tree, force=True)


def restore_sharded_index(
    engine, directory, *, shardings: Optional[Dict] = None
) -> None:
    """Restore device arrays into an engine (same mesh/topology).

    `shardings` optionally maps tree keys to jax.sharding.Sharding; default
    restores with the shardings of the engine's current arrays.
    """
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    current = {
        "emb": engine.d_emb,
        "type_ids": engine.d_type_ids,
        "entity_bits": engine.d_bits,
        "entity_counts": engine.d_counts,
        "graph_ids": engine.d_graph_ids,
    }
    if engine.d_neighbors is not None:
        current["neighbors"] = engine.d_neighbors
        current["neighbors_hop2"] = engine.d_neighbors_hop2
        current["g_type_ids"] = engine.d_g_type_ids
        current["g_row"] = engine.d_g_row

    restore_args = jax.tree.map(
        lambda arr: ocp.ArrayRestoreArgs(
            sharding=(shardings or {}).get(id(arr)) or arr.sharding,
            global_shape=arr.shape,
            dtype=arr.dtype,
        ),
        current,
    )
    restored = _checkpointer().restore(
        directory, item=current, restore_args=restore_args
    )
    engine.d_emb = restored["emb"]
    engine.d_type_ids = restored["type_ids"]
    engine.d_bits = restored["entity_bits"]
    engine.d_counts = restored["entity_counts"]
    engine.d_graph_ids = restored["graph_ids"]
    if "neighbors" in restored:
        engine.d_neighbors = restored["neighbors"]
        engine.d_neighbors_hop2 = restored["neighbors_hop2"]
        engine.d_g_type_ids = restored["g_type_ids"]
        engine.d_g_row = restored["g_row"]
    engine._step_cache.clear()  # arrays changed; recompile against them

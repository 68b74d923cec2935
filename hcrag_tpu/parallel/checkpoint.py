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

import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


#: (tree key, engine attribute) for every device array an engine may carry.
#: Quantized / dual-residency engines select and rescore against
#: emb_int8/emb_scale/emb_f32 — omitting any present bank from the
#: checkpoint would leave a restore with stale selection/rescore tables and
#: silently wrong rankings.
_BANK_ATTRS = (
    ("emb", "d_emb"),
    ("emb_int8", "d_emb_int8"),
    ("emb_scale", "d_emb_scale"),
    ("emb_f32", "d_emb_f32"),
    ("emb_res8", "d_emb_res8"),
    ("emb_res_scale", "d_emb_res_scale"),
    ("type_ids", "d_type_ids"),
    ("entity_bits", "d_bits"),
    ("entity_counts", "d_counts"),
    ("graph_ids", "d_graph_ids"),
    ("neighbors", "d_neighbors"),
    ("neighbors_hop2", "d_neighbors_hop2"),
    ("g_type_ids", "d_g_type_ids"),
    ("g_row", "d_g_row"),
)


def _engine_tree(engine) -> Dict:
    return {
        key: getattr(engine, attr)
        for key, attr in _BANK_ATTRS
        if getattr(engine, attr, None) is not None
    }


def save_sharded_index(engine, directory) -> None:
    """Write the engine's device-resident index bank (preserving shardings).

    Covers every bank the engine's mode uses — f32/bf16, int8 + scales, and
    the f32 exact-rescore copy."""
    directory = Path(directory).absolute()
    _checkpointer().save(directory, _engine_tree(engine), force=True)


def restore_sharded_index(
    engine, directory, *, shardings: Optional[Dict] = None
) -> None:
    """Restore device arrays into an engine (same mesh/topology and same
    engine mode: the checkpoint must carry exactly the banks the engine's
    quantize/rescore configuration expects).

    `shardings` optionally maps tree KEYS (e.g. "emb", "emb_int8") to
    jax.sharding.Sharding; any key not in the mapping restores with the
    sharding of the engine's current array.
    """
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    current = _engine_tree(engine)

    restore_args = {
        key: ocp.ArrayRestoreArgs(
            sharding=(shardings or {}).get(key) or arr.sharding,
            global_shape=arr.shape,
            dtype=arr.dtype,
        )
        for key, arr in current.items()
    }
    restored = _checkpointer().restore(
        directory, item=current, restore_args=restore_args
    )
    for key, attr in _BANK_ATTRS:
        if key in restored:
            setattr(engine, attr, restored[key])
    engine._step_cache.clear()  # arrays changed; recompile against them

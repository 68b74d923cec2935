"""Training-state checkpoint/resume: params + optimizer state + step.

The index side of checkpoint/resume (SURVEY §5.4) is covered by
`DenseIndex.save/load` and `parallel/checkpoint.py` (orbax, sharded); this
module covers the TRAINING side — the reranker distillation
(`models/reranker.py`), the MiniLM golden distillation
(`tools/distill_minilm.py`) and the contrastive encoder step — so an
interrupted run resumes bit-exactly instead of restarting.  The reference
has no trainers; its workflow-level resume analogue is LangGraph's
MemorySaver "prevents re-processing on failures"
(improved_rag_system.py:275) — this is that guarantee applied to training.

Format: one .npz of '/'-joined flat paths (the same layout
`FlaxMiniLMEmbedder.save_params` uses) over the pytree
``{"params": ..., "opt_state": ..., "step": ...}``.  Optax states are
arbitrary pytrees of namedtuples/dataclasses; they round-trip by flattening
with `jax.tree_util` and restoring INTO a freshly-initialized state of the
same optimizer (structure from code, leaves from disk) — no pickling of
optax internals, so checkpoints survive optax version drift as long as the
tree SHAPE matches.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _flatten(tree) -> Dict[str, np.ndarray]:
    leaves, _ = jax.tree_util.tree_flatten(tree)
    return {f"leaf_{i:05d}": np.asarray(x) for i, x in enumerate(leaves)}


def _npz_path(path) -> Path:
    """Normalize to an explicit '.npz' suffix.  np.savez APPENDS '.npz' when
    the name lacks it, so save/restore/exists probes on the raw path would
    disagree ('--resume ckpt' wrote ckpt.npz yet never resumed); normalizing
    on BOTH sides makes every spelling refer to the same file."""
    path = Path(path)
    if path.suffix != ".npz":
        path = path.with_name(path.name + ".npz")
    return path


def save_train_state(path, params, opt_state, step: int) -> None:
    """Write params + optimizer state + step counter to one .npz."""
    path = _npz_path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload: Dict[str, np.ndarray] = {"__step__": np.asarray(step, np.int64)}
    for prefix, tree in (("p", params), ("o", opt_state)):
        for key, arr in _flatten(tree).items():
            payload[f"{prefix}/{key}"] = arr
    np.savez(path, **payload)


def restore_train_state(
    path, params_template, opt_state_template
) -> Tuple[Any, Any, int]:
    """Restore (params, opt_state, step) into the templates' tree structure.

    Templates come from a fresh `model.init` / `tx.init` — leaf COUNT and
    per-leaf shape/dtype must match what was saved (asserted), which catches
    architecture or optimizer drift instead of silently mis-restoring.
    """
    data = np.load(_npz_path(path))
    step = int(data["__step__"])
    out = []
    for prefix, template in (("p", params_template), ("o", opt_state_template)):
        leaves, treedef = jax.tree_util.tree_flatten(template)
        keys = [f"{prefix}/leaf_{i:05d}" for i in range(len(leaves))]
        missing = [k for k in keys if k not in data]
        if missing:
            raise ValueError(
                f"checkpoint {path} has {sum(1 for k in data if k.startswith(prefix + '/'))} "
                f"'{prefix}' leaves, template expects {len(leaves)} "
                f"(first missing: {missing[0]}) — optimizer/model drift?"
            )
        restored = []
        for k, leaf in zip(keys, leaves):
            arr = data[k]
            want = np.asarray(leaf)
            if tuple(arr.shape) != tuple(want.shape):
                raise ValueError(
                    f"{k}: saved shape {arr.shape} != template {want.shape}"
                )
            restored.append(arr.astype(want.dtype))
        out.append(jax.tree_util.tree_unflatten(treedef, restored))
    return out[0], out[1], step

"""Checkpoint helpers beyond the reference-compatible JSON format.

``Trainer.serialize``/``deserialize`` mirror the reference's JSON blobs
(trainer.h:442-482). For production TPU jobs this module adds:

- ``save_npz`` / ``load_npz``: fast binary checkpoints of the full training
  state (params + optimizer pytree) with no JSON/base64 overhead;
- ``save_orbax`` / ``load_orbax``: orbax-checkpoint integration when the
  package is available (async, sharded, multi-host-safe).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import jax
import numpy as np


def _flatten_state(state) -> Dict[str, np.ndarray]:
    flat = {}
    leaves, treedef = jax.tree_util.tree_flatten(state)
    flat["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )
    for i, leaf in enumerate(leaves):
        flat[f"leaf_{i}"] = np.asarray(leaf)
    return flat


def save_npz(path, trainer) -> None:
    """Save the full training state (params + optimizer) as an .npz."""
    np.savez(path, **_flatten_state(trainer.state))


def load_npz(path, trainer) -> None:
    """Restore state saved by ``save_npz`` into a structurally identical
    trainer (same model/optimizer configuration)."""
    data = np.load(path, allow_pickle=False)
    template_leaves, treedef = jax.tree_util.tree_flatten(trainer.state)
    n = len(template_leaves)
    leaves = []
    for i in range(n):
        arr = data[f"leaf_{i}"]
        tmpl = template_leaves[i]
        if tuple(arr.shape) != tuple(np.shape(tmpl)):
            raise ValueError(
                f"checkpoint leaf {i} has shape {arr.shape}, expected "
                f"{np.shape(tmpl)} — optimizer/model config mismatch"
            )
        leaves.append(jax.numpy.asarray(arr, dtype=tmpl.dtype))
    trainer.state = jax.tree_util.tree_unflatten(treedef, leaves)


def save_orbax(path, trainer) -> None:
    """Orbax checkpoint of the training state (if orbax is installed)."""
    import orbax.checkpoint as ocp  # noqa: PLC0415

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(Path(path).resolve(), trainer.state)
    ckptr.wait_until_finished()


def load_orbax(path, trainer) -> None:
    import orbax.checkpoint as ocp  # noqa: PLC0415

    ckptr = ocp.StandardCheckpointer()
    trainer.state = ckptr.restore(
        Path(path).resolve(), target=trainer.state
    )

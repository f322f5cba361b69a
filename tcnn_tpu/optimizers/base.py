"""Optimizer protocol.

TPU-native analogue of ``Optimizer<T>`` (reference: optimizer.h:39-63),
redesigned functionally: state is a pytree of jnp arrays, ``step`` is a pure
function traceable under jit. The scalar step counter lives in the state so
the whole training step compiles to one XLA program — the analogue of the
reference's CUDA-graph-captured step.

Interface parity:
- ``allocate(n_weights, layer_sizes)``: static setup. ``layer_sizes`` lists
  the network's weight-matrix shapes; params covered by them ("matrix
  params") may be treated differently from the rest (hash grids etc.).
- ``step(state, params, grads, loss_scale)``: one update; gradients are
  divided by ``loss_scale`` inside, like every reference optimizer kernel.
- ``custom_weights(state)``: separate inference weights (EMA/Average/
  Lookahead wrappers), else None.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp


class Optimizer:
    otype = "Optimizer"

    def __init__(self):
        self.n_weights = 0
        self.layer_sizes: List[Tuple[int, int]] = []

    # -- static setup ------------------------------------------------------
    def allocate(self, n_weights: int, layer_sizes: List[Tuple[int, int]]):
        self.n_weights = int(n_weights)
        self.layer_sizes = list(layer_sizes)

    def init_state(self) -> Dict[str, Any]:
        return {"step": jnp.zeros((), jnp.int32)}

    # -- pure update --------------------------------------------------------
    def step(self, state, params, grads, loss_scale: float):
        """Returns (new_state, new_params); pure & jit-traceable."""
        raise NotImplementedError

    def custom_weights(self, state) -> Optional[jnp.ndarray]:
        return None

    # -- introspection -------------------------------------------------------
    @property
    def learning_rate(self) -> float:
        return 0.0

    @learning_rate.setter
    def learning_rate(self, value: float):
        raise NotImplementedError

    def n_nested(self) -> int:
        return 0

    def nested(self, idx: int = 0) -> "Optimizer":
        raise IndexError("optimizer has no nested optimizers")

    def update_hyperparams(self, params: Dict):
        pass

    def hyperparams(self) -> Dict:
        return {"otype": self.otype}

    # Number of weights covered by weight matrices (the matrix/non-matrix
    # boundary; matrix params come first in the flat vector).
    @property
    def n_matrix_weights(self) -> int:
        return sum(r * c for r, c in self.layer_sizes)

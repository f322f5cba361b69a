"""Composite optimizer: different optimizers per contiguous param range.

(reference: optimizers/composite.h). Each nested config declares
``n_params_to_optimize``; ranges are concatenated in order. The last nested
optimizer may omit it and receives the remainder (a usability extension over
the reference, which requires every range explicitly). ``custom_weights``
stitches together nested custom weights, falling back to the live weights
for ranges without any (composite.h:75-88).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp

from ..common import json_value
from .base import Optimizer


def slice_layer_sizes(
    layer_sizes: List[Tuple[int, int]], offset: int, size: int
) -> List[Tuple[int, int]]:
    """Layers fully contained in [offset, offset+size); boundaries must not
    split a matrix (reference: composite.h:20-42)."""
    out = []
    pos = 0
    for rows, cols in layer_sizes:
        n = rows * cols
        if pos >= offset + size:
            break
        if pos >= offset:
            if pos + n > offset + size:
                raise ValueError("Invalid slice. Can't slice within a layer.")
            out.append((rows, cols))
        elif pos + n > offset:
            raise ValueError("Invalid slice. Can't slice within a layer.")
        pos += n
    return out


class CompositeOptimizer(Optimizer):
    otype = "Composite"

    def __init__(self, params: Dict = None):
        super().__init__()
        from . import create_optimizer  # late import

        params = params or {}
        nested_cfgs = json_value(params, "nested", None)
        if not nested_cfgs:
            raise ValueError(
                "Must provide an array of nested optimizers to CompositeOptimizer."
            )
        self._nested: List[Optimizer] = []
        self._declared_sizes: List[Optional[int]] = []
        for cfg in nested_cfgs:
            self._nested.append(create_optimizer(cfg))
            n = json_value(cfg, "n_params_to_optimize", None)
            self._declared_sizes.append(None if n is None else int(n))
        if sum(1 for s in self._declared_sizes if s is None) > 1:
            raise ValueError(
                "CompositeOptimizer: only one nested optimizer may omit "
                "n_params_to_optimize"
            )
        self.offsets: List[int] = []

    def allocate(self, n_weights, layer_sizes):
        super().allocate(n_weights, layer_sizes)
        declared = sum(s for s in self._declared_sizes if s is not None)
        remainder = n_weights - declared
        if remainder < 0:
            raise ValueError(
                f"CompositeOptimizer: declared {declared} params > total {n_weights}"
            )
        sizes = [s if s is not None else remainder for s in self._declared_sizes]
        self.offsets = [0]
        for s in sizes:
            self.offsets.append(self.offsets[-1] + s)
        if self.offsets[-1] != n_weights:
            raise ValueError(
                f"CompositeOptimizer: ranges cover {self.offsets[-1]} of "
                f"{n_weights} params"
            )
        for opt, off, end in zip(self._nested, self.offsets[:-1], self.offsets[1:]):
            opt.allocate(end - off, slice_layer_sizes(layer_sizes, off, end - off))
        self._need_custom = None  # resolved lazily on first custom_weights call

    def init_state(self):
        return {"nested": [opt.init_state() for opt in self._nested]}

    def step(self, state, params, grads, loss_scale: float):
        new_states = []
        new_parts = []
        for opt, st, off, end in zip(
            self._nested, state["nested"], self.offsets[:-1], self.offsets[1:]
        ):
            ns, np_ = opt.step(st, params[off:end], grads[off:end], loss_scale)
            new_states.append(ns)
            new_parts.append(np_)
        return {"nested": new_states}, jnp.concatenate(new_parts)

    def custom_weights(self, state):
        customs = [
            opt.custom_weights(st) for opt, st in zip(self._nested, state["nested"])
        ]
        if all(c is None for c in customs):
            return None

        def stitched(params):
            parts = []
            for c, off, end in zip(customs, self.offsets[:-1], self.offsets[1:]):
                parts.append(c if c is not None else params[off:end])
            return jnp.concatenate(parts)

        return stitched  # caller supplies live params (see Trainer)

    def n_nested(self) -> int:
        return len(self._nested)

    def nested(self, idx: int = 0) -> Optimizer:
        return self._nested[idx]

    @property
    def learning_rate(self) -> float:
        return self._nested[0].learning_rate

    @learning_rate.setter
    def learning_rate(self, value: float):
        for opt in self._nested:
            opt.learning_rate = value

    def update_hyperparams(self, params: Dict):
        nested_cfgs = json_value(params, "nested", None)
        if nested_cfgs:
            for opt, cfg in zip(self._nested, nested_cfgs):
                opt.update_hyperparams(cfg)

    def hyperparams(self) -> Dict:
        return {
            "otype": self.otype,
            "nested": [opt.hyperparams() for opt in self._nested],
        }

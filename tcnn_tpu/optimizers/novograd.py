"""Novograd (reference: optimizers/novograd.h).

Per-*layer* second moment: for each weight matrix, the squared gradient norm
feeds an EMA whose square root normalizes that layer's first-moment update.
Only params covered by ``layer_sizes`` are optimized (the reference's step
loop walks layers and never touches the remainder — novograd.h:131-168).

On the first step the EMAs are seeded with the exact value (beta := 0),
mirroring novograd.h:147-150.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..common import json_value
from .base import Optimizer


class NovogradOptimizer(Optimizer):
    otype = "Novograd"

    def __init__(self, params: Dict = None):
        super().__init__()
        self.base_learning_rate = 1e-3
        self.beta1 = 0.9
        self.beta2 = 0.999
        self.epsilon = 1e-8
        self.relative_weight_decay = 0.0
        self.absolute_weight_decay = 0.0
        self.update_hyperparams(params or {})

    def init_state(self):
        n_layers = len(self.layer_sizes)
        return {
            "step": jnp.zeros((), jnp.int32),
            "first_moments": jnp.zeros((self.n_matrix_weights,), jnp.float32),
            "per_layer_second_moments": jnp.zeros((n_layers,), jnp.float32),
        }

    def step(self, state, params, grads, loss_scale: float):
        current_step = state["step"] + 1
        # Exact seeding on step 1 (novograd.h:147-150).
        beta1 = jnp.where(current_step == 1, 0.0, self.beta1)
        beta2 = jnp.where(current_step == 1, 0.0, self.beta2)

        weight_fp = params.astype(jnp.float32)
        g_all = grads.astype(jnp.float32)

        new_first = []
        new_second = []
        new_weights = []
        offset = 0
        for li, (rows, cols) in enumerate(self.layer_sizes):
            size = rows * cols
            g = g_all[offset : offset + size] / loss_scale
            norm_sq = jnp.sum(
                g_all[offset : offset + size] ** 2
            ) / (loss_scale * loss_scale)
            second = (
                beta2 * state["per_layer_second_moments"][li] + (1 - beta2) * norm_sq
            )
            first = beta1 * state["first_moments"][offset : offset + size] + (
                1 - beta1
            ) * g / (jnp.sqrt(second) + self.epsilon)

            w = weight_fp[offset : offset + size]
            lr = self.base_learning_rate
            decayed = (1 - self.relative_weight_decay * lr) * w - jnp.sign(w) * (
                self.absolute_weight_decay * lr
            )
            new_weights.append(decayed - lr * first)
            new_first.append(first)
            new_second.append(second)
            offset += size

        # Params beyond the matrix range are untouched.
        if offset < self.n_weights:
            new_weights.append(weight_fp[offset:])

        new_state = {
            "step": current_step,
            "first_moments": (
                jnp.concatenate(new_first)
                if new_first
                else state["first_moments"]
            ),
            "per_layer_second_moments": (
                jnp.stack(new_second)
                if new_second
                else state["per_layer_second_moments"]
            ),
        }
        return new_state, jnp.concatenate(new_weights) if new_weights else weight_fp

    @property
    def learning_rate(self) -> float:
        return self.base_learning_rate

    @learning_rate.setter
    def learning_rate(self, value: float):
        self.base_learning_rate = float(value)

    def update_hyperparams(self, params: Dict):
        for key, attr in [
            ("learning_rate", "base_learning_rate"),
            ("beta1", "beta1"),
            ("beta2", "beta2"),
            ("epsilon", "epsilon"),
            ("relative_decay", "relative_weight_decay"),
            ("absolute_decay", "absolute_weight_decay"),
        ]:
            v = json_value(params, key, None)
            if v is not None:
                setattr(self, attr, v)

    def hyperparams(self) -> Dict:
        return {
            "otype": self.otype,
            "learning_rate": self.base_learning_rate,
            "beta1": self.beta1,
            "beta2": self.beta2,
            "epsilon": self.epsilon,
            "relative_decay": self.relative_weight_decay,
            "absolute_decay": self.absolute_weight_decay,
        }

"""Wrapper optimizers: EMA, Average, Batched, Lookahead, ExponentialDecay.

Each wraps a nested optimizer (reference: optimizers/{ema,average,batched,
lookahead,exponential_decay}.h). State is namespaced as
``{"nested": ..., <wrapper fields>}``; conditional behavior keyed on the step
counter uses traced ``jnp.where`` / ``lax.cond`` so the wrapped training step
still compiles to a single XLA program.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..common import json_value
from .base import Optimizer


class WrapperOptimizer(Optimizer):
    def __init__(self, params: Dict = None):
        super().__init__()
        from . import create_optimizer  # late import, avoids cycle

        params = params or {}
        self._nested = create_optimizer(json_value(params, "nested", {}) or {})

    def allocate(self, n_weights, layer_sizes):
        super().allocate(n_weights, layer_sizes)
        self._nested.allocate(n_weights, layer_sizes)

    def n_nested(self) -> int:
        return 1

    def nested(self, idx: int = 0) -> Optimizer:
        if idx != 0:
            raise IndexError(idx)
        return self._nested

    @property
    def learning_rate(self) -> float:
        return self._nested.learning_rate

    @learning_rate.setter
    def learning_rate(self, value: float):
        self._nested.learning_rate = value

    def custom_weights(self, state):
        return self._nested.custom_weights(state["nested"])

    def update_hyperparams(self, params: Dict):
        nested_cfg = json_value(params, "nested", None)
        if nested_cfg is not None:
            self._nested.update_hyperparams(nested_cfg)

    def hyperparams(self) -> Dict:
        return {"otype": self.otype, "nested": self._nested.hyperparams()}


class EmaOptimizer(WrapperOptimizer):
    """Decay-corrected EMA of the (post-step) weights into custom_weights
    (reference: optimizers/ema.h:45-120). The EMA accumulator is fp32
    (the reference's ``full_precision`` mode; the half-precision storage
    variant is pointless when fp32 costs nothing on TPU)."""

    otype = "EMA"

    def __init__(self, params: Dict = None):
        super().__init__(params)
        self.ema_decay = json_value(params or {}, "decay", 0.99)

    def init_state(self):
        return {
            "nested": self._nested.init_state(),
            "weights_ema": jnp.zeros((self.n_weights,), jnp.float32),
        }

    def step(self, state, params, grads, loss_scale: float):
        nested_state, new_params = self._nested.step(
            state["nested"], params, grads, loss_scale
        )
        current_step = nested_state["step"].astype(jnp.float32)
        decay = self.ema_decay
        debias_old = 1.0 - decay ** (current_step - 1.0)
        debias_new = 1.0 / (1.0 - decay**current_step)

        source = self._nested.custom_weights(nested_state)
        if source is None:
            source = new_params
        ema = (
            state["weights_ema"] * decay * debias_old
            + source.astype(jnp.float32) * (1.0 - decay)
        ) * debias_new
        return {"nested": nested_state, "weights_ema": ema}, new_params

    def custom_weights(self, state):
        return state["weights_ema"]

    def update_hyperparams(self, params: Dict):
        super().update_hyperparams(params)
        v = json_value(params, "decay", None)
        if v is not None:
            self.ema_decay = v

    def hyperparams(self) -> Dict:
        return {
            "otype": self.otype,
            "decay": self.ema_decay,
            "nested": self._nested.hyperparams(),
        }


class AverageOptimizer(WrapperOptimizer):
    """Sliding-window mean of the last n_samples weight snapshots
    (reference: optimizers/average.h:45-130)."""

    otype = "Average"

    def __init__(self, params: Dict = None):
        super().__init__(params)
        self.n_samples = int(json_value(params or {}, "n_samples", 128))

    def init_state(self):
        return {
            "nested": self._nested.init_state(),
            "weights_samples": jnp.zeros(
                (self.n_samples, self.n_weights), jnp.float32
            ),
            "weights_average": jnp.zeros((self.n_weights,), jnp.float32),
        }

    def step(self, state, params, grads, loss_scale: float):
        nested_state, new_params = self._nested.step(
            state["nested"], params, grads, loss_scale
        )
        idx = jnp.mod(nested_state["step"], self.n_samples)
        w = new_params.astype(jnp.float32)
        old_sample = state["weights_samples"][idx]
        average = state["weights_average"] + (w - old_sample) / self.n_samples
        samples = state["weights_samples"].at[idx].set(w)
        return (
            {
                "nested": nested_state,
                "weights_samples": samples,
                "weights_average": average,
            },
            new_params,
        )

    def custom_weights(self, state):
        return state["weights_average"]

    def update_hyperparams(self, params: Dict):
        super().update_hyperparams(params)
        v = json_value(params, "n_samples", None)
        if v is not None:
            self.n_samples = int(v)

    def hyperparams(self) -> Dict:
        return {
            "otype": self.otype,
            "n_samples": self.n_samples,
            "nested": self._nested.hyperparams(),
        }


class BatchedOptimizer(WrapperOptimizer):
    """Gradient accumulation: averages N gradients, steps the nested
    optimizer every N-th call (reference: optimizers/batched.h:46-90) —
    emulates an N-times larger batch at constant memory."""

    otype = "Batched"

    def __init__(self, params: Dict = None):
        super().__init__(params)
        self.batch_size_multiplier = int(
            json_value(params or {}, "batch_size_multiplier", 16)
        )

    def init_state(self):
        return {
            "nested": self._nested.init_state(),
            "step": jnp.zeros((), jnp.int32),
            "averaged_gradients": jnp.zeros((self.n_weights,), jnp.float32),
        }

    def step(self, state, params, grads, loss_scale: float):
        mult = self.batch_size_multiplier
        first = jnp.mod(state["step"], mult) == 0
        pool = (
            jnp.where(first, 0.0, state["averaged_gradients"])
            + grads.astype(jnp.float32) / mult
        )
        current_step = state["step"] + 1
        do_step = jnp.mod(current_step, mult) == 0

        def run(args):
            nested_state, p = args
            return self._nested.step(nested_state, p, pool, loss_scale)

        def skip(args):
            nested_state, p = args
            return nested_state, p.astype(jnp.float32)

        nested_state, new_params = jax.lax.cond(
            do_step, run, skip, (state["nested"], params)
        )
        return (
            {
                "nested": nested_state,
                "step": current_step,
                "averaged_gradients": pool,
            },
            new_params,
        )

    def update_hyperparams(self, params: Dict):
        super().update_hyperparams(params)
        v = json_value(params, "batch_size_multiplier", None)
        if v is not None:
            self.batch_size_multiplier = int(v)

    def hyperparams(self) -> Dict:
        return {
            "otype": self.otype,
            "batch_size_multiplier": self.batch_size_multiplier,
            "nested": self._nested.hyperparams(),
        }


class LookaheadOptimizer(WrapperOptimizer):
    """Lookahead (slow/fast weights): every n_steps, pulls the fast weights
    toward the slow copy by alpha before the nested step
    (reference: optimizers/lookahead.h:45-97)."""

    otype = "Lookahead"

    def __init__(self, params: Dict = None):
        super().__init__(params)
        self.alpha = json_value(params or {}, "alpha", 0.5)
        self.n_steps = int(json_value(params or {}, "n_steps", 16))

    def init_state(self):
        return {
            "nested": self._nested.init_state(),
            "weights_lookahead": jnp.zeros((self.n_weights,), jnp.float32),
        }

    def step(self, state, params, grads, loss_scale: float):
        current_step = state["nested"]["step"]
        w = params.astype(jnp.float32)
        lookahead = jnp.where(
            current_step == 0, w, state["weights_lookahead"]
        )
        sync = jnp.mod(current_step, self.n_steps) == 0
        synced = lookahead * (1.0 - self.alpha) + w * self.alpha
        w = jnp.where(sync, synced, w)
        lookahead = jnp.where(sync, synced, lookahead)

        nested_state, new_params = self._nested.step(
            state["nested"], w, grads, loss_scale
        )
        return (
            {"nested": nested_state, "weights_lookahead": lookahead},
            new_params,
        )

    def custom_weights(self, state):
        return state["weights_lookahead"]

    def update_hyperparams(self, params: Dict):
        super().update_hyperparams(params)
        v = json_value(params, "alpha", None)
        if v is not None:
            self.alpha = v
        v = json_value(params, "n_steps", None)
        if v is not None:
            self.n_steps = int(v)

    def hyperparams(self) -> Dict:
        return {
            "otype": self.otype,
            "alpha": self.alpha,
            "n_steps": self.n_steps,
            "nested": self._nested.hyperparams(),
        }


class ExponentialDecayOptimizer(WrapperOptimizer):
    """Piecewise-exponential learning-rate decay
    (reference: optimizers/exponential_decay.h:44-110): every
    ``decay_interval`` steps in ``[decay_start, decay_end]``, the nested
    optimizer's lr is multiplied by ``decay_base``. Realized as a traced lr
    *factor* in the state applied through a scale on the nested update."""

    otype = "ExponentialDecay"

    def __init__(self, params: Dict = None):
        super().__init__(params)
        params = params or {}
        self.decay_base = json_value(params, "decay_base", 0.1)
        self.decay_interval = int(json_value(params, "decay_interval", 10000))
        self.decay_start = int(json_value(params, "decay_start", 10000))
        self.decay_end = int(json_value(params, "decay_end", 10000000))
        self._base_learning_rate = self._nested.learning_rate

    def init_state(self):
        return {
            "nested": self._nested.init_state(),
            "lr_factor": jnp.ones((), jnp.float32),
        }

    def step(self, state, params, grads, loss_scale: float):
        current_step = state["nested"]["step"]
        decay_now = (
            (current_step >= self.decay_start)
            & (current_step <= self.decay_end)
            & (jnp.mod(current_step - self.decay_start, self.decay_interval) == 0)
        )
        factor = jnp.where(
            current_step == 0,
            1.0,
            state["lr_factor"] * jnp.where(decay_now, self.decay_base, 1.0),
        )

        # The nested optimizer's lr is a static python float; realize the
        # traced factor by scaling the update: w' = w + factor * (step(w) - w).
        nested_state, stepped = self._nested.step(
            state["nested"], params, grads, loss_scale
        )
        w = params.astype(jnp.float32)
        new_params = w + factor * (stepped - w)
        return {"nested": nested_state, "lr_factor": factor}, new_params

    @property
    def learning_rate(self) -> float:
        return self._base_learning_rate

    @learning_rate.setter
    def learning_rate(self, value: float):
        self._base_learning_rate = float(value)
        self._nested.learning_rate = value

    def update_hyperparams(self, params: Dict):
        super().update_hyperparams(params)
        for key, attr in [
            ("decay_base", "decay_base"),
            ("decay_interval", "decay_interval"),
            ("decay_start", "decay_start"),
            ("decay_end", "decay_end"),
        ]:
            v = json_value(params, key, None)
            if v is not None:
                setattr(self, attr, type(getattr(self, attr))(v))

    def hyperparams(self) -> Dict:
        return {
            "otype": self.otype,
            "decay_base": self.decay_base,
            "decay_interval": self.decay_interval,
            "decay_start": self.decay_start,
            "decay_end": self.decay_end,
            "nested": self._nested.hyperparams(),
        }

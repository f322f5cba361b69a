"""Data-parallel training over a 1-D device mesh.

Design (SURVEY.md §7, "(new) distribution"): the model's weights are tiny
(a few MB even with hash grids) so they are **replicated**; the batch is
**sharded** over the ``data`` mesh axis. The training step is jitted with
sharding annotations; XLA turns the parameter-gradient reduction into a
``psum`` over ICI. No NCCL/MPI analogue is needed — the mesh + shardings
ARE the communication layer.

Covers the full Trainer step surface: the plain step, the importance-
sampling ``data_pdf`` variant, the external-``dL_dy`` step, and trainers
with output perturbation (the carried rng key lives in the replicated
state; noise is generated inside the jitted step with JAX's partitionable
threefry, so values match the single-device trainer bit-for-bit).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..trainer import Trainer


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


class DataParallelTrainer:
    """Wraps a Trainer with batch sharding over a mesh.

    The wrapped trainer's pure step functions are reused unchanged — only
    the in/out shardings differ: state replicated, batch sharded on axis 0.
    """

    def __init__(self, trainer: Trainer, mesh: Optional[Mesh] = None,
                 axis_name: str = "data"):
        self.trainer = trainer
        self.mesh = mesh if mesh is not None else make_mesh(axis_name=axis_name)
        self.axis_name = axis_name

        replicated = NamedSharding(self.mesh, P())
        batch_sharded = NamedSharding(self.mesh, P(axis_name, None))

        self._replicated = replicated
        self._batch_sharded = batch_sharded

        state_sharding = jax.tree_util.tree_map(
            lambda _: replicated, self.trainer.state
        )
        self._state_sharding = state_sharding
        self._jit_step = jax.jit(
            self.trainer._train_step,
            in_shardings=(state_sharding, batch_sharded, batch_sharded),
            out_shardings=(state_sharding, replicated),
            donate_argnums=(0,),
        )
        # pdf / external-gradient variants are traced lazily on first use.
        self._jit_step_pdf = None
        self._jit_step_ext = None
        self._jit_inference = jax.jit(
            lambda params, x: self.trainer.model.apply(
                params, x, **self.trainer._inference_kwargs()
            ),
            in_shardings=(replicated, batch_sharded),
            out_shardings=batch_sharded,
        )

        # Place the current state on the mesh.
        self.trainer.state = jax.device_put(self.trainer.state, replicated)

    @property
    def n_devices(self) -> int:
        return self.mesh.size

    def shard_batch(self, *arrays):
        """Place batch arrays on the mesh. Arrays already committed with
        the batch sharding pass through untouched — callers streaming
        pre-sharded device arrays (e.g. a sharded on-device sampler) pay
        no per-step transfer (host->device stalls are the dominant hazard
        over a tunneled TPU; see CLAUDE.md)."""
        out = tuple(
            a
            if (
                isinstance(a, jax.Array)
                and getattr(a, "committed", False)
                and a.sharding == self._batch_sharded
            )
            else jax.device_put(a, self._batch_sharded)
            for a in arrays
        )
        return out if len(out) > 1 else out[0]

    def _check_batch(self, batch: int):
        if batch % self.n_devices != 0:
            raise ValueError(
                f"batch size {batch} must be divisible by the data-parallel "
                f"degree {self.n_devices}"
            )

    def training_step(self, inputs, targets, data_pdf=None) -> jnp.ndarray:
        self._check_batch(inputs.shape[0])
        if data_pdf is None:
            inputs, targets = self.shard_batch(inputs, targets)
            self.trainer.state, loss_value = self._jit_step(
                self.trainer.state, inputs, targets
            )
        else:
            if self._jit_step_pdf is None:
                self._jit_step_pdf = jax.jit(
                    self.trainer._train_step_with_pdf,
                    in_shardings=(
                        self._state_sharding,
                        self._batch_sharded,
                        self._batch_sharded,
                        self._batch_sharded,
                    ),
                    out_shardings=(self._state_sharding, self._replicated),
                    donate_argnums=(0,),
                )
            inputs, targets, data_pdf = self.shard_batch(
                inputs, targets, data_pdf
            )
            self.trainer.state, loss_value = self._jit_step_pdf(
                self.trainer.state, inputs, targets, data_pdf
            )
        return loss_value

    def training_step_with_gradients(self, inputs, dL_doutput) -> None:
        """External-gradient step (reference: trainer.h:127-138), batch
        sharded like the plain step."""
        self._check_batch(inputs.shape[0])
        if self._jit_step_ext is None:
            self._jit_step_ext = jax.jit(
                self.trainer._step_external_impl,
                in_shardings=(
                    self._state_sharding,
                    self._batch_sharded,
                    self._batch_sharded,
                ),
                out_shardings=self._state_sharding,
                donate_argnums=(0,),
            )
        inputs, dL_doutput = self.shard_batch(inputs, dL_doutput)
        self.trainer.state = self._jit_step_ext(
            self.trainer.state, inputs, dL_doutput
        )

    def inference(self, inputs) -> jnp.ndarray:
        inputs = self.shard_batch(inputs)
        out = self._jit_inference(self.trainer.inference_params(), inputs)
        return out[:, : self.trainer.model.n_output_dims].astype(jnp.float32)

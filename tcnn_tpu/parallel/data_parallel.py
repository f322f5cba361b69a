"""Data-parallel training over a 1-D device mesh.

Design (SURVEY.md §7, "(new) distribution"): the model's weights are tiny
(a few MB even with hash grids) so they are **replicated**; the batch is
**sharded** over the ``data`` mesh axis. The training step is jitted with
sharding annotations; XLA turns the parameter-gradient reduction into a
``psum`` over ICI. No NCCL/MPI analogue is needed — the mesh + shardings
ARE the communication layer.
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

    The wrapped trainer's pure step function is reused unchanged — only the
    in/out shardings differ: state replicated, batch sharded on axis 0.
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
        self._jit_step = jax.jit(
            self.trainer._train_step,
            in_shardings=(state_sharding, batch_sharded, batch_sharded),
            out_shardings=(state_sharding, replicated),
            donate_argnums=(0,),
        )
        self._jit_inference = jax.jit(
            lambda params, x: self.trainer.model.apply(params, x),
            in_shardings=(replicated, batch_sharded),
            out_shardings=batch_sharded,
        )

        # Place the current state on the mesh.
        self.trainer.state = jax.device_put(self.trainer.state, replicated)

    @property
    def n_devices(self) -> int:
        return self.mesh.size

    def shard_batch(self, *arrays):
        out = tuple(jax.device_put(a, self._batch_sharded) for a in arrays)
        return out if len(out) > 1 else out[0]

    def training_step(self, inputs, targets) -> jnp.ndarray:
        batch = inputs.shape[0]
        if batch % self.n_devices != 0:
            raise ValueError(
                f"batch size {batch} must be divisible by the data-parallel "
                f"degree {self.n_devices}"
            )
        inputs, targets = self.shard_batch(inputs, targets)
        self.trainer.state, loss_value = self._jit_step(
            self.trainer.state, inputs, targets
        )
        return loss_value

    def inference(self, inputs) -> jnp.ndarray:
        inputs = self.shard_batch(inputs)
        out = self._jit_inference(self.trainer.inference_params(), inputs)
        return out[:, : self.trainer.model.n_output_dims].astype(jnp.float32)

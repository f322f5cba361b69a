"""create_from_config — the single JSON entry point.

(reference: config.h:46-63). The same JSON document that drives the CUDA
reference instantiates jitted JAX/Pallas implementations here:

    {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-3},
        "encoding": {"otype": "HashGrid", ...},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64, ...}
    }
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

from .losses import Loss, create_loss
from .network_with_input_encoding import NetworkWithInputEncoding
from .optimizers import Optimizer, create_optimizer
from .trainer import Trainer


@dataclass
class TrainableModel:
    model: NetworkWithInputEncoding
    trainer: Trainer
    loss: Loss
    optimizer: Optimizer

    # Convenience passthroughs
    def training_step(self, inputs, targets, data_pdf=None):
        return self.trainer.training_step(inputs, targets, data_pdf)

    def inference(self, inputs):
        return self.trainer.inference(inputs)

    @property
    def params(self):
        return self.trainer.params


def create_from_config(
    n_input_dims: int,
    n_output_dims: int,
    config: Dict,
    seed: int = 1337,
    precision=None,
) -> TrainableModel:
    loss = create_loss(config.get("loss", {}))
    optimizer = create_optimizer(config.get("optimizer", {}))
    model = NetworkWithInputEncoding(
        n_input_dims,
        n_output_dims,
        encoding_config=config.get("encoding", {}),
        network_config=config.get("network", {}),
        precision=precision,
    )
    trainer = Trainer(model, optimizer, loss, seed=seed)
    return TrainableModel(
        model=model, trainer=trainer, loss=loss, optimizer=optimizer
    )

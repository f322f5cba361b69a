"""Network protocol.

TPU-native analogue of ``Network<T> : DifferentiableObject``
(reference: network.h, object.h:154-763). A network is a pure function
``apply(params, x) -> y`` over a slice of the model's flat parameter vector.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..common import default_network_precision


class Network:
    otype = "Network"

    def __init__(self, input_width: int, output_width: int):
        self.input_width = int(input_width)
        self.output_width = int(output_width)
        self.compute_dtype = default_network_precision

    @property
    def padded_output_width(self) -> int:
        raise NotImplementedError

    def required_input_alignment(self) -> int:
        """Alignment the preceding encoding's output must satisfy
        (reference: network.cu:79-98 minimum_alignment)."""
        return 16

    @property
    def n_params(self) -> int:
        raise NotImplementedError

    def layer_sizes(self) -> List[Tuple[int, int]]:
        raise NotImplementedError

    def initialize_params(self, rng, scale: float = 1.0) -> np.ndarray:
        raise NotImplementedError

    def apply(self, params, x):
        """(batch, input_width) -> (batch, padded_output_width), pure."""
        raise NotImplementedError

    def __call__(self, params, x):
        return self.apply(params, x)

    def update_hyperparams(self, params):
        pass

    def hyperparams(self):
        return {"otype": self.otype}

    @property
    def name(self) -> str:
        return type(self).__name__

"""NetworkWithInputEncoding: encoding -> network composition.

(reference: network_with_input_encoding.h). The encoding's output is padded
to the network's required input alignment (:46-53) and feeds the network
directly; under jit, XLA fuses the encoding into the MLP's first layer —
the whole-graph analogue of the reference's RTC JIT fusion (:181-230).

Parameter packing parity: ``[network params | encoding params]`` in that
order (network_with_input_encoding.h:115-130).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import as_dtype
from .encodings import Encoding, create_encoding
from .networks import Network, create_network, minimum_alignment


class NetworkWithInputEncoding:
    def __init__(
        self,
        n_input_dims: int,
        n_output_dims: int,
        encoding_config: Optional[Dict] = None,
        network_config: Optional[Dict] = None,
        encoding: Optional[Encoding] = None,
        precision=None,
    ):
        self.n_input_dims = int(n_input_dims)
        self.n_output_dims = int(n_output_dims)
        self.compute_dtype = as_dtype(precision)

        if encoding is None:
            encoding = create_encoding(
                n_input_dims,
                encoding_config,
                alignment=minimum_alignment(network_config),
            )
        else:
            encoding.set_alignment(minimum_alignment(network_config))
        self.encoding = encoding
        self.encoding.output_dtype = self.compute_dtype

        self.network = create_network(
            self.encoding.padded_output_width, n_output_dims, network_config
        )
        self.network.compute_dtype = self.compute_dtype

    # -- widths ---------------------------------------------------------------
    @property
    def input_width(self) -> int:
        return self.n_input_dims

    @property
    def padded_output_width(self) -> int:
        return self.network.padded_output_width

    @property
    def output_width(self) -> int:
        return self.padded_output_width

    # -- parameters -------------------------------------------------------------
    @property
    def n_params(self) -> int:
        return self.network.n_params + self.encoding.n_params

    def layer_sizes(self) -> List[Tuple[int, int]]:
        # Network weight matrices are the "matrix params"; encoding params
        # (e.g. the hash table) are non-matrix params. Network params sit
        # first in the flat vector, which the optimizers' matrix/non-matrix
        # split relies on (adam.h:78-95).
        return self.network.layer_sizes()

    def initialize_params(self, rng, scale: float = 1.0) -> np.ndarray:
        return np.concatenate(
            [
                self.network.initialize_params(rng, scale),
                self.encoding.initialize_params(rng, scale),
            ]
        )

    def _split(self, params):
        if isinstance(params, dict):
            # Structured (split-grid-state) params: the network part and
            # the per-level encoding arrays are separate buffers — no
            # in-graph slicing of a global vector
            # (Trainer(split_grid_state=True)).
            return params["net"], params["levels"]
        n_net = self.network.n_params
        return params[:n_net], params[n_net:]

    # -- compute -------------------------------------------------------------
    def apply(self, params, x, **encoding_kwargs):
        net_params, enc_params = self._split(params)
        encoded = self.encoding.apply(enc_params, x, **encoding_kwargs)
        return self.network.apply(net_params, encoded)

    def apply_raster(self, params, side: int, **encoding_kwargs):
        """Forward over the ``side^d`` tile-center raster using the
        encoding's static-index serving fast path (see
        ``GridEncoding.apply_raster``); the network runs unchanged on the
        encoded features."""
        net_params, enc_params = self._split(params)
        encoded = self.encoding.apply_raster(enc_params, side, **encoding_kwargs)
        return self.network.apply(net_params, encoded)

    def __call__(self, params, x):
        return self.apply(params, x)

    def input_gradient(self, params, x, output_index: int):
        """d output[:, output_index] / d x — the reference computes this by
        backpropagating a one-hot dL_dy (object.h:592-616); here it is a
        direct jax.vjp."""
        out, vjp = jax.vjp(lambda xx: self.apply(params, xx), x)
        onehot = jnp.zeros_like(out).at[:, output_index].set(1.0)
        return vjp(onehot)[0]

    # -- config surface --------------------------------------------------------
    def update_hyperparams(self, params):
        self.encoding.update_hyperparams(params.get("encoding", {}))
        self.network.update_hyperparams(params.get("network", {}))

    def hyperparams(self):
        return {
            "otype": "NetworkWithInputEncoding",
            "encoding": self.encoding.hyperparams(),
            "network": self.network.hyperparams(),
        }

"""Encoding protocol.

TPU-native analogue of ``Encoding<T> : DifferentiableObject``
(reference: include/tiny-cuda-nn/encoding.h:39-73). An encoding is a pure
function ``apply(params, x) -> y`` over a slice of the model's flat parameter
vector; JAX autodiff provides backward and double-backward (the reference
hand-writes those kernels; here ``jax.grad ∘ jax.grad`` subsumes
``backward_backward_input_impl``).

Layout convention: batch-leading row-major ``(batch, dim)`` everywhere (the
reference's CM/AoS vs RM/SoA distinction does not exist on TPU — XLA owns
physical layout).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..common import default_network_precision, next_multiple


class Encoding:
    """Base encoding.

    Attributes:
      n_dims_to_encode: input width consumed.
      n_output_dims: natural (unpadded) output width.
      n_to_pad: extra output lanes appended (or, for SH, prepended) so the
        output width matches the network's required input alignment.
      pad_value: value written into padding lanes (1.0 for fixed encodings —
        identity.h:62-63, oneblob.h:208-228 — and 0.0 for grid — grid.h:757-767).
      output_dtype: dtype of the encoded output fed to the network.
    """

    otype = "Encoding"
    pad_value = 1.0

    def __init__(self, n_dims_to_encode: int):
        self.n_dims_to_encode = int(n_dims_to_encode)
        self.n_output_dims = 0
        self.n_to_pad = 0
        self.output_dtype = default_network_precision

    # -- widths ------------------------------------------------------------
    @property
    def input_width(self) -> int:
        return self.n_dims_to_encode

    @property
    def output_width(self) -> int:
        return self.padded_output_width

    @property
    def padded_output_width(self) -> int:
        return self.n_output_dims + self.n_to_pad

    def set_padded_output_width(self, padded_output_width: int):
        if padded_output_width < self.n_output_dims:
            raise ValueError(
                f"{self.otype}: padded output width {padded_output_width} < "
                f"natural width {self.n_output_dims}"
            )
        self.n_to_pad = padded_output_width - self.n_output_dims

    def required_output_alignment(self) -> int:
        return 1

    def set_alignment(self, alignment: int):
        self.set_padded_output_width(
            next_multiple(self.padded_output_width, alignment)
        )

    # -- parameters ---------------------------------------------------------
    @property
    def n_params(self) -> int:
        return 0

    def layer_sizes(self) -> List[Tuple[int, int]]:
        """Weight-matrix shapes for the optimizer's matrix/non-matrix split.

        Encodings have none by default; notably the grid's params are
        intentionally *not* reported so Adam treats them as non-matrix params
        (reference: grid.h:1101-1105).
        """
        return []

    def initialize_params(self, rng, scale: float = 1.0) -> np.ndarray:
        return np.zeros((0,), dtype=np.float32)

    # -- compute -------------------------------------------------------------
    def apply(self, params: Optional[jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
        """Encode ``x`` of shape (batch, n_dims_to_encode) to
        (batch, padded_output_width) in ``output_dtype``. Pure & traceable."""
        raise NotImplementedError

    def _pad(self, y: jnp.ndarray) -> jnp.ndarray:
        """Append padding lanes and cast to the output dtype."""
        if self.n_to_pad > 0:
            pad = jnp.full((y.shape[0], self.n_to_pad), self.pad_value, y.dtype)
            y = jnp.concatenate([y, pad], axis=1)
        return y.astype(self.output_dtype)

    def apply_raster(self, params, side, **kwargs):
        """Encode the tile-center raster (the
        ``utils.sampling.raster_centers`` layout: sample ``j`` is the center
        of raster tile ``j``, dim 0 fastest; ``side`` int or per-dim tuple).
        Subclasses with static-index fast paths override this (see
        ``GridEncoding.apply_raster``); the default materializes the
        positions and applies normally."""
        from ..utils.sampling import raster_centers

        x = jnp.asarray(raster_centers(side, self.n_dims_to_encode))
        return self.apply(params, x, **kwargs)

    def __call__(self, params, x):
        return self.apply(params, x)

    # -- config surface -----------------------------------------------------
    def update_hyperparams(self, params):
        pass

    def hyperparams(self):
        return {"otype": self.otype}

    @property
    def name(self) -> str:
        return type(self).__name__

"""Flax linen wrappers.

The reference ships torch ``nn.Module`` bindings (bindings/torch); the JAX
ecosystem's analogue is a Flax module. These wrap the same pure functions —
the flat parameter vector becomes a single Flax param named ``"tcnn_params"``,
so tcnn checkpoints remain interchangeable.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

try:
    import flax.linen as nn
except Exception:  # pragma: no cover - flax is in the base image
    nn = None

from .encodings import create_encoding
from .network_with_input_encoding import NetworkWithInputEncoding as _NWIE
from .rng import make_rng

if nn is not None:

    class TcnnNetworkWithInputEncoding(nn.Module):
        """encoding + network as one Flax module.

        Example:
            m = TcnnNetworkWithInputEncoding(2, 3, enc_cfg, net_cfg)
            variables = m.init(jax.random.PRNGKey(0), x)
            y = m.apply(variables, x)
        """

        n_input_dims: int
        n_output_dims: int
        encoding_config: Dict[str, Any]
        network_config: Dict[str, Any]
        seed: int = 1337

        def setup(self):
            self._model = _NWIE(
                self.n_input_dims,
                self.n_output_dims,
                encoding_config=dict(self.encoding_config),
                network_config=dict(self.network_config),
            )
            model = self._model
            seed = self.seed

            def init_fn(rng_key, shape):
                # tcnn-deterministic init (pcg32 from `seed`); the Flax RNG
                # key is ignored on purpose for reference parity.
                return jnp.asarray(model.initialize_params(make_rng(seed)))

            self.params_vector = self.param(
                "tcnn_params", init_fn, (self._model.n_params,)
            )

        def __call__(self, x):
            return self._model.apply(self.params_vector, x)

    class TcnnEncoding(nn.Module):
        """Standalone encoding as a Flax module."""

        n_input_dims: int
        encoding_config: Dict[str, Any]
        seed: int = 1337
        dtype: Any = jnp.float32

        def setup(self):
            self._encoding = create_encoding(
                self.n_input_dims, dict(self.encoding_config), alignment=1
            )
            self._encoding.output_dtype = self.dtype
            enc, seed = self._encoding, self.seed

            def init_fn(rng_key, shape):
                return jnp.asarray(enc.initialize_params(make_rng(seed)))

            if enc.n_params > 0:
                self.params_vector = self.param(
                    "tcnn_params", init_fn, (enc.n_params,)
                )
            else:
                self.params_vector = None

        def __call__(self, x):
            return self._encoding.apply(self.params_vector, x)

    __all__ = ["TcnnNetworkWithInputEncoding", "TcnnEncoding"]
else:  # pragma: no cover
    __all__ = []

"""Drop-in module API mirroring the reference's torch bindings.

(reference: bindings/torch/tinycudann/modules.py). The classes expose the
same constructor signatures and attributes (``n_input_dims``,
``n_output_dims``, ``params``, seeded init, config dicts); ``__call__`` runs
the jitted forward. For gradient-based use they are thin stateful wrappers —
the pure function is ``module.apply(params, x)``, which plugs directly into
``jax.grad``/``jax.vjp`` (including double-backward, which the reference
needs a dedicated autograd function for, modules.py:173-201).

Batch handling parity: inputs are padded to BATCH_SIZE_GRANULARITY, run,
and sliced back (modules.py:217-233), so any batch size works.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .common import BATCH_SIZE_GRANULARITY, as_dtype, next_multiple
from .encodings import create_encoding
from .network_with_input_encoding import NetworkWithInputEncoding as _NWIE
from .rng import make_rng


class Module:
    """Common wrapper: owns a flat fp32 ``params`` vector + jitted apply."""

    def __init__(self, seed: int = 1337):
        self._jit_apply = None
        self.seed = seed

    # -- implemented by subclasses -------------------------------------------
    @property
    def n_params(self) -> int:
        return self._n_params

    def apply(self, params, x):
        """Pure forward: (params, (B, n_input_dims)) -> (B, padded_width)."""
        raise NotImplementedError

    # -- shared ------------------------------------------------------------
    def _init(self, n_params: int, initializer):
        self._n_params = n_params
        self.params = jnp.asarray(initializer(make_rng(self.seed)), jnp.float32)

    def __call__(self, x, params: Optional[jnp.ndarray] = None):
        if self._jit_apply is None:
            self._jit_apply = jax.jit(self.apply)
        if params is None:
            params = self.params
        batch = x.shape[0]
        padded = next_multiple(batch, BATCH_SIZE_GRANULARITY)
        if padded != batch:
            x = jnp.pad(x, ((0, padded - batch), (0, 0)))
        out = self._jit_apply(params, x)
        if padded != batch:
            out = out[:batch]
        return out

    # pickling support (modules.py:235-245)
    def __getstate__(self):
        state = self.__dict__.copy()
        state["_jit_apply"] = None
        state["params"] = np.asarray(self.params)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self.params = jnp.asarray(self.params)


class NetworkWithInputEncoding(Module):
    """(reference: modules.py:262-315)"""

    def __init__(
        self,
        n_input_dims: int,
        n_output_dims: int,
        encoding_config: Dict,
        network_config: Dict,
        seed: int = 1337,
        precision=None,
    ):
        super().__init__(seed)
        self.n_input_dims = n_input_dims
        self.n_output_dims = n_output_dims
        self.encoding_config = encoding_config
        self.network_config = network_config
        self._model = _NWIE(
            n_input_dims,
            n_output_dims,
            encoding_config=encoding_config,
            network_config=network_config,
            precision=precision,
        )
        self._init(self._model.n_params, self._model.initialize_params)

    def apply(self, params, x):
        return self._model.apply(params, x)

    @property
    def padded_output_width(self):
        return self._model.padded_output_width


class Network(Module):
    """Network without an encoding (reference: modules.py:317-349; the C++
    side realizes it as Identity encoding + network, cpp_api.cu:160-162)."""

    def __init__(
        self,
        n_input_dims: int,
        n_output_dims: int,
        network_config: Dict,
        seed: int = 1337,
        precision=None,
    ):
        super().__init__(seed)
        self.n_input_dims = n_input_dims
        self.n_output_dims = n_output_dims
        self.network_config = network_config
        self._model = _NWIE(
            n_input_dims,
            n_output_dims,
            encoding_config={"otype": "Identity"},
            network_config=network_config,
            precision=precision,
        )
        self._init(self._model.n_params, self._model.initialize_params)

    def apply(self, params, x):
        return self._model.apply(params, x)

    @property
    def padded_output_width(self):
        return self._model.padded_output_width


class Encoding(Module):
    """Standalone encoding module (reference: modules.py:351-382).

    ``dtype`` controls the output precision; float32 by default like the
    reference's fp32-encoding variant (cpp_api.cu:165-174).
    """

    def __init__(
        self,
        n_input_dims: int,
        encoding_config: Dict,
        seed: int = 1337,
        dtype=jnp.float32,
    ):
        super().__init__(seed)
        self.n_input_dims = n_input_dims
        self.encoding_config = encoding_config
        self._encoding = create_encoding(n_input_dims, encoding_config,
                                         alignment=1)
        self._encoding.output_dtype = as_dtype(dtype)
        self._init(self._encoding.n_params, self._encoding.initialize_params)
        self.n_output_dims = self._encoding.padded_output_width

    def apply(self, params, x):
        return self._encoding.apply(params if self._encoding.n_params else None, x)


def free_temporary_memory():
    """API-parity no-op: XLA owns device memory; there is no arena to free
    (reference: tinycudann.free_temporary_memory)."""
    return None

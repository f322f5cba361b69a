"""PyTorch bindings: tinycudann-style ``torch.nn.Module``s backed by the
tcnn_tpu JAX/TPU compute path.

The reference's primary consumer surface is its torch extension
(reference: bindings/torch/tinycudann/modules.py — ``Encoding``,
``Network``, ``NetworkWithInputEncoding`` as autograd-capable
``nn.Module``s). These are the same classes for torch users of THIS
framework: parameters live in a ``torch.nn.Parameter`` (the same flat
fp32 reference-layout vector as everywhere else, so torch-side training
interoperates with our checkpoints), the forward/backward run the jitted
JAX compute path, and gradients — both d/dparams and d/dinput — are the
exact ``jax.vjp`` of the forward (the reference needs a hand-written
``_module_function`` autograd.Function for the same plumbing,
modules.py:63-137).

Bridging: tensors cross via NumPy on the host. torch in this
environment is CPU-only, so one host copy per call is inherent; when the
JAX side runs on a TPU this adds a host<->device transfer per call —
keep torch-side batches coarse, or use the pure-JAX API for
transfer-free training. The backward recomputes the forward inside one
jitted program (the reference's fully-fused backward also recomputes
activations; XLA dedups shared work), which keeps the autograd bridge
stateless — nothing device-side is held between forward and backward,
so torch's free ordering of backward calls is safe.

Second-order autograd (grad-of-grad through the bridge) is not wired to
torch; the JAX-side ``module.apply`` supports it natively
(tests/test_second_order.py).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

try:  # torch is optional for the rest of the package
    import torch
except ImportError:  # pragma: no cover - torch is baked into this image
    torch = None

from .common import BATCH_SIZE_GRANULARITY, next_multiple
from . import modules as _jax_modules


def _require_torch():
    if torch is None:
        raise ImportError(
            "tcnn_tpu.torch_modules requires PyTorch (import torch failed)"
        )


class _ApplyFn(torch.autograd.Function if torch is not None else object):
    """Autograd bridge: forward/backward through the jitted JAX apply.

    (reference: bindings/torch/tinycudann/modules.py:63-137 — the
    ``_module_function`` analogue; here the backward is jax.vjp, so the
    params/input gradients are exact by construction.)
    """

    @staticmethod
    def forward(ctx, host, params, x):
        ctx.host = host
        ctx.save_for_backward(params, x)
        y = host._fwd_np(
            params.detach().cpu().numpy(), x.detach().cpu().numpy()
        )
        return torch.from_numpy(y).to(x.device)

    @staticmethod
    def backward(ctx, grad_y):
        params, x = ctx.saved_tensors
        gp, gx = ctx.host._bwd_np(
            params.detach().cpu().numpy(),
            x.detach().cpu().numpy(),
            grad_y.detach().cpu().contiguous().numpy(),
        )
        return (
            None,
            torch.from_numpy(gp).to(params.device),
            torch.from_numpy(gx).to(x.device),
        )


class _TorchModule(torch.nn.Module if torch is not None else object):
    """Shared wrapper: flat fp32 Parameter + shape-cached jitted programs."""

    def __init__(self, native: "_jax_modules.Module"):
        _require_torch()
        super().__init__()
        self._native = native
        self.n_input_dims = int(native.n_input_dims)
        self.n_output_dims = int(native.n_output_dims)
        self.params = torch.nn.Parameter(
            torch.from_numpy(
                np.array(native.params, dtype=np.float32, copy=True)
            )
        )
        self._fwd_jits: Dict = {}
        self._bwd_jits: Dict = {}

    # -- jitted programs, cached per padded batch shape ---------------------
    def _programs(self, shape):
        fwd = self._fwd_jits.get(shape)
        if fwd is None:
            import jax

            n_out = self.n_output_dims
            apply = self._native.apply

            def f(p, xx):
                # Networks may emit bf16 (reference output-dtype parity);
                # the torch surface is float32, and a f32 output makes the
                # vjp cotangent f32 too.
                import jax.numpy as jnp

                return apply(p, xx)[:, :n_out].astype(jnp.float32)

            fwd = self._fwd_jits[shape] = jax.jit(f)
            self._bwd_jits[shape] = jax.jit(
                lambda p, xx, gy: jax.vjp(f, p, xx)[1](gy)
            )
        return fwd, self._bwd_jits[shape]

    def _pad(self, x_np):
        batch = x_np.shape[0]
        padded = next_multiple(batch, BATCH_SIZE_GRANULARITY)
        if padded != batch:
            x_np = np.pad(x_np, ((0, padded - batch), (0, 0)))
        return x_np, batch

    def _fwd_np(self, params_np, x_np):
        x_np, batch = self._pad(x_np.astype(np.float32, copy=False))
        fwd, _ = self._programs(x_np.shape)
        y = np.asarray(fwd(params_np, x_np), dtype=np.float32)
        return np.ascontiguousarray(y[:batch])

    def _bwd_np(self, params_np, x_np, gy_np):
        x_np, batch = self._pad(x_np.astype(np.float32, copy=False))
        if x_np.shape[0] != batch:
            # Padded rows contribute nothing: their cotangent is zero.
            gy_np = np.pad(
                gy_np.astype(np.float32, copy=False),
                ((0, x_np.shape[0] - batch), (0, 0)),
            )
        _, bwd = self._programs(x_np.shape)
        gp, gx = bwd(params_np, x_np, gy_np.astype(np.float32, copy=False))
        return (
            np.asarray(gp, dtype=np.float32),
            np.ascontiguousarray(np.asarray(gx, dtype=np.float32)[:batch]),
        )

    def forward(self, x):
        if x.shape[-1] != self.n_input_dims:
            raise ValueError(
                f"input has {x.shape[-1]} dims, module expects "
                f"{self.n_input_dims}"
            )
        return _ApplyFn.apply(self, self.params, x.float())

    def extra_repr(self) -> str:
        return (
            f"n_input_dims={self.n_input_dims}, "
            f"n_output_dims={self.n_output_dims}, "
            f"n_params={self.params.numel()}"
        )


class NetworkWithInputEncoding(_TorchModule):
    """(reference: bindings/torch/tinycudann/modules.py:262-315)"""

    def __init__(
        self,
        n_input_dims: int,
        n_output_dims: int,
        encoding_config: Dict,
        network_config: Dict,
        seed: int = 1337,
    ):
        _require_torch()
        super().__init__(
            _jax_modules.NetworkWithInputEncoding(
                n_input_dims, n_output_dims, encoding_config,
                network_config, seed=seed,
            )
        )


class Network(_TorchModule):
    """(reference: bindings/torch/tinycudann/modules.py:318-341)"""

    def __init__(
        self,
        n_input_dims: int,
        n_output_dims: int,
        network_config: Dict,
        seed: int = 1337,
    ):
        _require_torch()
        super().__init__(
            _jax_modules.Network(
                n_input_dims, n_output_dims, network_config, seed=seed
            )
        )


class Encoding(_TorchModule):
    """(reference: bindings/torch/tinycudann/modules.py:344-372).
    ``n_output_dims`` is the encoding's padded output width, matching
    the reference's ``Encoding.n_output_dims``."""

    def __init__(
        self,
        n_input_dims: int,
        encoding_config: Dict,
        seed: int = 1337,
        dtype=None,  # parity arg; outputs are always float32 here
    ):
        _require_torch()
        super().__init__(
            _jax_modules.Encoding(n_input_dims, encoding_config, seed=seed)
        )

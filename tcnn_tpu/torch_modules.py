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

Second-order autograd IS wired through the bridge: the first
``autograd.Function``'s backward invokes a second Function whose own
backward runs the JAX vjp-of-the-vjp, mirroring the reference's
``_module_function_backward`` (reference: bindings/torch/tinycudann/
modules.py:161-201) — except every second-order term is exact here
(the reference documents several unsupported terms,
scripts/test_grid_bwdbwd.py:168-193). ``gradcheck``/``gradgradcheck``
pass through these modules (tests/test_torch_bindings.py). Third-order
autograd raises a clear error (``once_differentiable``), one order past
the reference.

Bridging: tensors cross via NumPy on the host. torch in this
environment is CPU-only, so when the JAX side runs on a TPU one
host<->device transfer per call is inherent — keep torch-side batches
coarse, or use the pure-JAX API for transfer-free training. When the
JAX compute backend is the CPU (shared host memory), inputs are imported
zero-copy via DLPack; outputs returned to torch are always fresh owned
buffers (torch tensors are mutable — aliasing JAX's immutable buffers
into module outputs or ``param.grad`` would be undefined behavior under
in-place ops or gradient accumulation). The backward recomputes the
forward inside one jitted program (the reference's fully-fused backward
also recomputes activations; XLA dedups shared work), which keeps the
autograd bridge stateless — nothing device-side is held between forward
and backward, so torch's free ordering of backward calls is safe.
"""

from __future__ import annotations

import warnings
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


def _np(t) -> np.ndarray:
    """torch tensor -> float32 numpy (zero-copy view for CPU tensors)."""
    return t.detach().cpu().contiguous().numpy().astype(
        np.float32, copy=False
    )


class _ApplyFn(torch.autograd.Function if torch is not None else object):
    """Autograd bridge: forward through the jitted JAX apply; backward
    defers to :class:`_ApplyFnBackward` so the returned gradients carry
    graph under ``create_graph=True`` (reference:
    bindings/torch/tinycudann/modules.py:132-171)."""

    @staticmethod
    def forward(ctx, host, params, x):
        ctx.host = host
        ctx.save_for_backward(params, x)
        y = host._fwd_np(_np(params), _np(x))
        return host._to_torch(y, x.device)

    @staticmethod
    def backward(ctx, grad_y):
        params, x = ctx.saved_tensors
        gp, gx = _ApplyFnBackward.apply(ctx.host, params, x, grad_y)
        return None, gp, gx


class _ApplyFnBackward(
    torch.autograd.Function if torch is not None else object
):
    """Second-order bridge (reference: _module_function_backward,
    bindings/torch/tinycudann/modules.py:161-201). Its forward IS the
    first-order backward; its backward is the exact JAX vjp of that
    backward — covering every d2/dparams2, d2/dinput2 and mixed term."""

    @staticmethod
    def forward(ctx, host, params, x, grad_y):
        ctx.host = host
        ctx.save_for_backward(params, x, grad_y)
        gp, gx = host._bwd_np(_np(params), _np(x), _np(grad_y))
        return (
            host._to_torch(gp, params.device),
            host._to_torch(gx, x.device),
        )

    @staticmethod
    @torch.autograd.function.once_differentiable
    def backward(ctx, cot_gp, cot_gx):
        params, x, grad_y = ctx.saved_tensors
        cgp = (
            np.zeros(params.shape, np.float32)
            if cot_gp is None
            else _np(cot_gp)
        )
        cgx = (
            np.zeros(x.shape, np.float32) if cot_gx is None else _np(cot_gx)
        )
        dp, dx, dgy = ctx.host._bwdbwd_np(
            _np(params), _np(x), _np(grad_y), cgp, cgx
        )
        return (
            None,
            ctx.host._to_torch(dp, params.device),
            ctx.host._to_torch(dx, x.device),
            ctx.host._to_torch(dgy, grad_y.device),
        )


class _TorchModule(torch.nn.Module if torch is not None else object):
    """Shared wrapper: flat fp32 Parameter + shape-cached jitted programs."""

    # Bounded like serving.FrozenServer's program caches: a caller
    # streaming many distinct (post-padding) batch shapes must not grow
    # compiled programs without limit.
    _CACHE_MAX = 32

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
        self._jits: Dict = {}

    # -- host<->framework bridges -------------------------------------------
    @staticmethod
    def _to_torch(a, device):
        """JAX/numpy result -> torch tensor that OWNS its memory.

        ``np.asarray`` of a JAX CPU array is a read-only zero-copy view
        of the live buffer; wrapping that in ``torch.from_numpy`` and
        handing it out as a module output or gradient is UB the moment
        torch writes in place (in-place ops on outputs, ``.grad``
        accumulation on a second ``backward()``). Copy once, always.
        """
        return torch.from_numpy(
            np.array(a, dtype=np.float32, copy=True)
        ).to(device)

    @staticmethod
    def _to_device(a_np: np.ndarray):
        """Zero-copy DLPack import when JAX computes on the host CPU.

        torch-CPU -> numpy is already a view; importing that view via
        DLPack hands JAX the same memory without its usual ingest copy.
        On non-CPU backends (the TPU path) the transfer is inherent and
        the numpy array is passed through unchanged.
        """
        import jax

        if jax.default_backend() == "cpu":
            try:
                return jax.dlpack.from_dlpack(a_np)
            except Exception:  # read-only views, odd strides: fall through
                pass
        return a_np

    # -- jitted programs, cached per padded batch shape ---------------------
    def _programs(self, shape):
        entry = self._jits.get(shape)
        if entry is None:
            import jax

            if len(self._jits) >= self._CACHE_MAX:
                self._jits.pop(next(iter(self._jits)))

            n_out = self.n_output_dims
            apply = self._native.apply

            def f(p, xx):
                # Networks may emit bf16 (reference output-dtype parity);
                # the torch surface is float32, and a f32 output makes the
                # vjp cotangent f32 too.
                import jax.numpy as jnp

                return apply(p, xx)[:, :n_out].astype(jnp.float32)

            def bwd_f(p, xx, gy):
                return jax.vjp(f, p, xx)[1](gy)

            entry = self._jits[shape] = {
                "fwd": jax.jit(f),
                "bwd": jax.jit(bwd_f),
                "bwdbwd": jax.jit(
                    lambda p, xx, gy, cgp, cgx: jax.vjp(bwd_f, p, xx, gy)[
                        1
                    ]((cgp, cgx))
                ),
            }
        return entry

    def _pad(self, x_np):
        batch = x_np.shape[0]
        padded = next_multiple(batch, BATCH_SIZE_GRANULARITY)
        if padded != batch:
            x_np = np.pad(x_np, ((0, padded - batch), (0, 0)))
        return x_np, batch

    def _fwd_np(self, params_np, x_np):
        x_np, batch = self._pad(x_np)
        fwd = self._programs(x_np.shape)["fwd"]
        y = np.asarray(
            fwd(self._to_device(params_np), self._to_device(x_np))
        )
        return y[:batch]

    def _bwd_np(self, params_np, x_np, gy_np):
        x_np, batch = self._pad(x_np)
        if x_np.shape[0] != batch:
            # Padded rows contribute nothing: their cotangent is zero.
            gy_np = np.pad(gy_np, ((0, x_np.shape[0] - batch), (0, 0)))
        bwd = self._programs(x_np.shape)["bwd"]
        gp, gx = bwd(
            self._to_device(params_np),
            self._to_device(x_np),
            self._to_device(gy_np),
        )
        return np.asarray(gp), np.asarray(gx)[:batch]

    def _bwdbwd_np(self, params_np, x_np, gy_np, cgp_np, cgx_np):
        x_np, batch = self._pad(x_np)
        if x_np.shape[0] != batch:
            pad = ((0, x_np.shape[0] - batch), (0, 0))
            gy_np = np.pad(gy_np, pad)
            cgx_np = np.pad(cgx_np, pad)
        bwdbwd = self._programs(x_np.shape)["bwdbwd"]
        dp, dx, dgy = bwdbwd(
            self._to_device(params_np),
            self._to_device(x_np),
            self._to_device(gy_np),
            self._to_device(cgp_np),
            self._to_device(cgx_np),
        )
        return np.asarray(dp), np.asarray(dx)[:batch], np.asarray(dgy)[:batch]

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
        if dtype is not None and dtype != torch.float32:
            warnings.warn(
                f"tcnn_tpu.torch_modules.Encoding ignores dtype={dtype}: "
                "outputs are always float32 on this backend (the "
                "reference's precision parity lives in the JAX-side "
                "table_dtype/network dtypes, not the torch surface)."
            )
        super().__init__(
            _jax_modules.Encoding(n_input_dims, encoding_config, seed=seed)
        )

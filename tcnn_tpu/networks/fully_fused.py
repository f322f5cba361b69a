"""FullyFusedMLP — the flagship network, backed by the Pallas kernel.

(reference: networks/fully_fused_mlp.h, src/fully_fused_mlp.cu). Supported
widths are {16, 32, 64, 128} like the reference (fully_fused_mlp.cu:895-898);
parameter layout, initialization, and JSON surface are identical to MLP —
only the execution strategy differs (one Pallas kernel with VMEM-resident
weights instead of an XLA matmul chain).
"""

from __future__ import annotations

import contextlib
import threading

from ..common import Activation
from ..ops.ffmlp import ffmlp_apply
from .mlp import MLP

FFMLP_WIDTHS = (16, 32, 64, 128)

# Trace-time serving flag: inference and training want different execution
# strategies (measured, v5e, bench_result_ours.json — the fused kernel wins
# TRAINING at widths >= 32 but same-layout INFERENCE only at 128, where
# the weights no longer fit XLA's fusion appetite; at widths 16-64 the
# packed-I/O serving layout wins every width — see ``apply_packed``, an
# explicit API because its batch layout differs). jit traces once inside
# the context, so the routing bakes into the serving executable.
# Thread-local: a trace running on another thread (e.g. a training re-jit
# racing a serving call) must not pick up this thread's serving flag.
_MODE = threading.local()


def _in_inference_mode() -> bool:
    return getattr(_MODE, "inference", False)


@contextlib.contextmanager
def ffmlp_inference_mode():
    """While active (on this thread), FullyFusedMLP routes ``apply`` with
    the measured inference-optimal strategy (Pallas kernel only at width
    128) instead of the training-optimal one, unless the user forced
    ``use_pallas`` (constructor argument or attribute assignment)."""
    prev = _in_inference_mode()
    _MODE.inference = True
    try:
        yield
    finally:
        _MODE.inference = prev


class FullyFusedMLP(MLP):
    otype = "FullyFusedMLP"

    def __init__(
        self,
        input_width: int,
        output_width: int,
        n_neurons: int = 64,
        n_hidden_layers: int = 5,
        activation: Activation = Activation.ReLU,
        output_activation: Activation = Activation.NONE,
        output_alignment: int = 16,
        use_pallas: bool | None = None,
        layout: str | None = None,
    ):
        if n_neurons not in FFMLP_WIDTHS:
            raise ValueError(
                f"FullyFusedMLP only supports widths {FFMLP_WIDTHS}, got {n_neurons}"
            )
        if input_width % 16 != 0:
            raise ValueError(
                f"FullyFusedMLP requires input width aligned to 16, got {input_width}"
            )
        super().__init__(
            input_width=input_width,
            output_width=output_width,
            n_neurons=n_neurons,
            n_hidden_layers=n_hidden_layers,
            activation=activation,
            output_activation=output_activation,
            output_alignment=output_alignment,
        )
        if layout not in (None, "rm", "cf"):
            raise ValueError(f"FullyFusedMLP layout must be 'rm' or 'cf', got {layout!r}")
        # In-kernel activation layout (ops/ffmlp.DEFAULT_LAYOUT): "cf"
        # keeps the batch in the 128-lane axis (weights-stationary), the
        # measured win for narrow widths; None defers to the module default
        # at apply time so a post-measurement default flip applies.
        self.layout = layout
        self._use_pallas_forced = use_pallas is not None
        if use_pallas is None:
            # Width-aware default (measured, v5e — benchmarks/
            # bench_result_ours.json): with the channel-first layout the
            # fused kernel wins TRAINING at widths >= 32 (1.2-3.8x over
            # the XLA chain); at 16 the chain's fused narrow matmuls are
            # still faster (575M vs 362M elem/s). The rm layout only
            # wins at >= 64 (its narrow MXU passes lose at 32).
            use_pallas = n_neurons >= (64 if layout == "rm" else 32)
        self._use_pallas = use_pallas

    @property
    def use_pallas(self) -> bool:
        return self._use_pallas

    @use_pallas.setter
    def use_pallas(self, value: bool):
        # Attribute assignment is an explicit user override (the forcing
        # pattern the tests use) — honor it in inference mode too.
        self._use_pallas = bool(value)
        self._use_pallas_forced = True

    def apply_packed(self, params, x_packed):
        """Packed-I/O path: ``x_packed`` is ``(batch/G, 128)`` with
        G = 128/input_width samples per row — the layout-free reshape of
        a compact row-major batch. Returns ``(batch/G,
        G*padded_output_width)``; reshape to ``(batch,
        padded_output_width)`` to unpack. Differentiable (first-order
        reverse mode: fused-recompute backward, also fully packed). The
        analogue of the reference's INFERENCE=true kernel
        specialization (src/fully_fused_mlp.cu:682-706) — avoids the
        128/width lane padding that floors narrow-width I/O
        (ops/ffmlp.mlp_forward_pallas_packed)."""
        from ..ops.ffmlp import ffmlp_apply_packed

        dt = self.compute_dtype
        weights_t = tuple(w.astype(dt).T for w in self._weights(params))
        return ffmlp_apply_packed(
            x_packed.astype(dt), weights_t, self.activation,
            self.output_activation,
        )

    def apply(self, params, x):
        use_pallas = self._use_pallas
        if _in_inference_mode() and not self._use_pallas_forced:
            # Inference-optimal routing (see ffmlp_inference_mode).
            use_pallas = self.width >= 128
        if not use_pallas:
            return super().apply(params, x)
        dt = self.compute_dtype
        ws = self._weights(params)
        weights_t = tuple(w.astype(dt).T for w in ws)
        from ..ops.ffmlp import DEFAULT_LAYOUT

        layout = self.layout if self.layout is not None else DEFAULT_LAYOUT
        try:
            return ffmlp_apply(
                x.astype(dt), weights_t, self.activation,
                self.output_activation, layout,
            )
        except (TypeError, ValueError) as e:
            # The fused kernel's custom_vjp supports first-order reverse
            # mode only; forward-mode tracing (jvp -> TypeError naming
            # custom_vjp; grad∘grad -> direct-linearize ValueError — e.g.
            # eikonal SDF losses) raises at bind time. Route those traces
            # to the plain XLA chain, which is differentiable at every
            # order. (The reference has no MLP double-backward at all —
            # object.h:479-483 throws for everything but the grid — so
            # this fallback strictly exceeds reference capability.)
            msg = str(e)
            if "custom_vjp" not in msg and "Linearization failed" not in msg:
                raise
            return super().apply(params, x)

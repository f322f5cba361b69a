"""Losses.

Each loss computes, in one fused elementwise pass (XLA fuses the whole thing
into a single TPU kernel — the analogue of the reference's one-kernel-per-loss
design, e.g. losses/l2.h:40-75):

- per-element loss ``values`` of shape ``(batch, stride)``, normalized by
  ``n_total = batch * dims`` and an optional importance-sampling ``data_pdf``;
- scaled gradients ``dL_dprediction`` of the same shape.

``stride`` is the network's padded output width; lanes ``>= dims`` (padding)
get zero values and gradients (reference: l2.h:56-60). The gradients are
*not* in general the true derivative of the value (relative losses treat
their normalizer as constant), which is why training consumes these explicit
gradients rather than autodiff of the scalar loss.

Factory: ``create_loss(config)`` with case-insensitive ``otype``
(reference: src/loss.cu:53-90; default RelativeL2).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp

from ..common import CIDict, json_value

Array = jnp.ndarray


class Loss:
    """Base class. Subclasses implement ``_value_and_gradient``.

    ``evaluate`` mirrors ``Loss<T>::evaluate`` (reference: loss.h:41-60) in
    batch-leading layout: prediction ``(B, stride)``, target ``(B, dims)``.
    """

    otype = "Loss"

    # True when ``_value_and_gradient`` is a pure per-element map (no row
    # structure), enabling the flat trainer fast path below. Left False on
    # the base class so externally-registered losses keep the safe 2D path.
    # The claim is verified for every REGISTERED loss by
    # tests/test_losses.py::test_sum_and_gradient_matches_evaluate (flat
    # path vs 2D path); external registrants setting elementwise=True
    # should run the same parity check — see _value_and_gradient's
    # contract below.
    elementwise = False

    def _check_shapes(self, prediction: Array, target: Array,
                      data_pdf: Optional[Array]):
        if prediction.ndim != 2 or target.ndim != 2:
            raise ValueError("prediction/target must be (batch, dim) matrices")
        batch, stride = prediction.shape
        tbatch, dims = target.shape
        if tbatch != batch:
            raise ValueError(f"batch mismatch: {batch} vs {tbatch}")
        if dims > stride:
            raise ValueError(f"target dims {dims} exceed prediction stride {stride}")
        if data_pdf is not None and data_pdf.shape != target.shape:
            raise ValueError("data_pdf must have the target's shape")
        return batch, stride, dims

    def evaluate_sum_and_gradient(
        self,
        loss_scale: float,
        prediction: Array,
        target: Array,
        data_pdf: Optional[Array] = None,
    ):
        """Trainer fast path: ``(sum(values), gradients)`` without
        materializing per-element values. Elementwise losses run on FLAT
        ``(batch * dims,)`` vectors: ``(B, dims)`` f32 intermediates with
        dims < 128 are lane-padded to 128 in XLA's row-major TPU layout —
        a 128/dims memory amplification that put the flagship's RelativeL2
        fusion at HBM bandwidth on the padded bytes (717 us/step measured;
        flat vectors tile compactly). Values/gradients are identical to
        ``evaluate`` + ``sum``."""
        if not self.elementwise:
            values, gradients = self.evaluate(
                loss_scale, prediction, target, data_pdf
            )
            return jnp.sum(values), gradients
        batch, stride, dims, pred, tgt, pdf = self._prepare(
            prediction, target, data_pdf
        )
        values, gradient = self._value_and_gradient(
            pred.reshape(-1), tgt.reshape(-1), pdf.reshape(-1), batch * dims
        )
        gradient = gradient.reshape(batch, dims)
        return jnp.sum(values), self._scale_pad_cast(
            gradient, loss_scale, stride - dims, prediction.dtype
        )

    def _prepare(self, prediction, target, data_pdf):
        """Shared input prep for evaluate/evaluate_sum_and_gradient: shape
        checks, the padding slice, fp32 casts, and the all-ones pdf
        default. The two call sites MUST stay in lockstep — both go
        through here (and through _scale_pad_cast below) by design; the
        flat-vs-2D parity test guards the rest."""
        batch, stride, dims = self._check_shapes(prediction, target, data_pdf)
        pred = prediction[:, :dims].astype(jnp.float32)
        tgt = target.astype(jnp.float32)
        pdf = (
            jnp.ones_like(tgt)
            if data_pdf is None
            else data_pdf.astype(jnp.float32)
        )
        return batch, stride, dims, pred, tgt, pdf

    @staticmethod
    def _scale_pad_cast(gradient, loss_scale, pad, dtype):
        """Shared gradient epilogue: loss-scale multiply, zero padding
        lanes (reference: l2.h:56-60), cast to the prediction dtype."""
        gradient = loss_scale * gradient
        if pad > 0:
            gradient = jnp.concatenate(
                [gradient, jnp.zeros((gradient.shape[0], pad), jnp.float32)],
                axis=1,
            )
        return gradient.astype(dtype)

    def evaluate(
        self,
        loss_scale: float,
        prediction: Array,
        target: Array,
        data_pdf: Optional[Array] = None,
    ):
        batch, stride, dims, pred, tgt, pdf = self._prepare(
            prediction, target, data_pdf
        )
        values, gradient = self._value_and_gradient(
            pred, tgt, pdf, batch * dims
        )
        pad = stride - dims
        if pad > 0:
            values = jnp.concatenate(
                [values, jnp.zeros((batch, pad), jnp.float32)], axis=1
            )
        gradients = self._scale_pad_cast(
            gradient, loss_scale, pad, prediction.dtype
        )
        return values, gradients

    def _value_and_gradient(self, pred, target, pdf, n_total):
        """Compute (values, gradient) from fp32 ``pred``/``target``/``pdf``
        of identical shape (no padding lanes), normalized by ``n_total``.

        Contract for ``elementwise = True`` subclasses: this must be a pure
        PER-ELEMENT map — output element [i] depends only on input elements
        [i] — with no row structure (no cross-column terms, no shape
        inspection), because the trainer fast path calls it on flat
        ``(batch * dims,)`` vectors. Losses with row structure (e.g.
        RelativeL2Luminance's per-row luminance normalizer) must leave
        ``elementwise = False``. Registered losses are parity-checked
        flat-vs-2D in tests/test_losses.py."""
        raise NotImplementedError

    # Config surface (reference: object.h:50-55)
    def update_hyperparams(self, params):
        pass

    def hyperparams(self):
        return {"otype": self.otype}


class L2Loss(Loss):
    """(reference: losses/l2.h:40-75)"""

    otype = "L2"
    elementwise = True

    def _value_and_gradient(self, pred, target, pdf, n_total):
        diff = pred - target
        values = diff * diff / pdf / n_total
        gradient = 2.0 * diff / pdf / n_total
        return values, gradient


class RelativeL2Loss(Loss):
    """L2 normalized by prediction^2 + 0.01 (reference: losses/relative_l2.h:40-78)."""

    otype = "RelativeL2"
    elementwise = True

    def _value_and_gradient(self, pred, target, pdf, n_total):
        norm = pred * pred + 0.01
        diff = pred - target
        values = diff * diff / norm / pdf / n_total
        gradient = 2.0 * diff / norm / pdf / n_total
        return values, gradient


class RelativeL2LuminanceLoss(Loss):
    """RelativeL2 normalized by predicted RGB luminance
    (reference: losses/relative_l2_luminance.h:40-88). Expects dims >= 3; with
    dims >= 6 the first two RGB triplets are summed before the luminance.
    """

    otype = "RelativeL2Luminance"

    def _value_and_gradient(self, pred, target, pdf, n_total):
        dims = pred.shape[1]
        if dims < 3:
            raise ValueError("RelativeL2Luminance requires at least 3 output dims")
        r, g, b = pred[:, 0], pred[:, 1], pred[:, 2]
        if dims >= 6:
            r = r + pred[:, 3]
            g = g + pred[:, 4]
            b = b + pred[:, 5]
        luminance = 0.299 * r + 0.587 * g + 0.114 * b
        norm = (luminance * luminance + 0.01)[:, None]
        diff = pred - target
        values = diff * diff / norm / pdf / n_total
        gradient = 2.0 * diff / norm / pdf / n_total
        return values, gradient


class L1Loss(Loss):
    """(reference: losses/l1.h)"""

    otype = "L1"
    elementwise = True

    def _value_and_gradient(self, pred, target, pdf, n_total):
        diff = pred - target
        values = jnp.abs(diff) / pdf / n_total
        gradient = jnp.where(diff >= 0, 1.0, -1.0) / pdf / n_total
        return values, gradient


class RelativeL1Loss(Loss):
    """L1 normalized by |prediction| + 0.01 (reference: losses/relative_l1.h)."""

    otype = "RelativeL1"
    elementwise = True

    def _value_and_gradient(self, pred, target, pdf, n_total):
        diff = pred - target
        scale = 1.0 / (jnp.abs(pred) + 1e-2) / pdf
        values = jnp.abs(diff) * scale / n_total
        gradient = jnp.where(diff >= 0, scale, -scale) / n_total
        return values, gradient


class MapeLoss(Loss):
    """Mean absolute percentage error (reference: losses/mape.h)."""

    otype = "Mape"
    elementwise = True

    def _value_and_gradient(self, pred, target, pdf, n_total):
        diff = pred - target
        scale = 1.0 / (jnp.abs(target) + 1e-2) / pdf
        values = jnp.abs(diff) * scale / n_total
        gradient = jnp.where(diff >= 0, scale, -scale) / n_total
        return values, gradient


class SmapeLoss(Loss):
    """Symmetric MAPE (reference: losses/smape.h)."""

    otype = "Smape"
    elementwise = True

    def _value_and_gradient(self, pred, target, pdf, n_total):
        diff = pred - target
        scale = 1.0 / (0.5 * (jnp.abs(target) + jnp.abs(pred)) + 1e-2) / pdf
        values = jnp.abs(diff) * scale / n_total
        gradient = jnp.where(diff >= 0, scale, -scale) / n_total
        return values, gradient


class CrossEntropyLoss(Loss):
    """-target*log(pred) (reference: losses/cross_entropy.h). The 1/n_total
    normalization is folded into ``factor`` and therefore applies to both the
    value and the gradient, same as every other loss."""

    otype = "CrossEntropy"
    elementwise = True

    def _value_and_gradient(self, pred, target, pdf, n_total):
        factor = -target / pdf / n_total
        values = factor * jnp.log(pred)
        gradient = factor / pred
        return values, gradient


class VarianceIsLoss(Loss):
    """Variance of an importance sampler (reference: losses/variance_is.h)."""

    otype = "Variance"
    elementwise = True

    def _value_and_gradient(self, pred, target, pdf, n_total):
        factor = target * target / pdf / n_total
        values = factor / pred - factor / pdf
        gradient = -factor / (pred * pred)
        return values, gradient


class ConstantLoss(Loss):
    """Constant-gradient debugging loss (reference: losses/constant.h; not
    registered in the factory there either)."""

    otype = "Constant"
    elementwise = True

    def _value_and_gradient(self, pred, target, pdf, n_total):
        values = pred / n_total
        gradient = jnp.ones_like(pred) / n_total
        return values, gradient


_LOSS_FACTORIES: "CIDict" = CIDict()


def register_loss(name: str, factory: Callable[[Dict], Loss]):
    if name in _LOSS_FACTORIES:
        raise RuntimeError(f"Can not register loss '{name}' twice.")
    _LOSS_FACTORIES[name] = factory


for _cls in (
    L2Loss,
    RelativeL2Loss,
    RelativeL2LuminanceLoss,
    L1Loss,
    RelativeL1Loss,
    MapeLoss,
    SmapeLoss,
    CrossEntropyLoss,
    VarianceIsLoss,
):
    register_loss(_cls.otype, lambda cfg, c=_cls: c())


def create_loss(config: Optional[Dict] = None) -> Loss:
    """Factory (reference: src/loss.cu:81-90; default otype RelativeL2)."""
    name = json_value(config, "otype", "RelativeL2")
    if name not in _LOSS_FACTORIES:
        raise ValueError(f"Loss '{name}' not found")
    loss = _LOSS_FACTORIES[name](config or {})
    loss.update_hyperparams(config or {})
    return loss


def builtin_losses():
    return sorted(_LOSS_FACTORIES.keys())

"""Loss tests: formulas vs straight numpy, padding behavior, factory.

Mirrors the role of tests/test_jit_losses.cu (native kernel vs JIT kernel
at 1e-3) with numpy as the second implementation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import tcnn_tpu as tc
from tcnn_tpu.losses import builtin_losses

from utils import match_rae

BATCH, DIMS, STRIDE = 64, 3, 16
LOSS_SCALE = 128.0


def _data(seed=0, positive=False):
    r = np.random.default_rng(seed)
    pred = r.standard_normal((BATCH, STRIDE)).astype(np.float32)
    targ = r.standard_normal((BATCH, DIMS)).astype(np.float32)
    if positive:
        pred = np.abs(pred) + 0.1
        targ = np.abs(targ) + 0.1
    pdf = r.uniform(0.5, 2.0, (BATCH, DIMS)).astype(np.float32)
    return pred, targ, pdf


def _numpy_loss(name, pred, targ, pdf):
    n = BATCH * DIMS
    p = pred[:, :DIMS]
    d = p - targ
    if name == "L2":
        v = d * d / pdf / n
        g = 2 * d / pdf / n
    elif name == "RelativeL2":
        norm = p * p + 0.01
        v = d * d / norm / pdf / n
        g = 2 * d / norm / pdf / n
    elif name == "RelativeL2Luminance":
        lum = 0.299 * p[:, 0] + 0.587 * p[:, 1] + 0.114 * p[:, 2]
        norm = (lum * lum + 0.01)[:, None]
        v = d * d / norm / pdf / n
        g = 2 * d / norm / pdf / n
    elif name == "L1":
        v = np.abs(d) / pdf / n
        g = np.where(d >= 0, 1.0, -1.0) / pdf / n
    elif name == "RelativeL1":
        s = 1 / (np.abs(p) + 1e-2) / pdf
        v = np.abs(d) * s / n
        g = np.where(d >= 0, s, -s) / n
    elif name == "Mape":
        s = 1 / (np.abs(targ) + 1e-2) / pdf
        v = np.abs(d) * s / n
        g = np.where(d >= 0, s, -s) / n
    elif name == "Smape":
        s = 1 / (0.5 * (np.abs(targ) + np.abs(p)) + 1e-2) / pdf
        v = np.abs(d) * s / n
        g = np.where(d >= 0, s, -s) / n
    elif name == "CrossEntropy":
        f = -targ / pdf / n
        v = f * np.log(p)
        g = f / p
    elif name == "Variance":
        f = targ * targ / pdf / n
        v = f / p - f / pdf
        g = -f / (p * p)
    else:
        raise KeyError(name)
    return v, g * LOSS_SCALE


@pytest.mark.parametrize("name", sorted(builtin_losses()))
@pytest.mark.parametrize("with_pdf", [False, True])
def test_loss_matches_numpy(name, with_pdf):
    positive = name.lower() in ("crossentropy", "variance")
    pred, targ, pdf = _data(positive=positive)
    loss = tc.create_loss({"otype": name})
    v, g = loss.evaluate(
        LOSS_SCALE,
        jnp.asarray(pred),
        jnp.asarray(targ),
        jnp.asarray(pdf) if with_pdf else None,
    )
    v, g = np.asarray(v), np.asarray(g, np.float32)
    ref_v, ref_g = _numpy_loss(
        name, pred, targ, pdf if with_pdf else np.ones_like(pdf)
    )
    # Padding lanes must be exactly zero (l2.h:56-60).
    assert (v[:, DIMS:] == 0).all()
    assert (g[:, DIMS:] == 0).all()
    match_rae(v[:, :DIMS], ref_v, 1e-3, percentile=99)
    match_rae(g[:, :DIMS], ref_g, 1e-3, percentile=99)


def test_default_loss_is_relative_l2():
    assert tc.create_loss({}).otype == "RelativeL2"
    assert tc.create_loss(None).otype == "RelativeL2"


def test_case_insensitive_factory():
    assert tc.create_loss({"otype": "relativeL2"}).otype == "RelativeL2"
    assert tc.create_loss({"otype": "SMAPE"}).otype == "Smape"


def test_unknown_loss_raises():
    with pytest.raises(ValueError):
        tc.create_loss({"otype": "DoesNotExist"})


def test_bf16_prediction_gradient_dtype():
    pred, targ, _ = _data()
    loss = tc.create_loss({"otype": "L2"})
    v, g = loss.evaluate(
        128.0, jnp.asarray(pred, jnp.bfloat16), jnp.asarray(targ), None
    )
    assert g.dtype == jnp.bfloat16
    assert v.dtype == jnp.float32


@pytest.mark.parametrize("name", list(builtin_losses()) + ["Constant"])
@pytest.mark.parametrize("with_pdf", [False, True])
def test_sum_and_gradient_matches_evaluate(name, with_pdf):
    """The trainer fast path (flat elementwise compute, no values matrix)
    must agree with evaluate() + sum for every builtin loss."""
    from tcnn_tpu.losses import ConstantLoss, create_loss

    # Constant is intentionally unregistered (reference parity) —
    # instantiate it directly.
    loss = (
        ConstantLoss() if name == "Constant" else create_loss({"otype": name})
    )
    pred, targ, pdf = _data(seed=3, positive=True)
    pdf_arg = jnp.asarray(pdf) if with_pdf else None
    values, grads = loss.evaluate(
        LOSS_SCALE, jnp.asarray(pred), jnp.asarray(targ), pdf_arg
    )
    s, g = loss.evaluate_sum_and_gradient(
        LOSS_SCALE, jnp.asarray(pred), jnp.asarray(targ), pdf_arg
    )
    np.testing.assert_allclose(
        float(s), float(jnp.sum(values)), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(grads), rtol=1e-6, atol=1e-7
    )
    assert g.dtype == grads.dtype

"""Shared test helpers.

``match_rae`` reimplements the reference's symmetric relative-absolute-error
matcher with percentile-based outlier tolerance
(reference: tests/test_common.h:59-122): grid gradients are
piecewise-constant and low-precision math is noisy, so comparisons use the
mean/percentile of RAE rather than elementwise allclose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def check_grads_fd(f, args, eps=1e-3, atol=5e-2, rtol=5e-2, n_dirs=3, seed=0):
    """Directional finite-difference gradient check of a scalar function.

    Replacement for the removed jax.test_util.check_grads: compares
    ``<grad f, v>`` against central differences along random directions v.
    """
    args = tuple(jnp.asarray(a, jnp.float32) for a in args)
    grads = jax.grad(f, argnums=tuple(range(len(args))))(*args)
    r = np.random.default_rng(seed)
    for _ in range(n_dirs):
        dirs = tuple(
            jnp.asarray(r.standard_normal(a.shape), jnp.float32) for a in args
        )
        analytic = sum(float(jnp.vdot(g, d)) for g, d in zip(grads, dirs))
        plus = float(f(*(a + eps * d for a, d in zip(args, dirs))))
        minus = float(f(*(a - eps * d for a, d in zip(args, dirs))))
        numeric = (plus - minus) / (2 * eps)
        err = abs(analytic - numeric)
        tol = atol + rtol * max(abs(analytic), abs(numeric))
        assert err <= tol, (
            f"gradient check failed: analytic {analytic:.6g} vs "
            f"numeric {numeric:.6g} (err {err:.3g} > tol {tol:.3g})"
        )


def rae(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    denom = np.abs(a) + np.abs(b)
    out = np.where(denom == 0, 0.0, 2.0 * np.abs(a - b) / np.where(denom == 0, 1, denom))
    return out


def match_rae(
    a,
    b,
    epsilon: float = 1e-4,
    percentile: float = 100.0,
    mean_only: bool = False,
) -> None:
    e = rae(a, b)
    if mean_only:
        assert e.mean() <= epsilon, f"mean RAE {e.mean():.3e} > {epsilon:.1e}"
        return
    v = np.percentile(e, percentile)
    assert v <= epsilon, (
        f"p{percentile} RAE {v:.3e} > {epsilon:.1e} (mean {e.mean():.3e}, "
        f"max {e.max():.3e})"
    )

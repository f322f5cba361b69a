"""Stochastic interpolation semantics (reference: grid.h:284-299 +
scripts/test_grid_bwdbwd.py's nondet_tol rationale):

- forward identical to full d-linear interpolation;
- table gradient of each (sample, level) lands entirely on ONE corner
  sampled by the interpolation weights; in expectation it equals the full
  interpolation gradient;
- input gradients stay exact (the reference computes them from dy_dx).
"""

import jax
import jax.numpy as jnp
import numpy as np

import tcnn_tpu as tc
from tcnn_tpu.rng import make_rng

CFG = {"otype": "HashGrid", "n_levels": 2, "n_features_per_level": 2,
       "log2_hashmap_size": 12, "base_resolution": 4, "per_level_scale": 2.0,
       "stochastic_interpolation": True}


def _setup():
    enc = tc.create_encoding(2, CFG, 4)
    enc.output_dtype = jnp.float32
    params = jnp.asarray(
        np.random.default_rng(0).standard_normal(enc.n_params).astype(np.float32)
    )
    x = jnp.asarray(np.random.default_rng(1).uniform(0.2, 0.8, (16, 2)),
                    jnp.float32)
    return enc, params, x


def test_forward_unchanged():
    enc, params, x = _setup()
    y_full = np.asarray(enc.apply(params, x))
    y_sto = np.asarray(enc.apply(params, x, rng=jax.random.PRNGKey(0)))
    np.testing.assert_allclose(y_full, y_sto, rtol=1e-6)


def test_gradient_one_corner_and_unbiased():
    enc, params, x = _setup()

    def g_at(key):
        return jax.grad(
            lambda p: enc.apply(p, x, rng=key).sum()
        )(params)

    g_full = jax.grad(lambda p: enc.apply(p, x).sum())(params)

    # single draw: each (sample, level) contributes to exactly one corner
    # => strictly fewer touched entries than full interpolation.
    g1 = np.asarray(g_at(jax.random.PRNGKey(0)))
    assert (g1 != 0).sum() < (np.asarray(g_full) != 0).sum()

    # expectation over many draws approaches the full gradient
    keys = jax.random.split(jax.random.PRNGKey(42), 300)
    avg = np.zeros_like(g1)
    for k in keys:
        avg += np.asarray(g_at(k))
    avg /= len(keys)
    ref = np.asarray(g_full)
    mask = np.abs(ref) > 1e-3
    assert mask.any()
    err = np.abs(avg[mask] - ref[mask]) / np.abs(ref[mask])
    assert np.median(err) < 0.25, np.median(err)


def test_input_gradients_stay_exact():
    enc, params, x = _setup()
    gx_full = np.asarray(
        jax.grad(lambda xx: enc.apply(params, xx).sum())(x)
    )
    gx_sto = np.asarray(
        jax.grad(
            lambda xx: enc.apply(params, xx, rng=jax.random.PRNGKey(3)).sum()
        )(x)
    )
    np.testing.assert_allclose(gx_full, gx_sto, rtol=1e-5, atol=1e-6)


def test_stochastic_with_quad_strategy():
    cfg = dict(CFG, hash="CoherentAdditive", gather_strategy="quad")
    enc = tc.create_encoding(2, cfg, 4)
    enc.output_dtype = jnp.float32
    params = jnp.asarray(
        np.random.default_rng(2).standard_normal(enc.n_params).astype(np.float32)
    )
    x = jnp.asarray(np.random.default_rng(3).uniform(0.2, 0.8, (16, 2)),
                    jnp.float32)
    y_full = np.asarray(enc.apply(params, x))
    y_sto = np.asarray(enc.apply(params, x, rng=jax.random.PRNGKey(0)))
    np.testing.assert_allclose(y_full, y_sto, rtol=1e-6)
    g = jax.grad(
        lambda p: enc.apply(p, x, rng=jax.random.PRNGKey(0)).sum()
    )(params)
    assert np.isfinite(np.asarray(g)).all()

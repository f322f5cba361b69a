"""Quad-row gather strategy: must match the per-level reference path
exactly (same indices by construction — the quad table is a static
re-layout, not an approximation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tcnn_tpu as tc


def _pair(cfg_extra=None, n_dims=2):
    base = dict(
        otype="HashGrid",
        n_levels=8,
        n_features_per_level=2,
        log2_hashmap_size=12,
        base_resolution=4,
        per_level_scale=1.8,
        hash="CoherentAdditive",
    )
    base.update(cfg_extra or {})
    a = tc.create_encoding(n_dims, base, 16)
    b = tc.create_encoding(n_dims, {**base, "gather_strategy": "quad"}, 16)
    a.output_dtype = jnp.float32
    b.output_dtype = jnp.float32
    params = jnp.asarray(
        np.random.default_rng(0).standard_normal(a.n_params).astype(np.float32)
    )
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (64, n_dims)), jnp.float32
    )
    return a, b, params, x


@pytest.mark.parametrize("n_dims", [2, 3])
def test_quad_matches_reference_path_additive_hash(n_dims):
    a, b, params, x = _pair(n_dims=n_dims)
    ya = np.asarray(jax.jit(a.apply)(params, x))
    yb = np.asarray(jax.jit(b.apply)(params, x))
    np.testing.assert_allclose(ya, yb, rtol=1e-6, atol=1e-7)


def test_quad_matches_on_dense_grid():
    a, b, params, x = _pair(
        {"otype": "DenseGrid", "type": "Dense", "n_levels": 4,
         "hash": "CoherentPrime"}  # dense levels never hash: quad still valid
    )
    assert all(s is not None for s in b._corner_strides)
    ya = np.asarray(a.apply(params, x))
    yb = np.asarray(b.apply(params, x))
    np.testing.assert_allclose(ya, yb, rtol=1e-6, atol=1e-7)


def test_quad_gradients_match():
    a, b, params, x = _pair()

    def loss(enc):
        return lambda p: (enc.apply(p, x) ** 2).sum()

    ga = np.asarray(jax.jit(jax.grad(loss(a)))(params))
    gb = np.asarray(jax.jit(jax.grad(loss(b)))(params))
    np.testing.assert_allclose(ga, gb, rtol=1e-5, atol=1e-6)

    # input gradients too
    gxa = np.asarray(jax.grad(lambda xx: a.apply(params, xx).sum())(x))
    gxb = np.asarray(jax.grad(lambda xx: b.apply(params, xx).sum())(x))
    np.testing.assert_allclose(gxa, gxb, rtol=1e-5, atol=1e-6)


def test_quad_falls_back_for_xor_hash():
    """CoherentPrime (XOR) hash levels can't use quad rows; the strategy
    silently falls back per level and results still match."""
    a, b, params, x = _pair({"hash": "CoherentPrime"})
    assert any(s is None for s in b._corner_strides)  # hash levels
    ya = np.asarray(a.apply(params, x))
    yb = np.asarray(b.apply(params, x))
    np.testing.assert_allclose(ya, yb, rtol=1e-6, atol=1e-7)


def test_additive_hash_trains():
    config = {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
        "encoding": {"otype": "HashGrid", "n_levels": 8,
                     "log2_hashmap_size": 14, "base_resolution": 8,
                     "per_level_scale": 1.5, "hash": "CoherentAdditive",
                     "gather_strategy": "quad"},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    }
    model = tc.create_from_config(2, 3, config)
    r = np.random.default_rng(2)
    losses = []
    for _ in range(30):
        xy = r.uniform(0, 1, (1024, 2)).astype(np.float32)
        t = np.stack([np.sin(4 * np.pi * xy[:, 0]) * 0.5 + 0.5,
                      xy[:, 1], (xy[:, 0] + xy[:, 1]) / 2], 1).astype(np.float32)
        losses.append(float(model.training_step(jnp.asarray(xy),
                                                jnp.asarray(t))))
    assert np.mean(losses[-5:]) < 0.5 * np.mean(losses[:5])

"""apply_raster / inference_raster: the full-raster serving path.

Tile-center raster positions satisfy the raster-tile contract by
construction, so a stratified-configured grid serves through the
gather-free static coarse-level path (the fastest known serving form on
TPU — PLAN.md round 2); anything else uses the per-sample fallback. Either
way the results must match ``apply`` on the same positions. The reference
re-runs its training kernels for inference
(samples/mlp_learning_an_image.cu:116-124)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tcnn_tpu as tc
from tcnn_tpu.utils.sampling import raster_centers


def _enc(n_dims, **extra):
    cfg = dict(
        otype="HashGrid",
        n_levels=8,
        n_features_per_level=2,
        log2_hashmap_size=13,
        base_resolution=4,
        per_level_scale=1.6,
        hash="CoherentAdditive",
        gather_strategy="stratified",
    )
    cfg.update(extra)
    e = tc.create_encoding(n_dims, cfg, 16)
    e.output_dtype = jnp.float32
    return e


def _params(e, seed=0):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.standard_normal(e.n_params).astype(np.float32))


@pytest.mark.parametrize(
    "n_dims,side,interp",
    [
        (2, 64, "Linear"),
        (2, 48, "Smoothstep"),
        (3, 16, "Linear"),
        (3, 24, "Smoothstep"),
    ],
)
def test_raster_matches_apply(n_dims, side, interp):
    # Stratified config: the raster path takes the static coarse-level
    # machinery; parity vs the per-sample fallback on the same positions.
    e = _enc(n_dims, interpolation=interp)
    params = _params(e)
    x = jnp.asarray(raster_centers(side, n_dims))
    ref = np.asarray(jax.jit(lambda p: e.apply(p, x, stratified=False))(params))
    fast = np.asarray(jax.jit(lambda p: e.apply_raster(p, side))(params))
    assert np.isfinite(fast).all()  # contract holds -> no NaN poison
    np.testing.assert_allclose(ref, fast, rtol=2e-6, atol=2e-6)


def test_raster_quad_config_falls_back():
    e = _enc(2, gather_strategy="quad")
    params = _params(e, 1)
    side = 32
    x = jnp.asarray(raster_centers(side, 2))
    ref = np.asarray(e.apply(params, x, stratified=False))
    fast = np.asarray(e.apply_raster(params, side))
    np.testing.assert_array_equal(ref, fast)


def test_raster_max_level():
    e = _enc(2)
    params = _params(e, 1)
    side = 32
    x = jnp.asarray(raster_centers(side, 2))
    ref = np.asarray(e.apply(params, x, max_level=0.5, stratified=False))
    fast = np.asarray(e.apply_raster(params, side, max_level=0.5))
    np.testing.assert_allclose(ref, fast, rtol=2e-6, atol=2e-6)


def test_raster_differentiable():
    # The serving path stays differentiable (static slice-scatter adjoints
    # on coarse levels): grads must match the fallback path's.
    e = _enc(2)
    params = _params(e, 3)
    side = 16
    x = jnp.asarray(raster_centers(side, 2))

    ga = jax.grad(lambda p: (e.apply(p, x, stratified=False) ** 2).sum())(params)
    gb = jax.grad(lambda p: (e.apply_raster(p, side) ** 2).sum())(params)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-4, atol=1e-5)


def test_raster_base_encoding_fallback():
    # Non-grid encodings get the base-class fallback.
    e = tc.create_encoding(2, {"otype": "OneBlob", "n_bins": 8}, 8)
    e.output_dtype = jnp.float32
    side = 8
    x = jnp.asarray(raster_centers(side, 2))
    np.testing.assert_array_equal(
        np.asarray(e.apply(None, x)), np.asarray(e.apply_raster(None, side))
    )


def test_model_and_trainer_raster():
    config = {
        "encoding": {
            "otype": "HashGrid",
            "n_levels": 4,
            "n_features_per_level": 2,
            "log2_hashmap_size": 12,
            "base_resolution": 4,
            "per_level_scale": 1.5,
            "hash": "CoherentAdditive",
            "gather_strategy": "stratified",
        },
        "network": {
            "otype": "CutlassMLP",
            "n_neurons": 16,
            "n_hidden_layers": 1,
            "activation": "ReLU",
            "output_activation": "None",
        },
        "loss": {"otype": "L2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-3},
    }
    m = tc.create_from_config(2, 3, config)
    side = 32
    x = jnp.asarray(raster_centers(side, 2))
    # trainer.inference forces the per-sample fallback (arbitrary batches);
    # inference_raster may take the static path — same numbers either way.
    ref = np.asarray(m.trainer.inference(x))
    fast = np.asarray(m.trainer.inference_raster(side))
    assert fast.shape == (side * side, 3)
    assert np.isfinite(fast).all()
    np.testing.assert_allclose(ref, fast, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize(
    "n_dims,sides,interp",
    [
        (2, (48, 64), "Linear"),
        (2, (40, 24), "Smoothstep"),
        (3, (8, 12, 16), "Linear"),
    ],
)
def test_rectangular_raster_matches_apply(n_dims, sides, interp):
    # Rectangular rasters (e.g. a w x h image): per-dim static separable
    # lerp must match the per-sample fallback on the same positions.
    e = _enc(n_dims, interpolation=interp)
    params = _params(e, seed=7)
    x = jnp.asarray(raster_centers(sides, n_dims))
    ref = np.asarray(jax.jit(lambda p: e.apply(p, x, stratified=False))(params))
    fast = np.asarray(jax.jit(lambda p: e.apply_raster(p, sides))(params))
    assert fast.shape[0] == int(np.prod(sides))
    assert np.isfinite(fast).all()
    np.testing.assert_allclose(ref, fast, rtol=2e-6, atol=2e-6)

"""Native threaded host batch sampler (runtime/rtcnn.cpp) + numpy fallback."""

import numpy as np
import pytest

from tcnn_tpu.runtime import native
from tcnn_tpu.utils.data import HostImageSampler
from tcnn_tpu.utils.sampling import is_stratified


@pytest.fixture
def image():
    return np.random.default_rng(0).random((32, 48, 3)).astype(np.float32)


def _check(sampler, image):
    h, w, _ = image.shape
    xy, rgb = sampler.next()
    assert xy.shape == (sampler.batch, 2) and rgb.shape == (sampler.batch, 3)
    assert 0.0 <= xy.min() and xy.max() < 1.0
    px = np.minimum((xy[:, 0] * w).astype(int), w - 1)
    py = np.minimum((xy[:, 1] * h).astype(int), h - 1)
    np.testing.assert_array_equal(rgb, image[py, px])
    xy2, _ = sampler.next()
    assert not np.array_equal(xy, xy2)  # stream advances
    return xy


def test_stratified_batches(image):
    with HostImageSampler(image, 256, stratified=True, seed=3) as s:
        xy = _check(s, image)
        assert is_stratified(xy)


def test_iid_batches(image):
    with HostImageSampler(image, 300, stratified=False, seed=3) as s:
        _check(s, image)


def test_non_square_stratified_rejected(image):
    with pytest.raises(ValueError):
        HostImageSampler(image, 300, stratified=True)


def test_numpy_fallback_matches_contract(image, monkeypatch):
    monkeypatch.setattr(native, "_load", lambda: None)
    with HostImageSampler(image, 256, stratified=True, seed=3) as s:
        assert not s.native
        xy = _check(s, image)
        assert is_stratified(xy)


def test_trains_with_model(image):
    import jax.numpy as jnp

    import tcnn_tpu as tc

    cfg = {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
        "encoding": {
            "otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
            "log2_hashmap_size": 8, "base_resolution": 4,
            "per_level_scale": 1.5, "hash": "CoherentAdditive",
            "gather_strategy": "stratified", "strata": 16,
        },
        "network": {"otype": "CutlassMLP", "n_neurons": 16,
                    "n_hidden_layers": 1},
    }
    model = tc.create_from_config(2, 3, cfg)
    with HostImageSampler(image, 256, stratified=True, seed=0) as s:
        losses = []
        for _ in range(15):
            xy, rgb = s.next()
            losses.append(
                float(model.training_step(jnp.asarray(xy), jnp.asarray(rgb)))
            )
    assert np.isfinite(losses).all() and losses[-1] < losses[0]

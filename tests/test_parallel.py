"""Multi-chip data parallelism on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tcnn_tpu as tc
from tcnn_tpu.parallel import DataParallelTrainer, make_mesh

CONFIG = {
    "loss": {"otype": "L2"},
    "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
    "encoding": {"otype": "OneBlob", "n_bins": 8},
    "network": {"otype": "CutlassMLP", "n_neurons": 32, "n_hidden_layers": 1},
}


def _target(xy):
    return np.stack([xy[:, 0], xy[:, 1], xy.sum(1) / 2], 1).astype(np.float32)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_data_parallel_matches_single_device():
    r = np.random.default_rng(0)
    batches = [
        (r.uniform(0, 1, (512, 2)).astype(np.float32),) for _ in range(5)
    ]

    single = tc.create_from_config(2, 3, CONFIG, seed=11)
    dp_model = tc.create_from_config(2, 3, CONFIG, seed=11)
    dp = DataParallelTrainer(dp_model.trainer, make_mesh(jax.devices()))

    for (xy,) in batches:
        t = _target(xy)
        l1 = float(single.training_step(jnp.asarray(xy), jnp.asarray(t)))
        l2 = float(dp.training_step(jnp.asarray(xy), jnp.asarray(t)))
        assert abs(l1 - l2) / max(abs(l1), 1e-9) < 5e-2

    p1 = np.asarray(single.trainer.params)
    p2 = np.asarray(dp.trainer.state["params"])
    np.testing.assert_allclose(p1, p2, rtol=2e-2, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_data_parallel_inference():
    model = tc.create_from_config(2, 3, CONFIG, seed=3)
    dp = DataParallelTrainer(model.trainer)
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (256, 2)), jnp.float32)
    out = dp.inference(x)
    assert out.shape == (256, 3)
    ref = np.asarray(model.trainer.inference(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_indivisible_batch_raises():
    model = tc.create_from_config(2, 3, CONFIG)
    dp = DataParallelTrainer(model.trainer)
    x = jnp.zeros((dp.n_devices * 4 + 1, 2))
    with pytest.raises(ValueError):
        dp.training_step(x, jnp.zeros((x.shape[0], 3)))


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_data_parallel_grid_fast_paths():
    """Stratified static levels + factored MXU scatter under batch
    sharding: the factored matmuls contract the sharded batch axis, so
    XLA must insert the gradient psum automatically; parity vs the
    single-device trainer on identical batches."""
    from tcnn_tpu.utils.sampling import stratified_uniform

    cfg = {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
        "encoding": {
            "otype": "HashGrid", "n_levels": 5, "n_features_per_level": 2,
            "log2_hashmap_size": 9, "base_resolution": 4,
            "per_level_scale": 1.5, "hash": "CoherentAdditive",
            "gather_strategy": "stratified", "strata": 32,
            "scatter_strategy": "factored",
        },
        "network": {"otype": "CutlassMLP", "n_neurons": 16,
                    "n_hidden_layers": 1},
    }
    single = tc.create_from_config(2, 3, cfg, seed=5)
    dp_model = tc.create_from_config(2, 3, cfg, seed=5)
    dp = DataParallelTrainer(dp_model.trainer, make_mesh(jax.devices()))

    for i in range(4):
        xy = stratified_uniform(jax.random.PRNGKey(i), 1024, 2)
        t = jnp.asarray(_target(np.asarray(xy)))
        l1 = float(single.training_step(xy, t))
        l2 = float(dp.training_step(xy, t))
        assert abs(l1 - l2) / max(abs(l1), 1e-9) < 5e-2
    np.testing.assert_allclose(
        np.asarray(single.trainer.params),
        np.asarray(dp.trainer.state["params"]),
        rtol=2e-2,
        atol=2e-4,
    )

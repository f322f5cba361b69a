"""The Instant-NGP NeRF configuration shape: a Composite of a parameterized
HashGrid over positions and SphericalHarmonics over directions, feeding a
FullyFusedMLP — the most important composite-with-params pattern in
practice."""

import jax
import jax.numpy as jnp
import numpy as np

import tcnn_tpu as tc

NERF_CONFIG = {
    "loss": {"otype": "L2"},
    "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
    "encoding": {
        "otype": "Composite",
        "nested": [
            {
                "n_dims_to_encode": 3,
                "otype": "HashGrid",
                "n_levels": 8,
                "n_features_per_level": 2,
                "log2_hashmap_size": 13,
                "base_resolution": 4,
                "per_level_scale": 1.5,
                "hash": "CoherentAdditive",
                "gather_strategy": "quad",
            },
            {"n_dims_to_encode": 3, "otype": "SphericalHarmonics",
             "degree": 4},
        ],
    },
    "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                "n_hidden_layers": 2},
}


def _batch(r, n=2048):
    pos = r.uniform(0, 1, (n, 3)).astype(np.float32)
    dirs = r.uniform(0, 1, (n, 3)).astype(np.float32)
    x = np.concatenate([pos, dirs], 1)
    t = np.stack(
        [np.sin(4 * np.pi * pos[:, 0]) * 0.5 + 0.5, pos[:, 1] * dirs[:, 0],
         (pos[:, 2] + dirs[:, 2]) / 2, pos[:, 0] * pos[:, 1]], 1
    ).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(t)


def test_nerf_composite_structure():
    model = tc.create_from_config(6, 4, NERF_CONFIG)
    enc = model.model.encoding
    assert enc.n_nested() == 2
    grid = enc.nested[0]
    assert grid.n_params > 0
    assert model.model.n_params == (
        model.model.network.n_params + grid.n_params
    )
    # hash-grid params are non-matrix for Adam
    assert model.optimizer.n_matrix_weights == model.model.network.n_params


def test_nerf_trains():
    model = tc.create_from_config(6, 4, NERF_CONFIG, seed=3)
    r = np.random.default_rng(0)
    losses = []
    for _ in range(40):
        x, t = _batch(r)
        losses.append(float(model.training_step(x, t)))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < 0.5 * np.mean(losses[:5]), losses[::8]

    x, _ = _batch(r, 256)
    out = model.inference(x)
    assert out.shape == (256, 4)


def test_nerf_grid_params_receive_gradients():
    model = tc.create_from_config(6, 4, NERF_CONFIG, seed=4)
    r = np.random.default_rng(1)
    x, t = _batch(r, 512)

    def loss(p):
        out = model.model.apply(p, x).astype(jnp.float32)
        return ((out[:, :4] - t) ** 2).sum()

    g = np.asarray(jax.grad(loss)(model.trainer.params))
    n_net = model.model.network.n_params
    assert np.abs(g[:n_net]).sum() > 0  # network grads
    assert np.abs(g[n_net:]).sum() > 0  # grid grads through the composite

"""Torch-bindings-parity module API tests (reference:
bindings/torch/tinycudann/modules.py, scripts/test_torch_bindings.py)."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np

from tcnn_tpu.modules import Encoding, Network, NetworkWithInputEncoding

ENC_CFG = {"otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
           "log2_hashmap_size": 12, "base_resolution": 8}
NET_CFG = {"otype": "FullyFusedMLP", "n_neurons": 32, "n_hidden_layers": 2}


def test_network_with_input_encoding():
    m = NetworkWithInputEncoding(2, 3, ENC_CFG, NET_CFG, seed=1)
    assert m.n_params == m.params.shape[0]
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (100, 2)), jnp.float32)
    y = m(x)  # batch 100 padded internally to granularity, sliced back
    assert y.shape == (100, m.padded_output_width)


def test_network_standalone():
    m = Network(16, 4, NET_CFG, seed=2)
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (64, 16)), jnp.float32)
    y = m(x)
    assert y.shape[0] == 64
    assert np.isfinite(np.asarray(y, np.float32)).all()


def test_encoding_standalone_fp32():
    m = Encoding(2, ENC_CFG, seed=3)
    x = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (32, 2)), jnp.float32)
    y = m(x)
    assert y.dtype == jnp.float32
    assert y.shape == (32, m.n_output_dims)


def test_autodiff_through_module():
    m = NetworkWithInputEncoding(2, 3, ENC_CFG, NET_CFG, seed=4)
    x = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (128, 2)), jnp.float32)

    def loss(p):
        return (m.apply(p, x).astype(jnp.float32) ** 2).sum()

    g = jax.grad(loss)(m.params)
    assert g.shape == m.params.shape
    assert np.isfinite(np.asarray(g)).all()


def test_seed_determinism():
    a = Network(16, 4, NET_CFG, seed=7)
    b = Network(16, 4, NET_CFG, seed=7)
    np.testing.assert_array_equal(np.asarray(a.params), np.asarray(b.params))


def test_pickle_roundtrip():
    m = Encoding(2, ENC_CFG, seed=5)
    x = jnp.asarray(np.random.default_rng(4).uniform(0, 1, (16, 2)), jnp.float32)
    y1 = np.asarray(m(x))
    m2 = pickle.loads(pickle.dumps(m))
    y2 = np.asarray(m2(x))
    np.testing.assert_array_equal(y1, y2)

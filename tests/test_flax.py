"""Flax linen wrapper tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

flax = pytest.importorskip("flax")

from tcnn_tpu.flax_modules import TcnnEncoding, TcnnNetworkWithInputEncoding

ENC_CFG = {"otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
           "log2_hashmap_size": 12, "base_resolution": 8}
NET_CFG = {"otype": "CutlassMLP", "n_neurons": 32, "n_hidden_layers": 1}


def test_flax_nwie_init_and_apply():
    m = TcnnNetworkWithInputEncoding(2, 3, ENC_CFG, NET_CFG, seed=7)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (64, 2)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape[0] == 64
    assert np.isfinite(np.asarray(y, np.float32)).all()

    # Gradients flow through the flat params vector.
    def loss(v):
        return (m.apply(v, x).astype(jnp.float32) ** 2).sum()

    g = jax.grad(loss)(variables)
    leaves = jax.tree_util.tree_leaves(g)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


def test_flax_encoding():
    m = TcnnEncoding(2, ENC_CFG, seed=3)
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (32, 2)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.dtype == jnp.float32

    # Same seed => same tcnn-deterministic init regardless of the Flax key.
    v2 = m.init(jax.random.PRNGKey(123), x)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(variables)[0]),
        np.asarray(jax.tree_util.tree_leaves(v2)[0]),
    )

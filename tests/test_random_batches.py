"""Random-batch-size stress test (reference: scripts/test_random_input.py —
which caught an interval-arithmetic bug in the memory arena; here it
exercises the modules' batch padding/slicing and re-jit behavior)."""

import jax.numpy as jnp
import numpy as np

from tcnn_tpu.modules import NetworkWithInputEncoding

ENC = {"otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
       "log2_hashmap_size": 10, "base_resolution": 4,
       "hash": "CoherentAdditive", "gather_strategy": "quad"}
NET = {"otype": "FullyFusedMLP", "n_neurons": 32, "n_hidden_layers": 1}


def test_random_batch_sizes():
    m = NetworkWithInputEncoding(2, 3, ENC, NET, seed=1)
    r = np.random.default_rng(0)
    for _ in range(12):
        batch = int(r.integers(1, 700))
        x = jnp.asarray(r.uniform(0, 1, (batch, 2)), jnp.float32)
        y = m(x)
        assert y.shape[0] == batch
        assert np.isfinite(np.asarray(y, np.float32)).all()


def test_batch_one():
    m = NetworkWithInputEncoding(2, 3, ENC, NET, seed=2)
    y = m(jnp.asarray([[0.5, 0.5]], jnp.float32))
    assert y.shape[0] == 1

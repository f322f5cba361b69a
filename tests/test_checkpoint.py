"""Checkpoint format tests: npz fast path and orbax (if present)."""

import numpy as np
import pytest

import jax.numpy as jnp

import tcnn_tpu as tc
from tcnn_tpu.utils import checkpoint as ckpt

CFG = {
    "loss": {"otype": "L2"},
    "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
    "encoding": {"otype": "HashGrid", "n_levels": 4, "log2_hashmap_size": 10,
                 "base_resolution": 4},
    "network": {"otype": "CutlassMLP", "n_neurons": 16, "n_hidden_layers": 1},
}


def _trained_model(seed=1, steps=5):
    m = tc.create_from_config(2, 2, CFG, seed=seed)
    r = np.random.default_rng(0)
    for _ in range(steps):
        x = jnp.asarray(r.uniform(0, 1, (64, 2)).astype(np.float32))
        t = jnp.asarray(r.uniform(0, 1, (64, 2)).astype(np.float32))
        m.training_step(x, t)
    return m


def test_npz_roundtrip(tmp_path):
    m1 = _trained_model()
    path = tmp_path / "state.npz"
    ckpt.save_npz(path, m1.trainer)

    m2 = tc.create_from_config(2, 2, CFG, seed=99)
    ckpt.load_npz(path, m2.trainer)
    np.testing.assert_array_equal(
        np.asarray(m1.trainer.params), np.asarray(m2.trainer.params)
    )
    np.testing.assert_array_equal(
        np.asarray(m1.trainer.state["opt"]["first_moments"]),
        np.asarray(m2.trainer.state["opt"]["first_moments"]),
    )

    # Continued training stays in lockstep.
    x = jnp.asarray(np.random.default_rng(5).uniform(0, 1, (64, 2)),
                    jnp.float32)
    t = jnp.zeros((64, 2), jnp.float32)
    l1 = float(m1.training_step(x, t))
    l2 = float(m2.training_step(x, t))
    assert l1 == l2


def test_npz_shape_mismatch_raises(tmp_path):
    m1 = _trained_model()
    path = tmp_path / "state.npz"
    ckpt.save_npz(path, m1.trainer)
    other_cfg = dict(CFG, network={"otype": "CutlassMLP", "n_neurons": 32,
                                   "n_hidden_layers": 1})
    m2 = tc.create_from_config(2, 2, other_cfg)
    with pytest.raises(ValueError):
        ckpt.load_npz(path, m2.trainer)


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    m1 = _trained_model()
    path = tmp_path / "orbax_ckpt"
    ckpt.save_orbax(path, m1.trainer)
    m2 = tc.create_from_config(2, 2, CFG, seed=42)
    ckpt.load_orbax(path, m2.trainer)
    np.testing.assert_array_equal(
        np.asarray(m1.trainer.params), np.asarray(m2.trainer.params)
    )

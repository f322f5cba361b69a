"""FrozenServer: production serving with prebuilt tables (serving.py).

The server snapshots inference params, prebuilds the grid's quad tables
once (GridEncoding.serving_tables), and serves through consume-only
jitted programs. These tests pin exact parity with the live trainer
inference paths, snapshot semantics, and the table-dtype / phase-locked
config interactions. Reference context: the CUDA inference path re-runs
the training kernels on resident inference params (trainer.h:171-186);
the prebuilt-quad split is the TPU-native equivalent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tcnn_tpu as tc
from tcnn_tpu.utils.sampling import stratified_uniform

STRATA = 16
B = STRATA**2


def make_model(**enc_over):
    enc = {
        "otype": "HashGrid", "n_levels": 8, "n_features_per_level": 2,
        "log2_hashmap_size": 10, "base_resolution": 4,
        "per_level_scale": 1.5, "hash": "CoherentAdditive",
        "gather_strategy": "stratified", "strata": STRATA,
    }
    enc.update(enc_over)
    return tc.create_from_config(2, 3, {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
        "encoding": enc,
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    })


def train_some(m, steps=5):
    r = np.random.default_rng(0)
    for i in range(steps):
        xy = stratified_uniform(jax.random.PRNGKey(i), B, 2)
        t = jnp.asarray(r.uniform(0, 1, (B, 3)).astype(np.float32))
        m.training_step(xy, t)
    return m


@pytest.fixture(scope="module")
def trained():
    return train_some(make_model())


def test_batch_parity(trained):
    server = trained.trainer.freeze_serving()
    assert server._tables is not None and len(server._tables) > 0
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (333, 2)).astype(np.float32)
    )
    y_live = trained.trainer.inference(x)
    y_srv = server(x)
    assert jnp.isfinite(y_srv).all()
    np.testing.assert_allclose(
        np.asarray(y_live), np.asarray(y_srv), rtol=0, atol=1e-5
    )


@pytest.mark.parametrize("side", [16, (32, 16)])
def test_raster_parity(trained, side):
    server = trained.trainer.freeze_serving()
    y_live = trained.trainer.inference_raster(side)
    y_srv = server.raster(side)
    assert jnp.isfinite(y_srv).all()
    np.testing.assert_allclose(
        np.asarray(y_live), np.asarray(y_srv), rtol=0, atol=1e-5
    )


def test_snapshot_semantics(trained):
    server = trained.trainer.freeze_serving()
    x = jnp.asarray(
        np.random.default_rng(2).uniform(0, 1, (64, 2)).astype(np.float32)
    )
    before = np.asarray(server(x))
    train_some(trained, steps=3)
    after_frozen = np.asarray(server(x))
    np.testing.assert_array_equal(before, after_frozen)
    # a fresh server picks up the new params
    fresh = trained.trainer.freeze_serving()
    assert not np.array_equal(before, np.asarray(fresh(x)))


def test_table_dtype_parity():
    m = train_some(make_model(table_dtype="bfloat16"))
    server = m.trainer.freeze_serving()
    x = jnp.asarray(
        np.random.default_rng(3).uniform(0, 1, (128, 2)).astype(np.float32)
    )
    np.testing.assert_allclose(
        np.asarray(m.trainer.inference(x)), np.asarray(server(x)),
        rtol=0, atol=1e-5,
    )


def test_phase_locked_config_serving():
    m = make_model(phase_locked=True, locked_phases=4)
    r = np.random.default_rng(0)
    for i in range(3):
        xy = stratified_uniform(jax.random.PRNGKey(i), B, 2, phase_locked=4)
        t = jnp.asarray(r.uniform(0, 1, (B, 3)).astype(np.float32))
        m.training_step(xy, t)
    server = m.trainer.freeze_serving()
    x = jnp.asarray(r.uniform(0, 1, (200, 2)).astype(np.float32))
    y_live = m.trainer.inference(x)
    y_srv = server(x)
    assert jnp.isfinite(y_srv).all()
    np.testing.assert_allclose(
        np.asarray(y_live), np.asarray(y_srv), rtol=0, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(m.trainer.inference_raster(16)),
        np.asarray(server.raster(16)),
        rtol=0, atol=1e-5,
    )


def test_plain_network_model():
    m = tc.create_from_config(8, 3, {
        "loss": {"otype": "L2"},
        "optimizer": {"otype": "SGD", "learning_rate": 1e-2},
        "encoding": {"otype": "Identity"},
        "network": {"otype": "CutlassMLP", "n_neurons": 32,
                    "n_hidden_layers": 1},
    })
    r = np.random.default_rng(0)
    x = jnp.asarray(r.uniform(0, 1, (64, 8)).astype(np.float32))
    m.training_step(x, jnp.asarray(
        r.uniform(0, 1, (64, 3)).astype(np.float32)
    ))
    server = m.trainer.freeze_serving()
    np.testing.assert_allclose(
        np.asarray(m.trainer.inference(x)), np.asarray(server(x)),
        rtol=0, atol=1e-5,
    )


def _serving_mesh():
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), ("data",))


def test_sharded_batch_parity(trained):
    """Mesh-sharded serving (replicated params/tables, batch sharded)
    bit-matches the single-device server — per-sample inference is
    embarrassingly parallel, so SPMD partitioning reorders nothing."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _serving_mesh()
    server = trained.trainer.freeze_serving()
    server_dp = trained.trainer.freeze_serving(mesh=mesh)
    x = jnp.asarray(
        np.random.default_rng(7).uniform(0, 1, (8 * 40, 2)).astype(np.float32)
    )
    y = server(x)
    y_dp = server_dp(x)
    # Output really lands sharded over the mesh's batch axis.
    assert y_dp.sharding == NamedSharding(mesh, P("data", None))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_dp))
    # Non-divisible batches are rejected with a clear error.
    with pytest.raises(ValueError, match="divisible"):
        server_dp(x[: 8 * 40 - 3])


def test_sharded_raster_parity(trained):
    """The raster program (static coarse path included) partitions over
    the mesh from the sharded-output constraint alone."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _serving_mesh()
    server = trained.trainer.freeze_serving()
    server_dp = trained.trainer.freeze_serving(mesh=mesh)
    for side in (16, (32, 16)):
        y = server.raster(side)
        y_dp = server_dp.raster(side)
        assert y_dp.sharding == NamedSharding(mesh, P("data", None))
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_dp), rtol=0, atol=1e-6
        )


def test_serving_table_dtype_override(trained):
    """Serve-time bf16 table storage: tables round once at build;
    output tracks the f32 server to bf16 storage precision; training
    state and the f32 server are untouched."""
    server = trained.trainer.freeze_serving()
    server_bf = trained.trainer.freeze_serving(table_dtype="bfloat16")
    assert all(
        t.dtype == jnp.bfloat16 for t in server_bf._tables.values()
    )
    x = jnp.asarray(
        np.random.default_rng(11).uniform(0, 1, (256, 2)).astype(np.float32)
    )
    y = np.asarray(server(x))
    y_bf = np.asarray(server_bf(x))
    assert np.isfinite(y_bf).all()
    # bf16 has ~2^-8 relative storage rounding; the MLP roughly
    # preserves relative error scale on these O(1) outputs.
    np.testing.assert_allclose(y, y_bf, rtol=0, atol=0.05)
    assert np.abs(y - y_bf).max() > 0  # it really did round


def test_composite_nrc_serving():
    # NRC preset: Composite(grid + oneblob + ...) — nested grid tables
    # prebuild through CompositeEncoding.serving_tables.
    m = tc.create_from_config(9, 3, {
        "loss": {"otype": "RelativeL2Luminance"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
        "encoding": {"otype": "NRC"},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    })
    r = np.random.default_rng(0)
    x = jnp.asarray(r.uniform(0, 1, (128, 9)).astype(np.float32))
    m.training_step(x, jnp.asarray(
        r.uniform(0, 1, (128, 3)).astype(np.float32)
    ))
    server = m.trainer.freeze_serving()
    y_live = m.trainer.inference(x)
    y_srv = server(x)
    assert jnp.isfinite(y_srv).all()
    np.testing.assert_allclose(
        np.asarray(y_live), np.asarray(y_srv), rtol=0, atol=1e-5
    )

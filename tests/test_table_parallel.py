"""TableParallelGrid: row-sharded hash-grid tables over a mesh axis.

Features and table gradients must match the single-device encoding
exactly (the sharded lookup is the same linear map — a local masked
gather assembled by one psum). Runs on the 8-device virtual CPU mesh
(tests/conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import tcnn_tpu as tc
from tcnn_tpu.parallel import TableParallelGrid


def _enc(n_dims, **extra):
    cfg = dict(
        otype="HashGrid",
        n_levels=6,
        n_features_per_level=2,
        log2_hashmap_size=9,
        base_resolution=3,
        per_level_scale=1.9,
    )
    cfg.update(extra)
    e = tc.create_encoding(n_dims, cfg, 16)
    e.output_dtype = jnp.float32
    return e


def _mesh(shape, names):
    devs = np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


@pytest.mark.parametrize(
    "n_dims,interp,hash_",
    [
        (2, "Linear", "CoherentPrime"),
        (3, "Smoothstep", "Prime"),
        (2, "Nearest", "CoherentAdditive"),
    ],
)
def test_table_parallel_matches_single(n_dims, interp, hash_):
    e = _enc(n_dims, interpolation=interp, hash=hash_)
    mesh = _mesh((8,), ("model",))
    tp = TableParallelGrid(e, mesh, axis="model")

    r = np.random.default_rng(0)
    params = r.standard_normal(e.n_params).astype(np.float32)
    x = jnp.asarray(r.uniform(0, 1, (64, n_dims)), jnp.float32)

    stacked = tp.shard_params(params)
    # round-trip of the relayout
    np.testing.assert_array_equal(tp.unshard_params(stacked), params)

    ref = np.asarray(e.apply(jnp.asarray(params), x))[:, : e.n_levels * 2]
    got = np.asarray(jax.jit(tp.apply)(jnp.asarray(stacked), x))
    # Corners straddling a shard boundary sum in a different order
    # (masked partials + psum) — f32 roundoff only.
    np.testing.assert_allclose(ref, got, rtol=2e-5, atol=1e-5)


def test_table_parallel_gradients_local():
    e = _enc(2)
    mesh = _mesh((8,), ("model",))
    tp = TableParallelGrid(e, mesh, axis="model")
    r = np.random.default_rng(1)
    params = r.standard_normal(e.n_params).astype(np.float32)
    x = jnp.asarray(r.uniform(0, 1, (128, 2)), jnp.float32)
    stacked = jnp.asarray(tp.shard_params(params))

    g_ref = np.asarray(
        jax.grad(
            lambda p: (e.apply(p, x)[:, : e.n_levels * 2] ** 2).sum()
        )(jnp.asarray(params))
    )
    g_tp = np.asarray(
        jax.jit(jax.grad(lambda p: (tp.apply(p, x) ** 2).sum()))(stacked)
    )
    # The sharded gradient, re-assembled into the flat layout, equals the
    # single-device gradient (each device's scatter covers its own rows).
    np.testing.assert_allclose(
        tp.unshard_params(g_tp), g_ref, rtol=1e-5, atol=1e-6
    )


def test_table_parallel_composes_with_data_axis():
    # 2D mesh: tables sharded over "model", batch over "data"; one train
    # step of a composed encoding+MLP with SGD must match single-device.
    e = _enc(2)
    mesh = _mesh((4, 2), ("data", "model"))
    tp = TableParallelGrid(e, mesh, axis="model", data_axis="data")

    r = np.random.default_rng(2)
    params = r.standard_normal(e.n_params).astype(np.float32)
    w = r.standard_normal((e.n_levels * 2, 3)).astype(np.float32) * 0.1
    x = jnp.asarray(r.uniform(0, 1, (256, 2)), jnp.float32)
    tgt = jnp.asarray(r.uniform(0, 1, (256, 3)), jnp.float32)
    stacked = jax.device_put(
        jnp.asarray(tp.shard_params(params)),
        NamedSharding(mesh, P("model")),
    )
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ts = jax.device_put(tgt, NamedSharding(mesh, P("data")))

    def loss_tp(p, w, x, t):
        y = tp.apply(p, x) @ w
        return ((y - t) ** 2).mean()

    def loss_ref(p, w, x, t):
        y = e.apply(p, x)[:, : e.n_levels * 2] @ w
        return ((y - t) ** 2).mean()

    lr = 0.5

    @jax.jit
    def step_tp(p, w, x, t):
        l, (gp, gw) = jax.value_and_grad(loss_tp, argnums=(0, 1))(p, w, x, t)
        return l, p - lr * gp, w - lr * gw

    l1, p1, w1 = step_tp(stacked, jnp.asarray(w), xs, ts)
    l0, (gp0, gw0) = jax.value_and_grad(loss_ref, argnums=(0, 1))(
        jnp.asarray(params), jnp.asarray(w), x, tgt
    )
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    np.testing.assert_allclose(
        tp.unshard_params(np.asarray(p1)),
        params - lr * np.asarray(gp0),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(w1), w - lr * np.asarray(gw0), rtol=1e-5, atol=1e-6
    )


def test_table_parallel_trainer_end_to_end():
    """VERDICT r4 item 7: a configured model (grid + MLP + loss +
    optimizer from create_from_config) trains with table rows sharded on
    a model axis composed with the data axis, matching the single-device
    Trainer lockstep (losses + final params)."""
    from tcnn_tpu.parallel import TableParallelTrainer

    config = {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2,
                      "epsilon": 1e-15, "l2_reg": 1e-6},
        "encoding": {
            "otype": "HashGrid", "n_levels": 6, "n_features_per_level": 2,
            "log2_hashmap_size": 9, "base_resolution": 3,
            "per_level_scale": 1.9,  # default per_level gather path
        },
        "network": {"otype": "CutlassMLP", "n_neurons": 32,
                    "n_hidden_layers": 1},
    }
    ref = tc.create_from_config(2, 3, config)
    mp_model = tc.create_from_config(2, 3, config)
    np.testing.assert_array_equal(
        np.asarray(ref.trainer.params), np.asarray(mp_model.trainer.params)
    )

    mesh = _mesh((4, 2), ("data", "model"))
    tpt = TableParallelTrainer(mp_model.trainer, mesh)

    # round-trip of the initial state relayout
    np.testing.assert_array_equal(
        tpt.params, np.asarray(ref.trainer.params)
    )

    r = np.random.default_rng(7)
    for i in range(5):
        x = jnp.asarray(r.uniform(0, 1, (256, 2)), jnp.float32)
        t = jnp.asarray(r.uniform(0, 1, (256, 3)), jnp.float32)
        l_ref = float(ref.training_step(x, t))
        l_tp = float(tpt.training_step(x, t))
        np.testing.assert_allclose(l_tp, l_ref, rtol=5e-5, atol=1e-6,
                                   err_msg=f"loss step {i}")

    np.testing.assert_allclose(
        tpt.params, np.asarray(ref.trainer.params), rtol=5e-4, atol=1e-6
    )

    # inference through the sharded stack matches the single-device model
    x = jnp.asarray(r.uniform(0, 1, (128, 2)), jnp.float32)
    y_tp = np.asarray(tpt.inference(x))
    y_ref = np.asarray(ref.trainer.inference(x))
    np.testing.assert_allclose(y_tp, y_ref, rtol=2e-4, atol=2e-5)

    # handoff back to the single-device trainer (checkpoint/serving)
    tpt.sync_to_trainer()
    np.testing.assert_array_equal(
        np.asarray(mp_model.trainer.params), tpt.params
    )


def test_table_parallel_trainer_opt_state_sync_and_lr():
    """sync_to_trainer must hand back the OPTIMIZER state too (an EMA
    wrapper's inference weights would otherwise serialize from the
    wrapped trainer's zeros init), and lr updates must reach the
    sharded step."""
    from tcnn_tpu.parallel import TableParallelTrainer

    config = {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "EMA", "decay": 0.9,
                      "nested": {"otype": "Adam", "learning_rate": 1e-2,
                                 "epsilon": 1e-15, "l2_reg": 1e-6}},
        "encoding": {
            "otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
            "log2_hashmap_size": 8, "base_resolution": 3,
            "per_level_scale": 1.9,
        },
        "network": {"otype": "CutlassMLP", "n_neurons": 16,
                    "n_hidden_layers": 1},
    }
    ref = tc.create_from_config(2, 3, config)
    mp_model = tc.create_from_config(2, 3, config)
    mesh = _mesh((4, 2), ("data", "model"))
    tpt = TableParallelTrainer(mp_model.trainer, mesh)

    r = np.random.default_rng(3)
    for _ in range(3):
        x = jnp.asarray(r.uniform(0, 1, (256, 2)), jnp.float32)
        t = jnp.asarray(r.uniform(0, 1, (256, 3)), jnp.float32)
        ref.training_step(x, t)
        tpt.training_step(x, t)

    tpt.sync_to_trainer()
    # Inference (EMA custom) weights come from the synced opt state and
    # must match the single-device run — NOT the zeros init.
    ema_ref = np.asarray(ref.trainer.inference_params())
    ema_tp = np.asarray(mp_model.trainer.inference_params())
    assert np.abs(ema_tp).max() > 0, "EMA weights still zeros: no sync"
    np.testing.assert_allclose(ema_tp, ema_ref, rtol=5e-4, atol=1e-6)
    # Serialized checkpoints agree between the two runs.
    blob_ref = ref.trainer.serialize(serialize_optimizer=True)
    blob_tp = mp_model.trainer.serialize(serialize_optimizer=True)
    a = np.frombuffer(
        bytes(blob_ref["params_binary"]["bytes"]), np.float32
    )
    b = np.frombuffer(bytes(blob_tp["params_binary"]["bytes"]), np.float32)
    np.testing.assert_allclose(b, a, rtol=5e-4, atol=1e-6)

    # lr passthrough: both runs drop lr and stay in lockstep.
    ref.trainer.learning_rate = 1e-3
    tpt.learning_rate = 1e-3
    for _ in range(2):
        x = jnp.asarray(r.uniform(0, 1, (256, 2)), jnp.float32)
        t = jnp.asarray(r.uniform(0, 1, (256, 3)), jnp.float32)
        l_ref = float(ref.training_step(x, t))
        l_tp = float(tpt.training_step(x, t))
        np.testing.assert_allclose(l_tp, l_ref, rtol=5e-5, atol=1e-6)


def test_table_parallel_trainer_rejects_non_grid():
    from tcnn_tpu.parallel import TableParallelTrainer

    config = {
        "loss": {"otype": "L2"},
        "optimizer": {"otype": "Adam"},
        "encoding": {"otype": "Identity"},
        "network": {"otype": "CutlassMLP", "n_neurons": 16,
                    "n_hidden_layers": 1},
    }
    m = tc.create_from_config(2, 2, config)
    mesh = _mesh((4, 2), ("data", "model"))
    with pytest.raises(TypeError, match="grid encoding"):
        TableParallelTrainer(m.trainer, mesh)

"""Trainer(split_grid_state=True): the structured training state (per-
level grid tables as separate buffers — VERDICT r4 item 3) must be
BIT-IDENTICAL to the flat-vector state on every surface: training
trajectory, .params, inference_params (EMA), serialize/deserialize
(checkpoints stay flat/byte-identical), and hyperparam updates."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tcnn_tpu as tc

CONFIG = {
    "loss": {"otype": "RelativeL2"},
    "optimizer": {
        "otype": "EMA", "decay": 0.95,
        "nested": {"otype": "Adam", "learning_rate": 1e-2, "beta1": 0.9,
                   "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6},
    },
    "encoding": {
        "otype": "HashGrid", "n_levels": 6, "n_features_per_level": 2,
        "log2_hashmap_size": 12, "base_resolution": 4,
        "per_level_scale": 1.6,
    },
    "network": {"otype": "FullyFusedMLP", "n_neurons": 32,
                "n_hidden_layers": 2},
}


def _batches(n, b=512):
    r = np.random.default_rng(0)
    for _ in range(n):
        x = r.uniform(0, 1, (b, 2)).astype(np.float32)
        t = np.stack(
            [x[:, 0], x[:, 1], 0.5 + 0.5 * np.sin(7 * x[:, 0] * x[:, 1])],
            axis=-1,
        ).astype(np.float32)
        yield jnp.asarray(x), jnp.asarray(t)


def test_split_state_bitwise_parity_and_checkpoint():
    flat = tc.create_from_config(2, 3, CONFIG)
    split = tc.create_from_config(2, 3, CONFIG, split_grid_state=True)

    # Same init.
    np.testing.assert_array_equal(
        np.asarray(flat.trainer.params), np.asarray(split.trainer.params)
    )
    assert isinstance(split.trainer.state["params"], dict)
    assert len(split.trainer.state["params"]["levels"]) == 6

    losses_a, losses_b = [], []
    for x, t in _batches(10):
        losses_a.append(float(flat.trainer.training_step(x, t)))
        losses_b.append(float(split.trainer.training_step(x, t)))
    assert losses_a == losses_b  # bitwise-identical trajectory
    np.testing.assert_array_equal(
        np.asarray(flat.trainer.params), np.asarray(split.trainer.params)
    )
    # EMA custom weights join identically.
    np.testing.assert_array_equal(
        np.asarray(flat.trainer.inference_params()),
        np.asarray(split.trainer.inference_params()),
    )

    # Checkpoints are the same flat bytes both ways (incl. optimizer
    # state), and cross-load exactly.
    blob_a = flat.trainer.serialize(serialize_optimizer=True)
    blob_b = split.trainer.serialize(serialize_optimizer=True)
    assert json.dumps(blob_a, sort_keys=True) == json.dumps(
        blob_b, sort_keys=True
    )

    fresh_split = tc.create_from_config(2, 3, CONFIG, split_grid_state=True)
    fresh_split.trainer.deserialize(blob_a)  # flat blob -> split trainer
    fresh_flat = tc.create_from_config(2, 3, CONFIG)
    fresh_flat.trainer.deserialize(blob_b)

    # The blob stores the INFERENCE (EMA) params by reference design, so
    # fresh trainers don't bit-continue the originals — but flat and
    # split must load identically and stay in lockstep.
    for x, t in _batches(3, b=256):
        la = float(fresh_flat.trainer.training_step(x, t))
        lb = float(fresh_split.trainer.training_step(x, t))
        lc = float(flat.trainer.training_step(x, t))
        ld = float(split.trainer.training_step(x, t))
        assert la == lb
        assert lc == ld

    # Inference surfaces agree.
    x, _ = next(iter(_batches(1, b=128)))
    np.testing.assert_array_equal(
        np.asarray(flat.trainer.inference(x)),
        np.asarray(split.trainer.inference(x)),
    )


def test_split_state_average_wrapper_checkpoint_parity():
    """The Average wrapper's (n_samples, n) sample ring exercises the
    multi-dim per-weight join/split of the flat<->split opt-state
    bridge."""
    cfg = dict(
        CONFIG,
        optimizer={"otype": "Average", "n_samples": 4,
                   "nested": {"otype": "Adam", "learning_rate": 1e-2}},
    )
    flat = tc.create_from_config(2, 3, cfg)
    split = tc.create_from_config(2, 3, cfg, split_grid_state=True)
    for x, t in _batches(6):
        la = float(flat.trainer.training_step(x, t))
        lb = float(split.trainer.training_step(x, t))
        assert la == lb
    blob_a = flat.trainer.serialize(serialize_optimizer=True)
    blob_b = split.trainer.serialize(serialize_optimizer=True)
    assert json.dumps(blob_a, sort_keys=True) == json.dumps(
        blob_b, sort_keys=True
    )
    fresh = tc.create_from_config(2, 3, cfg, split_grid_state=True)
    fresh.trainer.deserialize(blob_a)
    np.testing.assert_array_equal(
        np.asarray(fresh.trainer.inference_params()),
        np.asarray(flat.trainer.inference_params()),
    )


def test_split_state_hyperparam_update_applies_to_leaves():
    split = tc.create_from_config(2, 3, CONFIG, split_grid_state=True)
    flat = tc.create_from_config(2, 3, CONFIG)
    for m in (split, flat):
        m.trainer.update_hyperparams(
            {"optimizer": {"nested": {"learning_rate": 3e-3}}}
        )
    for x, t in _batches(5):
        assert float(flat.trainer.training_step(x, t)) == float(
            split.trainer.training_step(x, t)
        )


def test_split_state_data_parallel():
    """The DP wrapper maps shardings over the state pytree generically —
    the split form must ride through it and match the flat DP run."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from tcnn_tpu.parallel import DataParallelTrainer, make_mesh

    flat = tc.create_from_config(2, 3, CONFIG)
    split = tc.create_from_config(2, 3, CONFIG, split_grid_state=True)
    dp_a = DataParallelTrainer(flat.trainer, make_mesh(jax.devices()))
    dp_b = DataParallelTrainer(split.trainer, make_mesh(jax.devices()))
    for x, t in _batches(4):
        la = float(dp_a.training_step(x, t))
        lb = float(dp_b.training_step(x, t))
        assert la == lb
    np.testing.assert_array_equal(
        np.asarray(flat.trainer.params), np.asarray(split.trainer.params)
    )


def test_deserialize_warns_on_auto_hash():
    """Loading a checkpoint into a model whose grid hash was
    auto-selected warns (a reference-trained default-hash checkpoint
    needs \"hash\": \"CoherentPrime\"); pinning the hash silences it."""
    from tcnn_tpu.utils.log import set_log_callback

    msgs = []
    set_log_callback(lambda sev, msg: msgs.append((sev, msg)))
    try:
        auto = tc.create_from_config(2, 3, CONFIG)
        blob = auto.trainer.serialize()
        msgs.clear()
        auto.trainer.deserialize(blob)
        assert any("CoherentPrime" in m for _, m in msgs)

        pinned_cfg = dict(
            CONFIG,
            encoding={**CONFIG["encoding"], "hash": "CoherentAdditive"},
        )
        pinned = tc.create_from_config(2, 3, pinned_cfg)
        msgs.clear()
        pinned.trainer.deserialize(pinned.trainer.serialize())
        assert not any("CoherentPrime" in m for _, m in msgs)
    finally:
        set_log_callback(None)


def test_split_state_rejects_unsupported():
    cfg = dict(CONFIG, optimizer={"otype": "Shampoo"})
    with pytest.raises(ValueError, match="does not support optimizer"):
        tc.create_from_config(2, 3, cfg, split_grid_state=True)
    cfg2 = dict(
        CONFIG,
        encoding={**CONFIG["encoding"], "gather_strategy": "quad_fused"},
    )
    with pytest.raises(ValueError, match="per-level gather"):
        tc.create_from_config(2, 3, cfg2, split_grid_state=True)
    cfg3 = dict(CONFIG, encoding={"otype": "Identity"})
    with pytest.raises(ValueError, match="per-level params"):
        tc.create_from_config(2, 3, cfg3, split_grid_state=True)

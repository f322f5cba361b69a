"""End-to-end trainer tests: the minimum slice of SURVEY.md §7 step 3 —
a 2D image fit learns, checkpoints round-trip, config surface works."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

import tcnn_tpu as tc


def _target_fn(xy):
    """Smooth synthetic 'image': (x,y) in [0,1]^2 -> 3 channels."""
    x, y = xy[:, 0], xy[:, 1]
    return np.stack(
        [
            0.5 + 0.5 * np.sin(4 * np.pi * x) * np.cos(3 * np.pi * y),
            0.5 + 0.5 * np.cos(2 * np.pi * (x + y)),
            (x + y) / 2,
        ],
        axis=1,
    ).astype(np.float32)


CONFIG_ONEBLOB = {
    "loss": {"otype": "RelativeL2"},
    "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
    "encoding": {"otype": "OneBlob", "n_bins": 16},
    "network": {
        "otype": "FullyFusedMLP",
        "activation": "ReLU",
        "output_activation": "None",
        "n_neurons": 64,
        "n_hidden_layers": 2,
    },
}

CONFIG_HASH = {
    "loss": {"otype": "RelativeL2"},
    "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
    "encoding": {
        "otype": "HashGrid",
        "n_levels": 8,
        "n_features_per_level": 2,
        "log2_hashmap_size": 14,
        "base_resolution": 8,
        "per_level_scale": 1.5,
    },
    "network": {
        "otype": "FullyFusedMLP",
        "n_neurons": 64,
        "n_hidden_layers": 2,
    },
}


def _train(config, steps=30, batch=1024, seed=0):
    model = tc.create_from_config(2, 3, config)
    r = np.random.default_rng(seed)
    losses = []
    for i in range(steps):
        xy = r.uniform(0, 1, (batch, 2)).astype(np.float32)
        target = _target_fn(xy)
        loss = model.training_step(jnp.asarray(xy), jnp.asarray(target))
        losses.append(float(loss))
    return model, losses


@pytest.mark.parametrize("config", [CONFIG_ONEBLOB, CONFIG_HASH],
                         ids=["oneblob", "hashgrid"])
def test_image_fit_loss_decreases(config):
    model, losses = _train(config)
    assert np.isfinite(losses).all()
    early = np.mean(losses[:5])
    late = np.mean(losses[-5:])
    assert late < early * 0.5, f"loss did not improve: {early} -> {late}"


def test_inference_matches_target_after_training():
    model, _ = _train(CONFIG_HASH, steps=150, batch=4096)
    r = np.random.default_rng(9)
    xy = r.uniform(0, 1, (512, 2)).astype(np.float32)
    pred = np.asarray(model.inference(jnp.asarray(xy)))
    assert pred.shape == (512, 3)
    err = np.abs(pred - _target_fn(xy)).mean()
    assert err < 0.15, f"mean abs error too high: {err}"


def test_serialize_roundtrip():
    model, _ = _train(CONFIG_HASH, steps=10)
    blob = model.trainer.serialize(serialize_optimizer=True)
    # JSON-serializable like the reference (trainer.h:442-455)
    encoded = json.dumps(blob)

    model2 = tc.create_from_config(2, 3, CONFIG_HASH, seed=999)
    model2.trainer.deserialize(json.loads(encoded))
    np.testing.assert_array_equal(
        np.asarray(model.trainer.params), np.asarray(model2.trainer.params)
    )
    x = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (64, 2)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(model.inference(x)), np.asarray(model2.inference(x))
    )
    # optimizer state restored
    s1 = model.trainer.state["opt"]["param_steps"]
    s2 = model2.trainer.state["opt"]["param_steps"]
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_param_count_and_packing():
    model = tc.create_from_config(2, 3, CONFIG_HASH)
    nwie = model.model
    assert nwie.n_params == nwie.network.n_params + nwie.encoding.n_params
    # network params first (network_with_input_encoding.h:115-130)
    sizes = nwie.layer_sizes()
    assert sum(r * c for r, c in sizes) == nwie.network.n_params


def test_deterministic_init_across_instances():
    m1 = tc.create_from_config(2, 3, CONFIG_HASH, seed=77)
    m2 = tc.create_from_config(2, 3, CONFIG_HASH, seed=77)
    np.testing.assert_array_equal(
        np.asarray(m1.trainer.params), np.asarray(m2.trainer.params)
    )
    m3 = tc.create_from_config(2, 3, CONFIG_HASH, seed=78)
    assert np.abs(np.asarray(m1.trainer.params)
                  - np.asarray(m3.trainer.params)).max() > 0


def test_update_hyperparams():
    model = tc.create_from_config(2, 3, CONFIG_ONEBLOB)
    model.trainer.update_hyperparams(
        {"optimizer": {"learning_rate": 1e-4}}
    )
    assert model.optimizer.hyperparams()["learning_rate"] == 1e-4


def test_loss_value_matches_manual_reduction():
    model = tc.create_from_config(2, 3, CONFIG_ONEBLOB)
    r = np.random.default_rng(4)
    xy = jnp.asarray(r.uniform(0, 1, (256, 2)), jnp.float32)
    target = jnp.asarray(_target_fn(np.asarray(xy)))
    out = model.trainer.forward(xy)
    values, _ = model.loss.evaluate(model.trainer.loss_scale, out, target)
    expected = float(values.sum())
    loss = float(model.training_step(xy, target))
    assert abs(loss - expected) / max(abs(expected), 1e-9) < 1e-5


def test_training_steps_scan_matches_sequential():
    # Trainer.training_steps folds N steps into one lax.scan dispatch
    # (the reference's CUDA-graph-replay analogue, trainer.h:344-350);
    # it must produce the same states/losses as N sequential
    # training_step calls when fed the same per-step batches.
    import jax

    r = np.random.default_rng(0)
    n, batch = 6, 512
    xs = jnp.asarray(r.uniform(0, 1, (n, batch, 2)).astype(np.float32))
    ts = jnp.stack([jnp.asarray(_target_fn(np.asarray(x))) for x in xs])

    m_seq = tc.create_from_config(2, 3, CONFIG_HASH, seed=7)
    seq_losses = [
        float(m_seq.training_step(xs[i], ts[i])) for i in range(n)
    ]

    m_scan = tc.create_from_config(2, 3, CONFIG_HASH, seed=7)
    losses = m_scan.trainer.training_steps(
        lambda i: (
            jnp.take(xs, i, axis=0),
            jnp.take(ts, i, axis=0),
        ),
        n,
    )
    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(seq_losses), rtol=2e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(m_scan.trainer.params),
        np.asarray(m_seq.trainer.params),
        rtol=2e-5,
        atol=2e-6,
    )

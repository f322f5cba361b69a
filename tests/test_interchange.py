"""Reference-checkpoint interchange (reference: trainer.h:442-482,
adam.h:304-325, gpu_memory_json.h:36-71).

The golden fixture (tests/data/interchange_fixture.msgpack) freezes the
byte layout; the grid offset table is re-derived BY HAND here from the
reference's construction rules so layout parity is asserted against the
spec, not just by construction.
"""

import importlib.util
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tcnn_tpu as tc
from tcnn_tpu import interchange

DATA = Path(__file__).resolve().parent / "data"

_spec = importlib.util.spec_from_file_location(
    "make_interchange_fixture", DATA / "make_interchange_fixture.py"
)
_fixture_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_fixture_mod)
FIXTURE_CONFIG = _fixture_mod.FIXTURE_CONFIG


def _fixture_model():
    return tc.create_from_config(2, 1, FIXTURE_CONFIG)


def test_hand_computed_grid_offsets():
    """Offsets derived by hand from grid.h:695-737 for the fixture config
    (2D, 3 levels, base_res 2, scale 2.0, hashmap 2^4 = 16 rows):

    level 0: scale = 2^0*2-1 = 1, res = ceil(1)+1 = 2; dense size
             res^2 = 4 -> next_multiple(4, 8) = 8; min(8, 16) = 8.
    level 1: scale = 3, res = 4; 16 -> 16; min(16, 16) = 16.
    level 2: scale = 7, res = 8; 64 -> 64; hashed: min(64, 16) = 16.

    offset table = [0, 8, 24, 40]; n_params = 40 * 2 features = 80.
    Params vector = [network (512) | encoding (80)]
    (network_with_input_encoding.h:115-130).
    """
    model = _fixture_model()
    enc = model.model.encoding
    assert enc.offset_table.tolist() == [0, 8, 24, 40]
    assert enc.n_params == 80
    assert enc._use_hash == [False, False, True]
    assert model.model.network.n_params == 512
    assert model.trainer.n_params == 592


def test_fixture_forward_outputs():
    """Loading the committed snapshot reproduces the frozen outputs."""
    model = _fixture_model()
    blob = interchange.from_msgpack(
        (DATA / "interchange_fixture.msgpack").read_bytes()
    )
    interchange.deserialize_trainer(model.trainer, blob)
    exp = np.load(DATA / "interchange_expected.npz")
    np.testing.assert_array_equal(
        np.asarray(model.trainer.params), exp["params"]
    )
    y = np.asarray(model.trainer.inference(jnp.asarray(exp["x"])))
    np.testing.assert_allclose(y, exp["y"], rtol=1e-4, atol=1e-5)


def test_fixture_byte_level_roundtrip():
    """deserialize(fixture) -> serialize == identical bytes."""
    model = _fixture_model()
    raw = (DATA / "interchange_fixture.msgpack").read_bytes()
    blob = interchange.from_msgpack(raw)
    interchange.deserialize_trainer(model.trainer, blob)
    out = interchange.serialize_trainer(
        model.trainer, serialize_optimizer_state=True
    )
    assert bytes(out["params_binary"]) == bytes(blob["params_binary"])
    for k in (
        "first_moments_binary",
        "second_moments_binary",
        "param_steps_binary",
    ):
        assert bytes(out["optimizer"][k]) == bytes(blob["optimizer"][k]), k
    assert out["optimizer"]["current_step"] == blob["optimizer"]["current_step"]
    assert out["n_params"] == blob["n_params"]
    # Full msgpack dump byte-identity.
    assert interchange.to_msgpack(out) == raw


def test_text_json_spelling():
    """nlohmann dump() spells binary_t as {"bytes": [...], "subtype": ...};
    our text path must emit and accept that (gpu_memory_json.h:48-66)."""
    model = _fixture_model()
    blob = model.trainer.serialize(serialize_optimizer=True)
    text = json.dumps(blob)  # must be pure-JSON-able
    parsed = json.loads(text)
    assert "bytes" in parsed["params_binary"]

    model2 = _fixture_model()
    model2.trainer.deserialize(parsed)
    np.testing.assert_array_equal(
        np.asarray(model2.trainer.params), np.asarray(model.trainer.params)
    )
    np.testing.assert_array_equal(
        np.asarray(model2.trainer.state["opt"]["first_moments"]),
        np.asarray(model.trainer.state["opt"]["first_moments"]),
    )


def test_half_params_accepted():
    """The reference writes __half params when built fp16
    (trainer.h:459-476); loading them must work."""
    model = _fixture_model()
    p16 = np.asarray(model.trainer.params).astype(np.float16)
    blob = {
        "n_params": model.trainer.n_params,
        "params_type": "__half",
        "params_binary": interchange.Binary(p16.tobytes()),
    }
    interchange.deserialize_trainer(model.trainer, blob)
    np.testing.assert_array_equal(
        np.asarray(model.trainer.params), p16.astype(np.float32)
    )


@pytest.mark.parametrize(
    "opt_cfg",
    [
        {"otype": "SGD", "learning_rate": 1e-2},
        {"otype": "Novograd", "learning_rate": 1e-2},
        {"otype": "EMA", "decay": 0.95, "nested": {"otype": "Adam"}},
        {"otype": "Average", "n_samples": 4, "nested": {"otype": "Adam"}},
        {"otype": "Batched", "batch_size_multiplier": 2,
         "nested": {"otype": "Adam"}},
        {"otype": "Lookahead", "nested": {"otype": "Adam"}},
        {"otype": "ExponentialDecay", "decay_base": 0.5,
         "decay_start": 2, "decay_interval": 2, "decay_end": 100,
         "nested": {"otype": "Adam"}},
    ],
)
def test_optimizer_state_roundtrip(opt_cfg):
    """Every serializable optimizer round-trips its state through the
    reference layout after real training steps."""
    cfg = {**FIXTURE_CONFIG, "optimizer": opt_cfg}
    model = tc.create_from_config(2, 1, cfg)
    r = np.random.default_rng(0)
    x = jnp.asarray(r.uniform(0, 1, (128, 2)).astype(np.float32))
    t = jnp.asarray(r.uniform(0, 1, (128, 1)).astype(np.float32))
    for _ in range(5):
        model.trainer.training_step(x, t)

    blob = interchange.serialize_trainer(
        model.trainer, serialize_optimizer_state=True
    )
    # Round-trip through the msgpack bytes.
    blob2 = interchange.from_msgpack(interchange.to_msgpack(blob))

    model2 = tc.create_from_config(2, 1, cfg)
    interchange.deserialize_trainer(model2.trainer, blob2)

    la, ta = jax.tree_util.tree_flatten(model.trainer.state["opt"])
    lb, tb = jax.tree_util.tree_flatten(model2.trainer.state["opt"])
    assert ta == tb
    for va, vb in zip(la, lb):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb))

    has_custom = (
        model.trainer.optimizer.custom_weights(model.trainer.state["opt"])
        is not None
    )
    if has_custom:
        # Like the reference, the snapshot stores the INFERENCE params
        # (trainer.h:449 serializes m_params_inference): for EMA/Average/
        # Lookahead the training weights are intentionally not preserved,
        # but inference outputs must match.
        ya = np.asarray(model.trainer.inference(x))
        yb = np.asarray(model2.trainer.inference(x))
        np.testing.assert_allclose(ya, yb, rtol=1e-5, atol=1e-6)
    else:
        # Resumed training continues identically.
        for _ in range(3):
            l1 = model.trainer.training_step(x, t)
            l2 = model2.trainer.training_step(x, t)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_shampoo_serialize_raises():
    """(reference: shampoo.h:963-965)"""
    cfg = {**FIXTURE_CONFIG, "optimizer": {"otype": "Shampoo"}}
    model = tc.create_from_config(2, 1, cfg)
    with pytest.raises(NotImplementedError, match="Shampoo"):
        interchange.serialize_trainer(
            model.trainer, serialize_optimizer_state=True
        )

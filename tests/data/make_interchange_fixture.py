"""Generates the committed golden interchange fixture.

The fixture is a reference-layout trainer snapshot
(``interchange_fixture.msgpack``, the format of trainer.h:442-455 +
adam.h:304-325 dumped via nlohmann-style MessagePack) for a tiny
HashGrid+MLP model whose grid offset table is HAND-DERIVED from the
reference's construction rules (grid.h:695-737) in
tests/test_interchange.py, plus a sidecar ``interchange_expected.npz``
with probe inputs and the model's forward outputs at fixture params.

Run from the repo root:  python tests/data/make_interchange_fixture.py
"""

import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

import tcnn_tpu as tc  # noqa: E402
from tcnn_tpu import interchange  # noqa: E402

FIXTURE_CONFIG = {
    "loss": {"otype": "RelativeL2"},
    "optimizer": {
        "otype": "Adam",
        "learning_rate": 1e-2,
        "beta1": 0.9,
        "beta2": 0.99,
        "epsilon": 1e-15,
    },
    "encoding": {
        "otype": "HashGrid",
        "n_levels": 3,
        "n_features_per_level": 2,
        "log2_hashmap_size": 4,
        "base_resolution": 2,
        "per_level_scale": 2.0,
        # The fixture freezes REFERENCE-written checkpoint semantics:
        # pin the reference's default hash (the package default is
        # "auto" = CoherentAdditive since round 5).
        "hash": "CoherentPrime",
    },
    "network": {
        "otype": "CutlassMLP",
        "activation": "ReLU",
        "output_activation": "None",
        "n_neurons": 16,
        "n_hidden_layers": 1,
    },
}


def main():
    out_dir = Path(__file__).resolve().parent
    model = tc.create_from_config(2, 1, FIXTURE_CONFIG)
    trainer = model.trainer
    n = trainer.n_params

    # Deterministic, position-identifying params: param i = ((i*7) % 83)/83.
    params = (((np.arange(n) * 7) % 83) / 83.0).astype(np.float32)
    trainer.params = params

    # Deterministic optimizer state ramps (for byte-level roundtrip).
    opt = trainer.state["opt"]
    opt = {
        "step": np.int32(42),
        "first_moments": (np.arange(n) % 17 / 17.0).astype(np.float32),
        "second_moments": (np.arange(n) % 13 / 13.0).astype(np.float32),
        "param_steps": (np.arange(n) % 5).astype(np.int32),
    }
    import jax.numpy as jnp

    trainer.state["opt"] = {k: jnp.asarray(v) for k, v in opt.items()}

    blob = interchange.serialize_trainer(trainer, serialize_optimizer_state=True)
    (out_dir / "interchange_fixture.msgpack").write_bytes(
        interchange.to_msgpack(blob)
    )

    # Probe forward outputs.
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (64, 2)).astype(np.float32)
    y = np.asarray(trainer.inference(jnp.asarray(x)))
    np.savez(out_dir / "interchange_expected.npz", x=x, y=y, params=params)
    print(
        f"wrote fixture: n_params={n}, "
        f"offsets={model.model.encoding.offset_table.tolist()}"
    )


if __name__ == "__main__":
    main()

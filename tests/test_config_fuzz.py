"""Config-surface fuzz: random valid JSON configs must construct, train a
step, and infer without errors. Guards the factory plumbing (alignment
propagation, param packing, optimizer allocation) across the whole
combinatorial surface."""

import jax.numpy as jnp
import numpy as np
import pytest

import tcnn_tpu as tc

ENCODINGS = [
    lambda r: {"otype": "Identity", "scale": float(r.uniform(0.5, 2.0))},
    lambda r: {"otype": "OneBlob", "n_bins": int(2 ** r.integers(2, 6))},
    lambda r: {"otype": "Frequency", "n_frequencies": int(r.integers(2, 10))},
    lambda r: {"otype": "TriangleWave", "n_frequencies": int(r.integers(2, 8))},
    lambda r: {
        "otype": "HashGrid",
        "n_levels": int(r.integers(2, 8)),
        "n_features_per_level": int(r.choice([1, 2, 4, 8])),
        "log2_hashmap_size": int(r.integers(8, 14)),
        "base_resolution": int(r.choice([2, 4, 8, 16])),
        "per_level_scale": float(r.uniform(1.2, 2.0)),
        "interpolation": str(r.choice(["Linear", "Smoothstep", "Nearest"])),
        "hash": str(r.choice(
            ["CoherentPrime", "Prime", "BaseConvert", "CoherentAdditive"]
        )),
        "gather_strategy": str(
            r.choice(["per_level", "quad", "fused", "stratified"])
        ),
        "scatter_strategy": str(
            r.choice(["auto", "xla", "factored", "factored_fused"])
        ),
        "quad_pack": str(r.choice(["auto", "hybrid", "packed", "off"])),
    },
    lambda r: {"otype": "DenseGrid", "n_levels": int(r.integers(2, 5)),
               "base_resolution": int(r.choice([2, 4, 8]))},
    lambda r: {"otype": "NRC"},
]

NETWORKS = [
    lambda r: {"otype": "FullyFusedMLP",
               "n_neurons": int(r.choice([16, 32, 64, 128])),
               "n_hidden_layers": int(r.integers(1, 4)),
               "activation": str(r.choice(["ReLU", "LeakyReLU", "Tanh",
                                           "Sigmoid", "SiLU"]))},
    lambda r: {"otype": "CutlassMLP", "n_neurons": int(r.choice([8, 24, 48, 96])),
               "n_hidden_layers": int(r.integers(0, 4)),
               "activation": str(r.choice(["ReLU", "Squareplus", "Softplus"]))},
]

OPTIMIZERS = [
    lambda r: {"otype": "Adam", "learning_rate": float(10 ** r.uniform(-4, -2))},
    lambda r: {"otype": "SGD", "learning_rate": 1e-3},
    lambda r: {"otype": "Novograd"},
    lambda r: {"otype": str(r.choice(["EMA", "Lookahead", "Batched"])),
               "nested": {"otype": "Adam"}},
]

LOSSES = ["L2", "RelativeL2", "L1", "RelativeL1", "Mape", "Smape",
          "RelativeL2Luminance"]


@pytest.mark.parametrize("seed", range(12))
def test_random_config_trains(seed):
    r = np.random.default_rng(seed)
    n_in = int(r.integers(1, 6))
    if n_in < 2:
        n_in = 2  # grids need >=1; keep >=2 for generality
    n_out = int(r.integers(1, 6))
    loss_name = str(r.choice(LOSSES))
    if loss_name == "RelativeL2Luminance" and n_out < 3:
        n_out = 3
    config = {
        "loss": {"otype": loss_name},
        "optimizer": OPTIMIZERS[int(r.integers(len(OPTIMIZERS)))](r),
        "encoding": ENCODINGS[int(r.integers(len(ENCODINGS)))](r),
        "network": NETWORKS[int(r.integers(len(NETWORKS)))](r),
    }
    if config["encoding"]["otype"] == "NRC" and n_in < 8:
        n_in = 9

    try:
        model = tc.create_from_config(n_in, n_out, config, seed=seed)
    except ValueError as e:
        if "exceed int32 indexing range" in str(e):
            # Legitimately rejected: the sampled (dense grid, n_dims) combo
            # wants a >2^31-row table — unaddressable on any backend.
            pytest.skip(f"oversized grid config: {e}")
        raise
    x = jnp.asarray(r.uniform(0, 1, (128, n_in)).astype(np.float32))
    t = jnp.asarray(r.uniform(0.1, 0.9, (128, n_out)).astype(np.float32))
    l1 = float(model.training_step(x, t))
    l2 = float(model.training_step(x, t))
    assert np.isfinite(l1) and np.isfinite(l2), config
    out = np.asarray(model.inference(x))
    assert out.shape == (128, n_out)
    assert np.isfinite(out).all(), config

"""float16 compute path + loss-scale-128 regime.

The reference's default regime is __half compute with a fixed loss scale
of 128 divided out in the optimizer (reference: common.h:240-244,
adam.h:78, trainer.h:137). bf16 is the right TPU default, but the fp16
knob must actually work (VERDICT r1, missing #5).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import tcnn_tpu as tc

CONFIG = {
    "loss": {"otype": "RelativeL2"},
    "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
    "encoding": {
        "otype": "HashGrid",
        "n_levels": 4,
        "n_features_per_level": 2,
        "log2_hashmap_size": 8,
        "base_resolution": 4,
        "per_level_scale": 1.5,
    },
    "network": {
        "otype": "CutlassMLP",
        "n_neurons": 16,
        "n_hidden_layers": 1,
    },
}


@pytest.mark.parametrize("precision", ["float16", "bfloat16"])
def test_half_precision_loss_scale_default(precision):
    model = tc.create_from_config(2, 3, CONFIG, precision=precision)
    # (reference: common.h:240-244 — 128 for half precision, 1 for fp32)
    assert model.trainer.loss_scale == 128.0
    assert model.model.compute_dtype == jnp.dtype(precision)


def test_fp32_loss_scale_default():
    model = tc.create_from_config(2, 3, CONFIG, precision="float32")
    assert model.trainer.loss_scale == 1.0


@pytest.mark.parametrize("net", ["CutlassMLP", "FullyFusedMLP"])
def test_fp16_training_converges(net):
    cfg = {**CONFIG, "network": {**CONFIG["network"], "otype": net}}
    model = tc.create_from_config(2, 3, cfg, precision="float16")
    if net == "FullyFusedMLP":
        model.model.network.use_pallas = True  # width 16 defaults to chain
    r = np.random.default_rng(0)
    xy = jnp.asarray(r.uniform(0, 1, (512, 2)).astype(np.float32))
    t = jnp.asarray(
        np.stack(
            [np.asarray(xy[:, 0]), np.asarray(xy[:, 1]),
             np.asarray(xy).sum(1) / 2], 1
        ).astype(np.float32)
    )
    l0 = float(model.training_step(xy, t))
    for _ in range(30):
        loss = float(model.training_step(xy, t))
    assert np.isfinite(loss) and loss < l0
    # fp32 master params stay fp32; the forward runs in fp16.
    assert model.trainer.params.dtype == jnp.float32
    assert model.trainer.forward(xy).dtype == jnp.float16


def test_fp16_matches_fp32_direction():
    """One step of fp16 (scale 128) vs fp32 (scale 1): updates agree to
    half precision — the scale must cancel exactly in the optimizer."""
    r = np.random.default_rng(1)
    xy = jnp.asarray(r.uniform(0, 1, (512, 2)).astype(np.float32))
    t = jnp.asarray(r.uniform(0, 1, (512, 3)).astype(np.float32))
    deltas = {}
    for prec in ("float16", "float32"):
        model = tc.create_from_config(2, 3, CONFIG, seed=5, precision=prec)
        p0 = np.asarray(model.trainer.params).copy()
        model.training_step(xy, t)
        deltas[prec] = np.asarray(model.trainer.params) - p0
    # Direction cosine: the fp16 update points the same way.
    a, b = deltas["float16"].ravel(), deltas["float32"].ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.99

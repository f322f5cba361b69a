"""Fused Pallas Adam kernel vs the XLA expression of the same tcnn
semantics (reference: optimizers/adam.h:47-127) — the two paths must agree
to fp32 roundoff across the full knob matrix, including the subtle bits:
skip-zero-grad on non-matrix params, per-param step debiasing, AdaBound,
weight decay/clip, and the matrix/non-matrix split boundary."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcnn_tpu.optimizers import AdamOptimizer


def make_opt(n, n_matrix, **hp):
    opt = AdamOptimizer(hp)
    # n_matrix_weights derives from layer_sizes (matrix params lead the
    # flat vector); build a single layer of the wanted size.
    opt.allocate(n, [(1, n_matrix)] if n_matrix else [])
    assert opt.n_matrix_weights == n_matrix
    return opt


def run_steps(opt, fused, n, seed=0, steps=3, loss_scale=128.0):
    opt.fused = fused
    rng = np.random.default_rng(seed)
    params = jnp.asarray(rng.normal(0, 0.3, (n,)).astype(np.float32))
    state = opt.init_state()
    step = jax.jit(
        lambda s, p, g: opt.step(s, p, g, loss_scale), donate_argnums=()
    )
    for i in range(steps):
        g = rng.normal(0, 1.0, (n,)).astype(np.float32) * loss_scale
        # sprinkle exact zeros to exercise skip_zero_grad_non_matrix_params
        g[rng.random(n) < 0.3] = 0.0
        state, params = step(state, params, jnp.asarray(g))
    return state, params


KNOBS = [
    {},
    {"l2_reg": 1e-4, "non_matrix_l2_reg": 1e-5},
    {"non_matrix_learning_rate_factor": 0.5},
    {"relative_decay": 1e-3, "absolute_decay": 1e-4},
    {"clipping_magnitude": 0.25, "gradient_clipping_magnitude": 0.5},
    {"adabound": True},
    {"optimize_matrix_params": False},
    {"optimize_non_matrix_params": False},
    {"skip_zero_grad_non_matrix_params": False},
    {"beta1": 0.5, "beta2": 0.9, "epsilon": 1e-15, "learning_rate": 1e-2},
]


@pytest.mark.parametrize("hp", KNOBS, ids=[str(sorted(k)) for k in KNOBS])
@pytest.mark.parametrize("n,n_matrix", [(1000, 128), (8192, 8192), (300, 0)])
def test_fused_matches_xla(hp, n, n_matrix):
    opt = make_opt(n, n_matrix, **hp)
    s_x, p_x = run_steps(opt, fused=False, n=n)
    opt2 = make_opt(n, n_matrix, **hp)
    s_f, p_f = run_steps(opt2, fused=True, n=n)
    np.testing.assert_allclose(
        np.asarray(p_f), np.asarray(p_x), rtol=1e-6, atol=1e-7
    )
    for k in ("first_moments", "second_moments"):
        np.testing.assert_allclose(
            np.asarray(s_f[k]), np.asarray(s_x[k]), rtol=1e-6, atol=1e-7
        )
    np.testing.assert_array_equal(
        np.asarray(s_f["param_steps"]), np.asarray(s_x["param_steps"])
    )
    assert int(s_f["step"]) == int(s_x["step"])


def test_fused_in_trainer_end_to_end():
    """A small training run with fused=True descends identically to
    fused=False (same config, same data)."""
    import tcnn_tpu as tc

    def fit(fused):
        cfg = {
            "loss": {"otype": "RelativeL2"},
            "optimizer": {
                "otype": "Adam",
                "learning_rate": 1e-2,
                "beta2": 0.99,
                "epsilon": 1e-15,
                "l2_reg": 1e-6,
                "fused": fused,
            },
            "encoding": {
                "otype": "HashGrid",
                "n_levels": 4,
                "log2_hashmap_size": 10,
                "base_resolution": 4,
            },
            "network": {
                "otype": "CutlassMLP",
                "n_neurons": 16,
                "n_hidden_layers": 1,
            },
        }
        m = tc.create_from_config(2, 3, cfg)
        r = np.random.default_rng(0)
        for _ in range(20):
            xy = jnp.asarray(r.uniform(0, 1, (512, 2)).astype(np.float32))
            t = jnp.stack([xy[:, 0], xy[:, 1], xy[:, 0] * xy[:, 1]], 1)
            loss = m.training_step(xy, t)
        return float(loss), np.asarray(m.params)

    loss_x, p_x = fit(False)
    loss_f, p_f = fit(True)
    assert loss_f < 0.5  # actually descending
    np.testing.assert_allclose(loss_f, loss_x, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(p_f, p_x, rtol=1e-5, atol=1e-6)

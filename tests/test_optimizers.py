"""Optimizer semantics tests (vs straight numpy reimplementations of the
reference kernels)."""

import jax
import jax.numpy as jnp
import numpy as np

import tcnn_tpu as tc

from utils import match_rae

N = 64
LAYERS = [(4, 8)]  # 32 matrix weights; the other 32 are "non-matrix"
N_MATRIX = 32
LOSS_SCALE = 128.0


def _mk(cfg):
    opt = tc.create_optimizer(cfg)
    opt.allocate(N, LAYERS)
    return opt, opt.init_state()


def test_adam_matches_numpy_reference():
    lr, b1, b2, eps, l2 = 1e-2, 0.9, 0.999, 1e-8, 1e-8
    opt, state = _mk({"otype": "Adam", "learning_rate": lr, "beta1": b1,
                      "beta2": b2, "epsilon": eps, "l2_reg": l2})
    r = np.random.default_rng(0)
    params = r.standard_normal(N).astype(np.float32)
    m = np.zeros(N); v = np.zeros(N); steps = np.zeros(N, np.int64)
    p_ref = params.copy()
    jp = jnp.asarray(params)

    for it in range(5):
        grads = r.standard_normal(N).astype(np.float32) * LOSS_SCALE
        # zero some non-matrix gradients to exercise skip-zero-grad
        grads[40:50] = 0.0
        state, jp = jax.jit(opt.step)(state, jp, jnp.asarray(grads), LOSS_SCALE)

        # numpy reference (adam.h:47-127)
        g = grads / LOSS_SCALE
        active = np.ones(N, bool)
        active[N_MATRIX:] &= g[N_MATRIX:] != 0
        g = g + np.where(np.arange(N) < N_MATRIX, l2, 0.0) * p_ref
        m_new = b1 * m + (1 - b1) * g
        v_new = b2 * v + (1 - b2) * g * g
        steps_new = steps + active
        ps = np.maximum(steps_new, 1)
        lr_t = lr * np.sqrt(1 - b2**ps) / (1 - b1**ps)
        upd = p_ref - np.minimum(
            np.maximum(lr_t / (np.sqrt(v_new) + eps), 0), np.finfo(np.float32).max
        ) * m_new
        p_ref = np.where(active, upd, p_ref)
        m = np.where(active, m_new, m)
        v = np.where(active, v_new, v)
        steps = steps_new

    match_rae(np.asarray(jp), p_ref, 1e-3, percentile=100)  # fp32 vs fp64 ref
    np.testing.assert_array_equal(np.asarray(state["param_steps"]), steps)


def test_sgd():
    opt, state = _mk({"otype": "SGD", "learning_rate": 0.1, "l2_reg": 0.0})
    params = jnp.ones(N)
    grads = jnp.full(N, 2.0 * LOSS_SCALE)
    state, new_params = jax.jit(opt.step)(state, params, grads, LOSS_SCALE)
    np.testing.assert_allclose(np.asarray(new_params), 1.0 - 0.1 * 2.0, rtol=1e-6)


def test_novograd_leaves_non_matrix_untouched():
    opt, state = _mk({"otype": "Novograd", "learning_rate": 1e-2})
    r = np.random.default_rng(1)
    params = jnp.asarray(r.standard_normal(N).astype(np.float32))
    grads = jnp.asarray(r.standard_normal(N).astype(np.float32))
    state, new_params = jax.jit(opt.step)(state, params, grads, 1.0)
    got = np.asarray(new_params)
    # matrix params moved, non-matrix unchanged (novograd.h:131-168)
    assert np.abs(got[:N_MATRIX] - np.asarray(params)[:N_MATRIX]).max() > 0
    np.testing.assert_array_equal(got[N_MATRIX:], np.asarray(params)[N_MATRIX:])


def test_ema_custom_weights():
    opt, state = _mk({"otype": "EMA", "decay": 0.9,
                      "nested": {"otype": "SGD", "learning_rate": 0.0,
                                 "l2_reg": 0.0}})
    params = jnp.full(N, 3.0)
    grads = jnp.zeros(N)
    state, params = jax.jit(opt.step)(state, params, grads, 1.0)
    # step 1: debias makes EMA == weights exactly
    np.testing.assert_allclose(np.asarray(opt.custom_weights(state)), 3.0,
                               rtol=1e-6)


def test_average_window():
    opt, state = _mk({"otype": "Average", "n_samples": 4,
                      "nested": {"otype": "SGD", "learning_rate": 1.0,
                                 "l2_reg": 0.0}})
    params = jnp.zeros(N)
    for i in range(4):
        grads = jnp.full(N, -1.0)  # each step adds +1
        state, params = jax.jit(opt.step)(state, params, grads, 1.0)
    # params went 1,2,3,4 -> average = 2.5
    np.testing.assert_allclose(np.asarray(opt.custom_weights(state)), 2.5,
                               rtol=1e-6)


def test_batched_steps_every_n():
    opt, state = _mk({"otype": "Batched", "batch_size_multiplier": 4,
                      "nested": {"otype": "SGD", "learning_rate": 1.0,
                                 "l2_reg": 0.0}})
    params = jnp.zeros(N)
    for i in range(8):
        grads = jnp.full(N, 4.0)
        state, params = jax.jit(opt.step)(state, params, grads, 1.0)
    # nested stepped twice with averaged gradient 4/4=... pool=sum(g/4)=4
    # -> after 8 calls: 2 nested steps, each -lr*4
    np.testing.assert_allclose(np.asarray(params), -8.0, rtol=1e-6)


def test_lookahead_sync():
    opt, state = _mk({"otype": "Lookahead", "alpha": 0.5, "n_steps": 2,
                      "nested": {"otype": "SGD", "learning_rate": 1.0,
                                 "l2_reg": 0.0}})
    params = jnp.zeros(N)
    for _ in range(4):
        state, params = jax.jit(opt.step)(state, params, jnp.full(N, 1.0), 1.0)
    assert np.isfinite(np.asarray(params)).all()
    assert np.isfinite(np.asarray(opt.custom_weights(state))).all()


def test_exponential_decay_factor():
    opt, state = _mk({
        "otype": "ExponentialDecay", "decay_base": 0.5, "decay_interval": 2,
        "decay_start": 2, "decay_end": 100,
        "nested": {"otype": "SGD", "learning_rate": 1.0, "l2_reg": 0.0},
    })
    params = jnp.zeros(N)
    deltas = []
    prev = 0.0
    for i in range(6):
        state, params = jax.jit(opt.step)(state, params, jnp.full(N, 1.0), 1.0)
        cur = float(params[0])
        deltas.append(prev - cur)  # positive step magnitude
        prev = cur
    # steps 0,1 at lr 1.0; steps 2,3 at 0.5; steps 4,5 at 0.25
    np.testing.assert_allclose(deltas, [1, 1, 0.5, 0.5, 0.25, 0.25], rtol=1e-5)


def test_composite_ranges():
    opt = tc.create_optimizer({
        "otype": "Composite",
        "nested": [
            {"otype": "SGD", "learning_rate": 1.0, "l2_reg": 0.0,
             "n_params_to_optimize": N_MATRIX},
            {"otype": "SGD", "learning_rate": 0.5, "l2_reg": 0.0},
        ],
    })
    opt.allocate(N, LAYERS)
    state = opt.init_state()
    params = jnp.zeros(N)
    state, params = jax.jit(opt.step)(state, params, jnp.full(N, 1.0), 1.0)
    got = np.asarray(params)
    np.testing.assert_allclose(got[:N_MATRIX], -1.0, rtol=1e-6)
    np.testing.assert_allclose(got[N_MATRIX:], -0.5, rtol=1e-6)


def test_default_optimizer_is_adam():
    assert tc.create_optimizer({}).otype == "Adam"


def test_hyperparams_roundtrip():
    cfg = {"otype": "Adam", "learning_rate": 5e-3, "beta1": 0.85}
    opt = tc.create_optimizer(cfg)
    hp = opt.hyperparams()
    assert hp["learning_rate"] == 5e-3
    assert hp["beta1"] == 0.85
    opt.update_hyperparams({"learning_rate": 1e-4})
    assert opt.hyperparams()["learning_rate"] == 1e-4

"""level_split (round 4): the per-level parameter split with a one-concat
transpose (grid.py:_split_levels) must be a pure gradient-ASSEMBLY change —
values and gradients bit-identical to the flat form on every per-level
path, at any differentiation order.

Reference semantics being preserved: the grid's flat parameter vector and
its per-level offset layout (reference: encodings/grid.h:214-320); the
split only changes how per-level adjoints are put back together.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tcnn_tpu as tc
from tcnn_tpu.utils.sampling import stratified_uniform


def _cfg(extra):
    c = {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
        "encoding": {
            "otype": "HashGrid", "n_levels": 8, "n_features_per_level": 2,
            "log2_hashmap_size": 10, "base_resolution": 4,
            "per_level_scale": 1.5, "hash": "CoherentAdditive",
            "gather_strategy": "stratified", "phase_locked": True,
            "locked_phases": 1,
        },
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    }
    c["encoding"].update(extra)
    return c


CASES = {
    "locked": {},
    "stratified": {"phase_locked": False},
    "quad_hybrid": {"gather_strategy": "quad", "phase_locked": False},
    "locked_g4": {"locked_phases": 4},
    # "barrier" pins the per-level slices 1D (diagnostic; measured a big
    # composed NEGATIVE on v5e — 110.2 vs 78.8 ms at 3D NeRF scale, the
    # barrier forces 24 per-level lane-padded reshape materializations —
    # but it must stay bit-exact).
    "locked_barrier": {"level_split": "barrier"},
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_split_gradients_bit_identical(case):
    extra = CASES[case]
    B = 4096
    x = stratified_uniform(jax.random.PRNGKey(0), B, 2, phase_locked=1)
    t = jax.random.uniform(jax.random.PRNGKey(1), (B, 3), jnp.float32)

    m_on = tc.create_from_config(2, 3, _cfg(extra), seed=7)
    m_off = tc.create_from_config(
        2, 3, _cfg({**extra, "level_split": "off"}), seed=7
    )
    p = m_on.trainer.state["params"]

    def loss(model):
        def f(pp):
            out = model.trainer.model.apply(pp, x)
            return jnp.sum((out[:, :3].astype(jnp.float32) - t) ** 2)
        return f

    v_on, g_on = jax.value_and_grad(loss(m_on))(p)
    v_off, g_off = jax.value_and_grad(loss(m_off))(p)
    assert jnp.array_equal(v_on, v_off)
    assert jnp.array_equal(g_on, g_off)


def test_split_second_order_param_grads():
    """grad-of-grad w.r.t. params composes through the split (every split
    output is consumed on the per-level branch, so linear_call's
    jvp-of-transpose never sees a symbolic-Zero cotangent)."""
    B = 1024
    x = stratified_uniform(jax.random.PRNGKey(0), B, 2, phase_locked=1)
    m = tc.create_from_config(2, 3, _cfg({}), seed=3)
    m_off = tc.create_from_config(2, 3, _cfg({"level_split": "off"}), seed=3)
    p = m.trainer.state["params"]

    def make(model):
        def f(pp):
            out = model.trainer.model.apply(pp, x)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        def gg(pp):
            return jnp.sum(jax.grad(f)(pp) ** 2)

        return gg

    h_on = jax.grad(make(m))(p)
    h_off = jax.grad(make(m_off))(p)
    np.testing.assert_allclose(
        np.asarray(h_on), np.asarray(h_off), rtol=1e-6, atol=1e-6
    )


def test_split_input_gradients_and_vmap():
    """Input gradients (the split is constant w.r.t. x) and the vmap
    fallback (no linear_call batching rule) both stay available."""
    B = 256
    x = stratified_uniform(jax.random.PRNGKey(0), B, 2, phase_locked=1)
    m = tc.create_from_config(
        2, 3, _cfg({"gather_strategy": "quad", "phase_locked": False}), seed=5
    )
    p = m.trainer.state["params"]
    model = m.trainer.model

    gx = jax.grad(lambda xx: jnp.sum(model.apply(p, xx).astype(jnp.float32)))(x)
    assert np.isfinite(np.asarray(gx)).all()

    # vmap over a leading parameter axis exercises the NotImplementedError
    # fallbacks in _split_levels and the lookups.
    stacked = jnp.stack([p, p])
    out = jax.vmap(lambda pp: model.apply(pp, x))(stacked)
    ref = model.apply(p, x)
    np.testing.assert_allclose(
        np.asarray(out[0], np.float32), np.asarray(ref, np.float32),
        rtol=1e-6, atol=1e-6,
    )

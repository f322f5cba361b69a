"""Second-order differentiation across ALL execution paths.

The reference supports double-backward natively only for the grid encoding
(reference: encodings/grid.h:910-1042, semantics documented in
scripts/test_grid_bwdbwd.py:119-193); every other object throws
(object.h:479-483). Here grad∘grad / jvp must work on every path
combination: the factored-scatter gathers are linear_call ops (any-order
custom transpose), and the fused Pallas MLP auto-routes forward-mode
traces to the differentiable XLA chain (networks/fully_fused.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tcnn_tpu as tc
from tcnn_tpu.utils.sampling import stratified_uniform


def _model(gather, scatter, net, n_out=1):
    cfg = {
        "loss": {"otype": "L2"},
        "optimizer": {"otype": "SGD", "learning_rate": 1e-2},
        "encoding": {
            "otype": "HashGrid",
            "n_levels": 4,
            "n_features_per_level": 2,
            "log2_hashmap_size": 8,
            "base_resolution": 4,
            "per_level_scale": 1.5,
            "hash": "CoherentAdditive",
            "gather_strategy": gather,
            "scatter_strategy": scatter,
            **({"strata": 16} if gather == "stratified" else {}),
        },
        "network": {
            "otype": net,
            "n_neurons": 16,
            "n_hidden_layers": 1,
            "activation": "ReLU",
            "output_activation": "None",
        },
    }
    model = tc.create_from_config(2, n_out, cfg)
    if net == "FullyFusedMLP":
        # Width 16 defaults to the XLA chain (measured faster there);
        # force the Pallas kernel so these tests exercise the custom_vjp
        # fast path and its forward-mode fallback.
        model.model.network.use_pallas = True
    return model


def _eikonal_grad(model, params, x):
    """d/dparams of an eikonal penalty on the SDF gradient — the classic
    double-backward workload (reference: scripts/test_grid_bwdbwd.py:75-97)."""

    def sdf_sum(p, xx):
        return model.model.apply(p, xx)[:, 0].astype(jnp.float32).sum()

    def eik(p):
        gx = jax.grad(sdf_sum, argnums=1)(p, x)
        norm = jnp.sqrt(jnp.sum(gx.astype(jnp.float32) ** 2, -1) + 1e-9)
        return jnp.mean((norm - 1.0) ** 2)

    return jax.jit(jax.grad(eik))(params)


@pytest.mark.parametrize("net", ["CutlassMLP", "FullyFusedMLP"])
@pytest.mark.parametrize("scatter", ["xla", "factored"])
@pytest.mark.parametrize("gather", ["per_level", "quad", "stratified"])
def test_eikonal_all_paths(gather, scatter, net):
    model = _model(gather, scatter, net)
    params = model.trainer.params
    x = stratified_uniform(jax.random.PRNGKey(0), 256, 2)
    g = np.asarray(_eikonal_grad(model, params, x))
    assert g.shape == params.shape
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0


def test_eikonal_ffmlp_matches_cutlass():
    """FullyFusedMLP shares MLP's parameter layout; its second-order
    fallback must produce the same eikonal gradients as CutlassMLP."""
    x = stratified_uniform(jax.random.PRNGKey(1), 256, 2)
    ga = gb = None
    for net in ("CutlassMLP", "FullyFusedMLP"):
        model = _model("quad", "factored", net)
        g = np.asarray(_eikonal_grad(model, model.trainer.params, x))
        ga, gb = gb, g
    np.testing.assert_allclose(ga, gb, rtol=1e-4, atol=1e-5)


def test_ffmlp_first_order_keeps_pallas_kernel():
    """The forward-mode fallback must NOT activate under plain grad: the
    fused kernel's custom_vjp stays in the first-order jaxpr."""
    model = _model("quad", "xla", "FullyFusedMLP")
    params = model.trainer.params
    x = stratified_uniform(jax.random.PRNGKey(0), 256, 2)

    def loss(p):
        return (model.model.apply(p, x).astype(jnp.float32) ** 2).sum()

    jaxpr = str(jax.make_jaxpr(jax.grad(loss))(params))
    # custom_vjp is partial-eval'd away under grad; what remains of the
    # fast path are the forward and fused-backward Pallas kernels. The
    # chain fallback would contain zero pallas_calls.
    assert jaxpr.count("pallas_call") >= 2


def test_ffmlp_jvp():
    """Direct forward-mode through the fused MLP (auto-routes to chain)."""
    model = _model("per_level", "xla", "FullyFusedMLP")
    params = model.trainer.params
    x = stratified_uniform(jax.random.PRNGKey(0), 256, 2)

    def f(p):
        return (model.model.apply(p, x).astype(jnp.float32) ** 2).sum()

    out, tangent = jax.jvp(f, (params,), (jnp.ones_like(params),))
    # Forward-over-anything and grad agree: <grad f, ones> == jvp(ones).
    g = jax.grad(f)(params)
    # jvp runs the XLA-chain fallback, grad the Pallas kernel — bf16
    # compute differs slightly between the two.
    np.testing.assert_allclose(
        float(tangent), float(jnp.vdot(g, jnp.ones_like(params))),
        rtol=2e-2,
    )


def test_gather_rows_second_order():
    """linear_call construction: transpose-of-transpose is gather again;
    grad∘grad of a factored-scatter gather matches the plain-XLA path."""
    from tcnn_tpu.ops.scatter_rows import gather_rows

    r = np.random.default_rng(0)
    table = jnp.asarray(r.normal(size=(64, 8)).astype(np.float32))
    idx = jnp.asarray(r.integers(0, 64, 512), jnp.int32)

    def second(mode):
        def inner(t):
            return (gather_rows(t, idx, mode) ** 3).sum()

        def outer(t):
            return (jax.grad(inner)(t) ** 2).sum()

        return np.asarray(jax.jit(jax.grad(outer))(table))

    np.testing.assert_allclose(
        second("factored"), second("xla"), rtol=1e-2, atol=1e-2
    )
    # jvp through the factored path
    _, t = jax.jvp(
        lambda t: (gather_rows(t, idx, "factored") ** 2).sum(),
        (table,),
        (jnp.ones_like(table),),
    )
    assert np.isfinite(float(t))


def test_eikonal_fused_pair_and_half_table():
    # New-knob coverage: the fused-pair factored transpose and half-
    # precision forward tables must both remain twice-differentiable.
    model = _model("quad", "factored_fused", "CutlassMLP")
    model.model.encoding.table_dtype = "float16"
    params = model.trainer.params
    x = stratified_uniform(jax.random.PRNGKey(2), 256, 2)
    g = np.asarray(_eikonal_grad(model, params, x))
    assert g.shape == params.shape and np.isfinite(g).all()
    assert np.abs(g).sum() > 0

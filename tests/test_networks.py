"""Network tests: MLP shape sweeps, FFMLP (Pallas) vs MLP (XLA) parity.

Mirrors tests/test_networks.cu: sweeps widths {16..128} x outputs x depths
for both implementations; the XLA MLP is the numerics oracle for the Pallas
kernel (the role CutlassMLP plays for FullyFusedMLP in the reference).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tcnn_tpu as tc
from tcnn_tpu.networks import FullyFusedMLP, MLP
from tcnn_tpu.rng import make_rng

from utils import match_rae


def _mk(cls, **kw):
    kw.setdefault("input_width", 32)
    kw.setdefault("output_width", 3)
    kw.setdefault("n_neurons", 64)
    kw.setdefault("n_hidden_layers", 2)
    net = cls(**kw)
    params = jnp.asarray(net.initialize_params(make_rng(1337)))
    return net, params


@pytest.mark.parametrize("width", [16, 32, 64, 128])
@pytest.mark.parametrize("n_hidden", [1, 2])
def test_ffmlp_matches_mlp(width, n_hidden):
    mlp, params = _mk(MLP, n_neurons=width, n_hidden_layers=n_hidden)
    ff = FullyFusedMLP(
        input_width=32, output_width=3, n_neurons=width, n_hidden_layers=n_hidden
    )
    assert ff.n_params == mlp.n_params
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((256, 32)), jnp.bfloat16
    )
    y_ref = np.asarray(jax.jit(mlp.apply)(params, x).astype(jnp.float32))
    y_ff = np.asarray(jax.jit(ff.apply)(params, x).astype(jnp.float32))
    match_rae(y_ff, y_ref, 5e-2, percentile=99)


def test_ffmlp_gradients_match_mlp():
    mlp, params = _mk(MLP, n_neurons=64, n_hidden_layers=2)
    ff, _ = _mk(FullyFusedMLP, n_neurons=64, n_hidden_layers=2)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((128, 32)) * 0.5, jnp.bfloat16
    )

    def loss(net):
        def f(p):
            return (net.apply(p, x).astype(jnp.float32) ** 2).sum()

        return f

    g_ref = np.asarray(jax.jit(jax.grad(loss(mlp)))(params))
    g_ff = np.asarray(jax.jit(jax.grad(loss(ff)))(params))
    match_rae(g_ff, g_ref, 2e-2, percentile=99, mean_only=False)


@pytest.mark.parametrize(
    "activation", ["ReLU", "LeakyReLU", "SiLU", "Sine", "Sigmoid", "Squareplus",
                   "Softplus", "Tanh", "None", "Exponential"]
)
def test_activations_finite_and_differentiable(activation):
    net, params = _mk(
        MLP,
        n_neurons=32,
        n_hidden_layers=1,
        activation=tc.Activation(activation),
    )
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((64, 32)) * 0.1, jnp.bfloat16
    )
    y = jax.jit(net.apply)(params, x)
    assert np.isfinite(np.asarray(y, np.float32)).all()
    g = jax.grad(lambda p: net.apply(p, x).astype(jnp.float32).sum())(params)
    assert np.isfinite(np.asarray(g)).all()


def test_zero_hidden_layers_is_single_matmul():
    net, params = _mk(MLP, n_hidden_layers=0, input_width=16, output_width=8)
    assert net.n_params == 16 * 16  # padded out 16 x in 16
    # positive inputs avoid near-zero sums whose *relative* error is
    # unbounded in bf16
    x = jnp.asarray(np.random.default_rng(3).uniform(0.1, 1.0, (32, 16)),
                    jnp.float32)
    y = net.apply(params, x)
    w = params.reshape(16, 16)
    expect = np.asarray(x, np.float32) @ np.asarray(w, np.float32).T
    np.testing.assert_allclose(
        np.asarray(y, np.float32), expect,
        atol=0.02 * np.abs(expect).max(), rtol=0.05,
    )


def test_param_layout_row_major_order():
    net, params = _mk(MLP, input_width=16, output_width=3, n_neurons=32,
                      n_hidden_layers=2)
    # [W_in (32x16), W_h (32x32), W_out (16x32)]
    assert net.layer_sizes() == [(32, 16), (32, 32), (16, 32)]
    assert net.n_params == 32 * 16 + 32 * 32 + 16 * 32


def test_factory_selection():
    ff = tc.create_network(32, 3, {"otype": "FullyFusedMLP", "n_neurons": 64})
    assert ff.otype == "FullyFusedMLP"
    cut = tc.create_network(32, 3, {"otype": "CutlassMLP", "n_neurons": 64})
    assert cut.otype == "CutlassMLP"
    # width 96 unsupported by FFMLP -> fallback
    fb = tc.create_network(32, 3, {"otype": "FullyFusedMLP", "n_neurons": 96})
    assert fb.otype == "CutlassMLP"
    auto = tc.create_network(32, 3, {"otype": "MLP", "n_neurons": 128})
    assert auto.otype == "FullyFusedMLP"
    with pytest.raises(ValueError):
        tc.create_network(32, 3, {"otype": "NotANetwork"})


def test_siren_initialization_scale():
    net = MLP(input_width=32, output_width=3, n_neurons=64, n_hidden_layers=2,
              activation=tc.Activation.Sine)
    params = net.initialize_params(make_rng(5))
    w_in = params[: 64 * 32]
    # first layer: U(-30/fan_in, 30/fan_in)
    assert np.abs(w_in).max() <= 30.0 / 32 + 1e-6
    assert np.abs(w_in).max() > 0.5 * 30.0 / 32


def test_lane_packed_ffmlp_matches_unpacked():
    """The shelved lane-packing path (pack=True) must stay numerically
    identical to the default: block-diagonal packing is a pure batch
    re-layout."""
    import numpy as np

    from tcnn_tpu.common import Activation
    from tcnn_tpu.ops.ffmlp import mlp_backward_pallas, mlp_forward_pallas

    r = np.random.default_rng(0)
    ws = [
        jnp.asarray(r.normal(0, 0.3, (32, 32)), jnp.float32).astype(
            jnp.bfloat16
        )
        for _ in range(3)
    ]
    x = jnp.asarray(r.normal(0, 1, (260, 32)), jnp.float32).astype(
        jnp.bfloat16
    )
    g = jnp.asarray(r.normal(0, 1, (260, 32)), jnp.float32).astype(
        jnp.bfloat16
    )
    a = mlp_forward_pallas(x, ws, Activation.ReLU, Activation.NONE, pack=False)
    b = mlp_forward_pallas(x, ws, Activation.ReLU, Activation.NONE, pack=True)
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=0, atol=0
    )
    dxa, dwsa = mlp_backward_pallas(
        x, g, ws, Activation.ReLU, Activation.NONE, pack=False
    )
    dxb, dwsb = mlp_backward_pallas(
        x, g, ws, Activation.ReLU, Activation.NONE, pack=True
    )
    np.testing.assert_allclose(
        np.asarray(dxa, np.float32), np.asarray(dxb, np.float32),
        rtol=1e-5, atol=1e-5,
    )
    for da, db in zip(dwsa, dwsb):
        np.testing.assert_allclose(
            np.asarray(da), np.asarray(db), rtol=1e-4, atol=1e-4
        )


@pytest.mark.parametrize("width", [16, 32, 64, 128])
@pytest.mark.parametrize("n_layers", [1, 2, 4])
def test_cf_layout_matches_rm(width, n_layers):
    """Channel-first (weights-stationary) kernels compute the same math as
    the row-major kernels: identical matmul graph, only the in-kernel
    activation layout differs (bf16 operands, fp32 accumulation both ways,
    so values match to bf16 rounding of the shared inputs)."""
    import numpy as np

    from tcnn_tpu.common import Activation
    from tcnn_tpu.ops.ffmlp import mlp_backward_pallas, mlp_forward_pallas

    r = np.random.default_rng(width * 10 + n_layers)
    dims = [32] + [width] * max(0, n_layers - 1) + [16]
    ws = [
        jnp.asarray(r.normal(0, 0.4, (dims[i], dims[i + 1])), jnp.float32)
        .astype(jnp.bfloat16)
        for i in range(n_layers)
    ]
    # 1024 rows: divisible by every cfpack group (G*128 for G = 128/w), so
    # the sublane-stacked hidden path is exercised at n_layers >= 3.
    x = jnp.asarray(r.normal(0, 1, (1024, 32)), jnp.float32).astype(
        jnp.bfloat16
    )
    g = jnp.asarray(r.normal(0, 1, (1024, 16)), jnp.float32).astype(
        jnp.bfloat16
    )
    a = mlp_forward_pallas(x, ws, Activation.ReLU, Activation.NONE,
                           layout="rm")
    b = mlp_forward_pallas(x, ws, Activation.ReLU, Activation.NONE,
                           layout="cf")
    # The two layouts accumulate the same products in different orders, so
    # fp32 rounding can flip ReLU signs at z ~ 0 and make rare large
    # outliers: compare with the reference's percentile-RAE methodology
    # (test_common.h:93-96's rationale), not exact equality.
    match_rae(np.asarray(b, np.float32), np.asarray(a, np.float32),
              2e-2, percentile=99)
    dxa, dwsa = mlp_backward_pallas(
        x, g, ws, Activation.ReLU, Activation.NONE, layout="rm"
    )
    dxb, dwsb = mlp_backward_pallas(
        x, g, ws, Activation.ReLU, Activation.NONE, layout="cf"
    )
    match_rae(np.asarray(dxb, np.float32), np.asarray(dxa, np.float32),
              2e-2, percentile=99)
    for da, db in zip(dwsa, dwsb):
        match_rae(np.asarray(db), np.asarray(da), 2e-2, percentile=99.5,
                  mean_only=True)


def test_cf_layout_through_network():
    """FullyFusedMLP(layout="cf") end to end: matches the XLA MLP oracle and
    is trainable (gradients flow through the custom VJP)."""
    mlp, params = _mk(MLP, n_neurons=64, n_hidden_layers=2)
    ff = FullyFusedMLP(
        input_width=32, output_width=3, n_neurons=64, n_hidden_layers=2,
        layout="cf", use_pallas=True,
    )
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((256, 32)), jnp.bfloat16
    )
    y_ref = np.asarray(jax.jit(mlp.apply)(params, x).astype(jnp.float32))
    y_cf = np.asarray(jax.jit(ff.apply)(params, x).astype(jnp.float32))
    match_rae(y_cf, y_ref, 5e-2, percentile=99)

    def loss(net):
        def f(p):
            return (net.apply(p, x).astype(jnp.float32) ** 2).sum()

        return f

    g_ref = np.asarray(jax.jit(jax.grad(loss(mlp)))(params))
    g_cf = np.asarray(jax.jit(jax.grad(loss(ff)))(params))
    match_rae(g_cf, g_ref, 5e-2, percentile=99, mean_only=True)


def test_ffmlp_inference_mode_routing():
    # Serving routes FFMLP through the measured inference-optimal strategy
    # (XLA chain below width 128) while training keeps the fused kernel at
    # width >= 64; an explicit use_pallas= overrides both.
    from tcnn_tpu.networks.fully_fused import (
        FullyFusedMLP,
        _in_inference_mode,
        ffmlp_inference_mode,
    )

    assert not _in_inference_mode()
    with ffmlp_inference_mode():
        assert _in_inference_mode()
        with ffmlp_inference_mode():
            assert _in_inference_mode()
        assert _in_inference_mode()
    assert not _in_inference_mode()

    import jax
    import jax.numpy as jnp
    import numpy as np

    net = FullyFusedMLP(16, 4, n_neurons=64, n_hidden_layers=1)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal(net.n_params).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((32, 16)).astype(np.float32))
    y_train = np.asarray(net.apply(p, x), np.float32)
    with ffmlp_inference_mode():
        y_serve = np.asarray(net.apply(p, x), np.float32)
    # Same function, different execution strategy: bf16-roundoff agreement.
    np.testing.assert_allclose(y_train, y_serve, rtol=2e-2, atol=2e-2)

    forced = FullyFusedMLP(16, 4, n_neurons=64, n_hidden_layers=1,
                           use_pallas=True)
    assert forced._use_pallas_forced and forced.use_pallas
    # Attribute assignment (the forcing pattern the test suite itself
    # uses) must also count as an explicit override.
    assigned = FullyFusedMLP(16, 4, n_neurons=64, n_hidden_layers=1)
    assert not assigned._use_pallas_forced
    assigned.use_pallas = True
    assert assigned._use_pallas_forced and assigned.use_pallas


@pytest.mark.parametrize("act,out_act", [("Sine", "Sigmoid"),
                                         ("Squareplus", "Tanh")])
def test_cf_layout_generic_activations(act, out_act):
    """CF kernels through the non-cheap activation paths: hidden act-vjp
    uses stored pre-activations, and a non-None output activation takes
    the last-layer recompute (z_last) branch."""
    import numpy as np

    from tcnn_tpu.common import string_to_activation
    from tcnn_tpu.ops.ffmlp import mlp_backward_pallas, mlp_forward_pallas

    a = string_to_activation(act)
    oa = string_to_activation(out_act)
    r = np.random.default_rng(11)
    ws = [
        jnp.asarray(r.normal(0, 0.4, (s[0], s[1])), jnp.float32).astype(
            jnp.bfloat16
        )
        for s in [(32, 64), (64, 64), (64, 16)]
    ]
    x = jnp.asarray(r.normal(0, 1, (1024, 32)), jnp.float32).astype(
        jnp.bfloat16
    )
    g = jnp.asarray(r.normal(0, 1, (1024, 16)), jnp.float32).astype(
        jnp.bfloat16
    )
    fa = np.asarray(mlp_forward_pallas(x, ws, a, oa, layout="rm"), np.float32)
    fb = np.asarray(mlp_forward_pallas(x, ws, a, oa, layout="cf"), np.float32)
    match_rae(fb, fa, 2e-2, percentile=99)
    dxa, dwsa = mlp_backward_pallas(x, g, ws, a, oa, layout="rm")
    dxb, dwsb = mlp_backward_pallas(x, g, ws, a, oa, layout="cf")
    match_rae(np.asarray(dxb, np.float32), np.asarray(dxa, np.float32),
              2e-2, percentile=99)
    for da, db in zip(dwsa, dwsb):
        match_rae(np.asarray(db), np.asarray(da), 2e-2, percentile=99.5,
                  mean_only=True)

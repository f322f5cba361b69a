"""Packed-I/O FFMLP inference path (ops/ffmlp.mlp_forward_pallas_packed):
bit-parity with the standard apply at every supported width, and the
pack/unpack layout contract (a compact row-major reshape)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tcnn_tpu.common import Activation
from tcnn_tpu.networks.fully_fused import FullyFusedMLP


@pytest.mark.parametrize("width", [16, 32, 64])
@pytest.mark.parametrize("out_dims", [1, 3, 16])
def test_packed_matches_apply(width, out_dims):
    net = FullyFusedMLP(
        input_width=width, output_width=out_dims, n_neurons=width,
        n_hidden_layers=3, activation=Activation.ReLU,
        output_activation=Activation.NONE,
    )
    r = np.random.default_rng(0)
    params = jnp.asarray(
        r.standard_normal(net.n_params).astype(np.float32) * 0.3
    )
    B = 1024
    G = 128 // width
    x = r.uniform(-1, 1, (B, width)).astype(np.float32)

    ref = np.asarray(net.apply(params, jnp.asarray(x)), np.float32)

    xp = jnp.asarray(x.reshape(B // G, 128))  # compact row-major reshape
    out_p = np.asarray(net.apply_packed(params, xp), np.float32)
    got = out_p.reshape(B, net.padded_output_width)

    # Same math modulo matmul association (block-diag vs plain): bf16
    # operands, fp32 accumulation both ways.
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-3)


@pytest.mark.parametrize("width", [16, 32, 64])
def test_packed_gradients_match_apply(width):
    """The packed path is differentiable: param and input gradients
    match the standard apply's (same math, block-diagonal composition
    — bf16 operands, f32 accumulation both ways)."""
    import jax

    net = FullyFusedMLP(
        input_width=width, output_width=3, n_neurons=width,
        n_hidden_layers=2, activation=Activation.ReLU,
        output_activation=Activation.NONE,
    )
    r = np.random.default_rng(5)
    params = jnp.asarray(
        r.standard_normal(net.n_params).astype(np.float32) * 0.3
    )
    B = 512
    G = 128 // width
    x = r.uniform(-1, 1, (B, width)).astype(np.float32)
    xp = jnp.asarray(x.reshape(B // G, 128))

    def loss_ref(p, xx):
        return net.apply(p, xx).astype(jnp.float32).sum()

    def loss_packed(p, xx):
        return net.apply_packed(p, xx).astype(jnp.float32).sum()

    gp_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(
        params, jnp.asarray(x)
    )
    gp_pk, gx_pk = jax.grad(loss_packed, argnums=(0, 1))(params, xp)
    scale = np.abs(np.asarray(gp_ref)).max()
    np.testing.assert_allclose(
        np.asarray(gp_pk), np.asarray(gp_ref), rtol=3e-2,
        atol=3e-2 * scale,
    )
    np.testing.assert_allclose(
        np.asarray(gx_pk).reshape(B, width), np.asarray(gx_ref),
        rtol=3e-2, atol=2e-2,
    )


def test_packed_training_descends():
    """End-to-end: SGD on the packed path fits a tiny target."""
    import jax

    net = FullyFusedMLP(
        input_width=16, output_width=16, n_neurons=16, n_hidden_layers=2
    )
    r = np.random.default_rng(9)
    params = jnp.asarray(
        r.standard_normal(net.n_params).astype(np.float32) * 0.3
    )
    B = 1024
    x = jnp.asarray(
        r.uniform(-1, 1, (B // 8, 128)).astype(np.float32)
    )
    # Learnable target: a frozen teacher of the same architecture.
    teacher = jnp.asarray(
        r.standard_normal(net.n_params).astype(np.float32) * 0.3
    )
    target = net.apply_packed(teacher, x).astype(jnp.float32)

    @jax.jit
    def step(p):
        def loss(pp):
            out = net.apply_packed(pp, x).astype(jnp.float32)
            return jnp.mean((out - target) ** 2)

        l, g = jax.value_and_grad(loss)(p)
        return p - 0.05 * g, l

    losses = []
    for _ in range(60):
        params, l = step(params)
        losses.append(float(l))
    assert losses[-1] < 0.5 * losses[0], f"{losses[0]} -> {losses[-1]}"


def test_packed_zero_hidden_layers():
    """n_hidden_layers=0 (single matmul): the packed kernel must apply
    the one weight matrix exactly once."""
    net = FullyFusedMLP(
        input_width=16, output_width=16, n_neurons=16, n_hidden_layers=0
    )
    r = np.random.default_rng(3)
    params = jnp.asarray(
        r.standard_normal(net.n_params).astype(np.float32) * 0.3
    )
    B = 512
    x = r.uniform(-1, 1, (B, 16)).astype(np.float32)
    ref = np.asarray(net.apply(params, jnp.asarray(x)), np.float32)
    out = np.asarray(
        net.apply_packed(params, jnp.asarray(x.reshape(B // 8, 128))),
        np.float32,
    ).reshape(B, net.padded_output_width)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-3)


def test_packed_rejects_unsupported():
    net = FullyFusedMLP(
        input_width=128, output_width=3, n_neurons=128, n_hidden_layers=2
    )
    r = np.random.default_rng(1)
    params = jnp.asarray(
        r.standard_normal(net.n_params).astype(np.float32) * 0.1
    )
    with pytest.raises(ValueError, match="narrow uniform"):
        net.apply_packed(params, jnp.zeros((8, 128), jnp.float32))
    net2 = FullyFusedMLP(
        input_width=32, output_width=3, n_neurons=64, n_hidden_layers=2
    )
    params2 = jnp.asarray(
        r.standard_normal(net2.n_params).astype(np.float32) * 0.1
    )
    with pytest.raises(ValueError, match="narrow uniform"):
        net2.apply_packed(params2, jnp.zeros((8, 128), jnp.float32))


def test_packed_ragged_batch_padding():
    net = FullyFusedMLP(
        input_width=16, output_width=2, n_neurons=16, n_hidden_layers=2
    )
    r = np.random.default_rng(2)
    params = jnp.asarray(
        r.standard_normal(net.n_params).astype(np.float32) * 0.3
    )
    B = 8 * 37  # rows = 37, not a multiple of the tile
    x = r.uniform(-1, 1, (B, 16)).astype(np.float32)
    ref = np.asarray(net.apply(params, jnp.asarray(x)), np.float32)
    out_p = np.asarray(
        net.apply_packed(params, jnp.asarray(x.reshape(B // 8, 128))),
        np.float32,
    )
    np.testing.assert_allclose(
        out_p.reshape(B, net.padded_output_width), ref, rtol=2e-2,
        atol=2e-3,
    )

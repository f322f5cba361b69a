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

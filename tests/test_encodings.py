"""Encoding tests: shapes, padding semantics, gradients, invariants.

Mirrors tests/test_encodings.cu (every registered encoding through a shared
harness) plus check_grads, which subsumes the reference's finite-difference
gradcheck scripts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tcnn_tpu as tc
from tcnn_tpu.encodings import builtin_encodings
from tcnn_tpu.rng import make_rng

from utils import check_grads_fd, match_rae

ALIGNMENT = 16


def _input_dims_for(name):
    lname = name.lower()
    if lname == "sphericalharmonics":
        return 3
    if "grid" in lname:
        return 2  # dense grids at 8 dims would be astronomically large
    return 8


def _make(name, n_dims=None):
    n_dims = n_dims or _input_dims_for(name)
    enc = tc.create_encoding(n_dims, {"otype": name}, alignment=ALIGNMENT)
    enc.output_dtype = jnp.float32  # full precision for gradient checks
    return enc


@pytest.mark.parametrize("name", sorted(builtin_encodings()))
def test_shapes_and_padding(name):
    if name.lower() == "composite":
        pytest.skip("composite needs a nested config; covered separately")
    enc = _make(name)
    assert enc.padded_output_width % ALIGNMENT == 0
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (32, enc.input_width)),
                    jnp.float32)
    params = None
    if enc.n_params:
        params = jnp.asarray(enc.initialize_params(make_rng(1)))
    y = jax.jit(enc.apply)(params, x) if params is not None else jax.jit(
        lambda x: enc.apply(None, x)
    )(x)
    assert y.shape == (32, enc.padded_output_width)
    assert not np.isnan(np.asarray(y, np.float32)).any()


@pytest.mark.parametrize("name", ["Identity", "Frequency", "OneBlob", "Grid"])
def test_input_gradients(name):
    # Keep top frequencies / finest grid cells coarse enough for finite
    # differences to resolve (fine hash levels are piecewise-linear at
    # ~1e-6 scale, far below any usable FD step).
    cfg = {"otype": name}
    if name == "Frequency":
        cfg["n_frequencies"] = 4
    if name == "Grid":
        cfg.update(n_levels=2, base_resolution=4, per_level_scale=1.5)
    n_dims = 2 if name == "Grid" else 4
    enc = tc.create_encoding(n_dims, cfg, alignment=ALIGNMENT)
    enc.output_dtype = jnp.float32
    r = np.random.default_rng(3)
    x = jnp.asarray(r.uniform(0.1, 0.9, (8, enc.input_width)), jnp.float32)
    params = (
        jnp.asarray(enc.initialize_params(make_rng(1)))
        if enc.n_params
        else jnp.zeros((0,), jnp.float32)
    )

    def f(p, xx):
        return enc.apply(p, xx).sum()

    check_grads_fd(f, (params, x))


def test_triangle_wave_gradient_analytic():
    """Piecewise-linear, so FD at kinks is meaningless; check the exact slope
    instead. With n_frequencies=1 the wave is tri(x/2): slope -2 on (0,1)."""
    enc = tc.create_encoding(
        1, {"otype": "TriangleWave", "n_frequencies": 1}, alignment=1
    )
    enc.output_dtype = jnp.float32
    g = jax.grad(lambda xx: enc.apply(None, xx).sum())(
        jnp.asarray([[0.3]], jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(g), -2.0, rtol=1e-5)


def test_identity_scale_offset_and_padding():
    enc = tc.create_encoding(3, {"otype": "Identity", "scale": 2.0, "offset": 0.5},
                             alignment=8)
    enc.output_dtype = jnp.float32
    x = jnp.asarray([[0.1, 0.2, 0.3]], jnp.float32)
    y = np.asarray(enc.apply(None, x))
    np.testing.assert_allclose(y[0, :3], [0.7, 0.9, 1.1], rtol=1e-6)
    # fixed encodings pad with 1 (identity.h:62-63)
    np.testing.assert_array_equal(y[0, 3:], 1.0)


def test_oneblob_partition_of_unity():
    enc = _make("OneBlob", n_dims=2)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (16, 2)), jnp.float32)
    y = np.asarray(enc.apply(None, x), np.float32)
    n_bins = 16
    sums = y[:, :n_bins].sum(1)
    np.testing.assert_allclose(sums, 1.0, atol=1e-4)


def test_frequency_values():
    enc = tc.create_encoding(1, {"otype": "Frequency", "n_frequencies": 2},
                             alignment=4)
    enc.output_dtype = jnp.float32
    x = jnp.asarray([[0.25]], jnp.float32)
    y = np.asarray(enc.apply(None, x))[0]
    pi = np.pi
    expect = [np.sin(0.25 * pi), np.cos(0.25 * pi), np.sin(0.5 * pi), np.cos(0.5 * pi)]
    np.testing.assert_allclose(y[:4], expect, atol=1e-6)


def test_sh_against_closed_form():
    enc = tc.create_encoding(3, {"otype": "SphericalHarmonics", "degree": 3},
                             alignment=1)
    enc.output_dtype = jnp.float32
    r = np.random.default_rng(5)
    raw = r.uniform(0, 1, (64, 3)).astype(np.float32)
    y = np.asarray(enc.apply(None, jnp.asarray(raw)))
    x, yy, z = (raw * 2 - 1).T
    # Closed forms with the reference's sign convention
    # (common_device.h:484-494).
    expect = np.stack(
        [
            np.full_like(x, 0.28209479177387814),
            -0.48860251190291987 * yy,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
            1.0925484305920792 * x * yy,
            -1.0925484305920792 * yy * z,
            0.94617469575755997 * z * z - 0.31539156525251999,
            -1.0925484305920792 * x * z,
            0.54627421529603959 * (x * x - yy * yy),
        ],
        axis=1,
    )
    match_rae(y, expect, 1e-5, percentile=100)


def test_sh_padding_is_prepended():
    enc = tc.create_encoding(3, {"otype": "SphericalHarmonics", "degree": 2},
                             alignment=16)
    enc.output_dtype = jnp.float32
    y = np.asarray(enc.apply(None, jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32)))
    assert enc.padded_output_width == 16
    # 12 padding lanes first (spherical_harmonics.h:53-63), then 4 SH values.
    np.testing.assert_array_equal(y[0, :12], 1.0)
    assert abs(y[0, 12] - 0.28209479) < 1e-5


def test_empty_encoding():
    enc = tc.create_encoding(4, {"otype": "Empty"}, alignment=8)
    # aligning a 0-wide output stays 0; padding is explicit (empty.h:119-126)
    assert enc.padded_output_width == 0
    enc.set_padded_output_width(8)
    enc.output_dtype = jnp.float32
    x = jnp.asarray(np.random.rand(5, 4), jnp.float32)
    y = np.asarray(enc.apply(None, x))
    assert y.shape == (5, 8)
    np.testing.assert_array_equal(y, 1.0)
    # zero input gradient (empty.h:46-58)
    g = jax.grad(lambda xx: enc.apply(None, xx).sum())(x)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_composite_concatenation():
    cfg = {
        "otype": "Composite",
        "nested": [
            {"n_dims_to_encode": 2, "otype": "Frequency", "n_frequencies": 3},
            {"otype": "Identity"},
        ],
    }
    enc = tc.create_encoding(5, cfg, alignment=16)
    enc.output_dtype = jnp.float32
    x = jnp.asarray(np.random.rand(4, 5), jnp.float32)
    y = enc.apply(None, x)
    assert y.shape == (4, enc.padded_output_width)
    assert enc.padded_output_width % 16 == 0
    # last 3 dims pass through as identity
    freq_width = enc.nested[0].padded_output_width
    np.testing.assert_allclose(
        np.asarray(y)[:, freq_width : freq_width + 3], np.asarray(x)[:, 2:], rtol=1e-6
    )


def test_composite_sum_product():
    for reduction in ("Sum", "Product"):
        cfg = {
            "otype": "Composite",
            "reduction": reduction,
            "nested": [
                {"n_dims_to_encode": 2, "otype": "Identity"},
                {"n_dims_to_encode": 2, "otype": "Identity"},
            ],
        }
        enc = tc.create_encoding(4, cfg, alignment=2)
        enc.output_dtype = jnp.float32
        x = jnp.asarray([[1.0, 2.0, 3.0, 4.0]], jnp.float32)
        y = np.asarray(enc.apply(None, x))[0]
        if reduction == "Sum":
            np.testing.assert_allclose(y[:2], [4.0, 6.0], rtol=1e-6)
        else:
            np.testing.assert_allclose(y[:2], [3.0, 8.0], rtol=1e-6)


def test_nrc_preset():
    enc = tc.create_encoding(9, {"otype": "NRC"}, alignment=16)
    assert enc.n_nested() == 3
    x = jnp.asarray(np.random.rand(4, 9), jnp.float32)
    y = enc.apply(None, x)
    assert y.shape[1] == enc.padded_output_width


def test_default_encoding_is_oneblob():
    enc = tc.create_encoding(4, {}, alignment=8)
    assert enc.otype == "OneBlob"


def test_registry_extensible():
    from tcnn_tpu.encodings.basic import IdentityEncoding

    tc.register_encoding("MyCustomEnc", lambda n, cfg: IdentityEncoding(n))
    enc = tc.create_encoding(4, {"otype": "mycustomenc"}, alignment=4)
    assert isinstance(enc, IdentityEncoding)
    with pytest.raises(RuntimeError):
        tc.register_encoding("mycustomENC", lambda n, cfg: IdentityEncoding(n))

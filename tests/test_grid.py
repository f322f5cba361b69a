"""Hash-grid construction invariants and numerics.

Ports tests/test_grid.cu (per-level params/offsets, dense-vs-hash
switchover, total n_params, forward smoke) and adds gradient checks
including second order (double backward — reference grid.h:910-1042 /
scripts/test_grid_bwdbwd.py — comes from jax.grad∘jax.grad here).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tcnn_tpu as tc
from tcnn_tpu.encodings.grid import GridEncoding, create_grid_encoding
from tcnn_tpu.rng import make_rng

from utils import check_grads_fd


def _hashgrid(**kw):
    cfg = dict(
        otype="HashGrid",
        n_levels=16,
        n_features_per_level=2,
        log2_hashmap_size=15,
        base_resolution=16,
        per_level_scale=1.5,
    )
    cfg.update(kw)
    return tc.create_encoding(kw.pop("n_dims", 2) if "n_dims" in kw else 2, cfg, 16)


def test_offset_table_invariants():
    enc = _hashgrid()
    d = 2
    hashmap = 1 << 15
    for lvl in range(enc.n_levels):
        size = int(enc.offset_table[lvl + 1] - enc.offset_table[lvl])
        res = int(enc.resolutions[lvl])
        dense = ((res**d + 7) // 8) * 8
        assert size == min(dense, hashmap)
        assert size % 8 == 0
        # dense<->hash switchover
        assert enc._use_hash[lvl] == (size < res**d)
    assert enc.n_params == int(enc.offset_table[-1]) * 2


def test_resolution_progression():
    enc = _hashgrid()
    # scale(l) = 2^(l*log2(1.5)) * 16 - 1; resolution = ceil(scale)+1
    for lvl in range(enc.n_levels):
        expect = int(np.ceil(2.0 ** (lvl * np.log2(1.5)) * 16 - 1)) + 1
        assert int(enc.resolutions[lvl]) == expect


def test_tiled_and_dense_types():
    dense = tc.create_encoding(
        2, {"otype": "DenseGrid", "n_levels": 4, "base_resolution": 8}, 16
    )
    assert dense.grid_type.value == "Dense"
    assert not any(dense._use_hash)
    tiled = tc.create_encoding(
        2, {"otype": "TiledGrid", "n_levels": 4, "base_resolution": 8}, 16
    )
    # Tiled caps at base_res^d
    for lvl in range(4):
        size = int(tiled.offset_table[lvl + 1] - tiled.offset_table[lvl])
        assert size <= 8 * 8


def test_dense_default_per_level_scale():
    enc = tc.create_encoding(
        2, {"otype": "DenseGrid", "n_levels": 5, "base_resolution": 16}, 16
    )
    expect = np.exp(np.log(256.0 / 16.0) / 4)
    assert abs(enc.per_level_scale - expect) < 1e-6


def test_forward_smoke_and_padding():
    enc = _hashgrid()
    enc.output_dtype = jnp.float32
    params = jnp.asarray(enc.initialize_params(make_rng(7)))
    assert params.shape == (enc.n_params,)
    assert float(jnp.abs(params).max()) <= 1e-4
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (128, 2)), jnp.float32)
    y = jax.jit(enc.apply)(params, x)
    assert y.shape == (128, enc.padded_output_width)
    # grid pads with zeros (grid.h:757-767)
    np.testing.assert_array_equal(np.asarray(y)[:, enc.n_output_dims :], 0.0)


def test_interpolation_continuity():
    """Output is continuous across cell boundaries for Linear interp."""
    enc = tc.create_encoding(
        1,
        {"otype": "HashGrid", "n_levels": 2, "base_resolution": 8,
         "n_features_per_level": 2, "per_level_scale": 2.0},
        2,
    )
    enc.output_dtype = jnp.float32
    params = jnp.asarray(
        np.random.default_rng(1).standard_normal(enc.n_params).astype(np.float32)
    )
    eps = 1e-5
    xs = jnp.asarray([[0.5 - eps], [0.5 + eps]], jnp.float32)
    y = np.asarray(enc.apply(params, xs))
    assert np.abs(y[0] - y[1]).max() < 1e-3


def test_param_gradients_deterministic():
    enc = _hashgrid()
    enc.output_dtype = jnp.float32
    params = jnp.asarray(enc.initialize_params(make_rng(7)))
    x = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (256, 2)), jnp.float32)

    @jax.jit
    def g(p):
        return jax.grad(lambda pp: (enc.apply(pp, x) ** 2).sum())(p)

    g1, g2 = np.asarray(g(params)), np.asarray(g(params))
    np.testing.assert_array_equal(g1, g2)  # deterministic, unlike CUDA atomics


def test_first_and_second_order_gradients():
    enc = tc.create_encoding(
        2,
        {"otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
         "log2_hashmap_size": 12, "base_resolution": 4, "per_level_scale": 1.5,
         "interpolation": "Smoothstep"},
        4,
    )
    enc.output_dtype = jnp.float32
    params = jnp.asarray(
        np.random.default_rng(3).standard_normal(enc.n_params).astype(np.float32)
        * 0.1
    )
    x = jnp.asarray(np.random.default_rng(4).uniform(0.3, 0.7, (8, 2)), jnp.float32)

    def f(p, xx):
        return (enc.apply(p, xx) ** 2).sum()

    # First order wrt params and inputs.
    check_grads_fd(f, (params, x))

    # Double backward: d/dparams of ||d f/d x||^2 (the eikonal-loss pattern,
    # scripts/test_grid_bwdbwd.py:75-97).
    def eikonal(p):
        gx = jax.grad(f, argnums=1)(p, x)
        return (gx**2).sum()

    g = jax.grad(eikonal)(params)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_max_level_masking():
    enc = _hashgrid()
    enc.output_dtype = jnp.float32
    params = jnp.asarray(
        np.random.default_rng(5).standard_normal(enc.n_params).astype(np.float32)
    )
    x = jnp.asarray(np.random.default_rng(6).uniform(0, 1, (16, 2)), jnp.float32)
    y = np.asarray(enc.apply(params, x, max_level=0.5))
    F = enc.n_features_per_level
    active_levels = int(np.floor(0.5 * enc.n_levels + 1e-3)) + 1
    # levels >= ~half must be zeroed
    assert np.abs(y[:, (active_levels) * F : enc.n_output_dims]).max() == 0
    assert np.abs(y[:, : active_levels * F]).max() > 0


def test_hash_types():
    for hash_type in ("Prime", "CoherentPrime", "ReversedPrime", "BaseConvert",
                      "Rng", "CoherentAdditive"):
        enc = tc.create_encoding(
            3,
            {"otype": "HashGrid", "n_levels": 4, "log2_hashmap_size": 10,
             "base_resolution": 8, "hash": hash_type},
            4,
        )
        params = jnp.asarray(enc.initialize_params(make_rng(11)))
        x = jnp.asarray(np.random.default_rng(12).uniform(0, 1, (32, 3)),
                        jnp.float32)
        y = enc.apply(params, x)
        assert np.isfinite(np.asarray(y, np.float32)).all()


def test_n_features_consistency_checks():
    with pytest.raises(ValueError):
        GridEncoding(2, n_features=3, n_features_per_level=2)
    with pytest.raises(ValueError):
        create_grid_encoding(
            2, {"otype": "HashGrid", "n_features": 8, "n_levels": 4}
        )


def test_rng_hash_matches_scalar_pcg32():
    """HashType::Rng = pcg32(1337) jumped by the packed coords
    (common_device.h:814-827); verify against the scalar host PCG32."""
    from tcnn_tpu.encodings.grid import _grid_hash
    from tcnn_tpu.common import HashType
    from tcnn_tpu.rng import PCG32

    r = np.random.default_rng(0)
    coords = r.integers(0, 1 << 16, (32, 2), dtype=np.uint32)
    got = np.asarray(_grid_hash(jnp.asarray(coords), HashType.Rng))
    for i, (cx, cy) in enumerate(coords):
        step = int(cx) ^ (int(cy) << 32)
        p = PCG32(1337)
        p.advance(step)
        assert int(got[i]) == int(p.next_uint())


def test_fixed_point_pos_matches_float_path():
    """uint32 fixed-point inputs (grid.h:1143-1151) approximate the float
    path: u = round(x * 2^32) must land in the same cell with the same
    fractional coordinate up to fixed-point quantization."""
    cfg = {"otype": "HashGrid", "n_levels": 3, "n_features_per_level": 2,
           "log2_hashmap_size": 12, "base_resolution": 4,
           "per_level_scale": 2.0}
    enc_f = tc.create_encoding(2, cfg, 4)
    enc_u = tc.create_encoding(2, {**cfg, "fixed_point_pos": True}, 4)
    enc_f.output_dtype = jnp.float32
    enc_u.output_dtype = jnp.float32
    assert enc_u.fixed_point_pos
    params = jnp.asarray(
        np.random.default_rng(0).standard_normal(enc_f.n_params).astype(np.float32)
    )
    xf = np.random.default_rng(1).uniform(0.05, 0.95, (64, 2)).astype(np.float32)
    xu = (xf.astype(np.float64) * 4294967296.0).astype(np.uint64).astype(np.uint32)
    yf = np.asarray(enc_f.apply(params, jnp.asarray(xf)))
    yu = np.asarray(enc_u.apply(params, jnp.asarray(xu)))
    # Not bit-identical (the fixed-point cell size rounds differently from
    # the float fma), but must agree closely away from cell boundaries.
    close = np.abs(yf - yu) < 0.05 * (np.abs(yf) + 0.1)
    assert close.mean() > 0.95, close.mean()

    with pytest.raises(TypeError):
        enc_u.apply(params, jnp.asarray(xf))


@pytest.mark.parametrize("d", [2, 3])
@pytest.mark.parametrize("build", ["flat", "slice", "cf"])
def test_quad_build_flat_matches_view(d, build):
    # The flat/slice/cf quad-table builds (per-level 1D rolls / per-level
    # 1D slice + one reshape / channel-first feature-plane rolls — no
    # global (N, F) narrow view; _quad_table docstring) are exact
    # relayouts of the view build: forward AND parameter gradients
    # bit-identical on both the quad and stratified paths (slice: same 2D
    # rolls as view, so even the gradient association order matches).
    cfg = {"otype": "HashGrid", "n_levels": 6, "n_features_per_level": 2,
           "log2_hashmap_size": 10, "base_resolution": 4,
           "per_level_scale": 1.7, "hash": "CoherentAdditive",
           "gather_strategy": "quad"}
    enc_v = tc.create_encoding(d, {**cfg, "quad_build": "view"}, 4)
    enc_f = tc.create_encoding(d, {**cfg, "quad_build": build}, 4)
    enc_v.output_dtype = jnp.float32
    enc_f.output_dtype = jnp.float32
    rng = np.random.default_rng(0)
    params = jnp.asarray(
        rng.normal(0, 0.1, (enc_v.n_params,)).astype(np.float32)
    )
    x = jnp.asarray(rng.uniform(0, 1, (128, d)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(enc_v.apply(params, x)), np.asarray(enc_f.apply(params, x))
    )

    def g(enc):
        return np.asarray(jax.grad(
            lambda p: jnp.sum(jnp.sin(enc.apply(p, x) * 3.0))
        )(params))

    # Same contributions, but the 1D/2D roll adjoints associate the
    # corner sums differently -> f32 summation order, ~1 ulp.
    gv, gf = g(enc_v), g(enc_f)
    scale = np.abs(gv).max() + 1e-30
    assert np.abs(gv - gf).max() / scale < 1e-6


@pytest.mark.parametrize("d", [2, 3])
def test_quad_build_cf_locked_bit_identical(d):
    # On the phase-locked path the quad build feeds linear_call's p_fn
    # only (the CSR transpose is independent of the build), so the
    # channel-first build must be BIT-identical to the slice build —
    # values and parameter gradients — including under level_split.
    from tcnn_tpu.utils.sampling import stratified_uniform

    cfg = {
        "otype": "HashGrid", "n_levels": 8, "n_features_per_level": 2,
        "log2_hashmap_size": 10, "base_resolution": 4,
        "per_level_scale": 1.5, "hash": "CoherentAdditive",
        "gather_strategy": "stratified", "strata": 4,
        "phase_locked": True, "locked_phases": 1,
    }
    x = stratified_uniform(jax.random.PRNGKey(0), 64, d, phase_locked=True)
    outs = {}
    for build in ("slice", "cf"):
        enc = tc.create_encoding(d, {**cfg, "quad_build": build}, 4)
        enc.output_dtype = jnp.float32
        rng = np.random.default_rng(0)
        params = jnp.asarray(
            rng.normal(0, 0.1, (enc.n_params,)).astype(np.float32)
        )
        v, grad = jax.value_and_grad(
            lambda p, e=enc: jnp.sum(jnp.sin(e.apply(p, x) * 3.0))
        )(params)
        outs[build] = (np.asarray(v), np.asarray(grad))
    np.testing.assert_array_equal(outs["slice"][0], outs["cf"][0])
    np.testing.assert_array_equal(outs["slice"][1], outs["cf"][1])

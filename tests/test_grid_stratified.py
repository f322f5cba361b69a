"""Stratified gather strategy: the static tile->cell fast path must match
the quad path (same raster-hash function) exactly on batches that satisfy
the stratified raster contract, and fall back gracefully otherwise."""

import jax
import jax.numpy as jnp
import numpy as np

import tcnn_tpu as tc
from tcnn_tpu.utils.sampling import is_stratified, stratified_uniform


def _pair(n_levels=6, strata=16, max_variants=3):
    base = dict(
        otype="HashGrid",
        n_levels=n_levels,
        n_features_per_level=2,
        log2_hashmap_size=8,
        base_resolution=4,
        per_level_scale=1.5,
        hash="CoherentAdditive",
    )
    a = tc.create_encoding(
        2,
        {**base, "gather_strategy": "stratified", "strata": strata,
         "stratified_max_variants": max_variants},
        16,
    )
    # Reference: quad path forced onto the SAME raster-hash function.
    b = tc.create_encoding(2, {**base, "gather_strategy": "quad"}, 16)
    b.raster_max_scale = a.raster_max_scale
    b.stratified_max_variants = max_variants
    a.output_dtype = jnp.float32
    b.output_dtype = jnp.float32
    params = jnp.asarray(
        np.random.default_rng(0).standard_normal(a.n_params).astype(np.float32)
    )
    return a, b, params


def test_sampler_contract():
    x = stratified_uniform(jax.random.PRNGKey(0), 256, 2)
    assert x.shape == (256, 2)
    assert is_stratified(x)
    assert not is_stratified(
        jax.random.uniform(jax.random.PRNGKey(1), (256, 2))
    )


def test_stratified_matches_quad_forward():
    a, b, params = _pair()
    # Some levels actually take the static path (scale <= strata-1 -> V=2,
    # plus V=3 levels up to raster_max_scale).
    x = stratified_uniform(jax.random.PRNGKey(0), 256, 2)
    ya = np.asarray(jax.jit(a.apply)(params, x))
    yb = np.asarray(jax.jit(b.apply)(params, x))
    np.testing.assert_allclose(ya, yb, rtol=1e-5, atol=1e-6)


def test_stratified_matches_quad_gradients():
    a, b, params = _pair()
    x = stratified_uniform(jax.random.PRNGKey(2), 256, 2)

    def loss(enc):
        return lambda p, xx: (enc.apply(p, xx) ** 2).sum()

    ga_p, ga_x = jax.grad(loss(a), argnums=(0, 1))(params, x)
    gb_p, gb_x = jax.grad(loss(b), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(
        np.asarray(ga_p), np.asarray(gb_p), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ga_x), np.asarray(gb_x), rtol=1e-4, atol=1e-4
    )


def test_non_square_batch_falls_back():
    a, b, params = _pair()
    x = jnp.asarray(
        np.random.default_rng(3).uniform(0, 1, (200, 2)), jnp.float32
    )
    ya = np.asarray(a.apply(params, x))
    yb = np.asarray(b.apply(params, x))
    np.testing.assert_allclose(ya, yb, rtol=1e-6, atol=1e-7)


def test_stratified_in_full_model_trains():
    cfg = {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
        "encoding": {
            "otype": "HashGrid",
            "n_levels": 4,
            "n_features_per_level": 2,
            "log2_hashmap_size": 8,
            "base_resolution": 4,
            "per_level_scale": 1.5,
            "hash": "CoherentAdditive",
            "gather_strategy": "stratified",
            "strata": 16,
        },
        "network": {
            "otype": "CutlassMLP",
            "n_neurons": 16,
            "n_hidden_layers": 1,
        },
    }
    model = tc.create_from_config(2, 3, cfg)
    x = stratified_uniform(jax.random.PRNGKey(0), 256, 2)
    y = jax.random.uniform(jax.random.PRNGKey(1), (256, 3))
    l0 = float(model.trainer.training_step(x, y))
    for i in range(20):
        loss = float(model.trainer.training_step(x, y))
    assert np.isfinite(loss) and loss < l0


def test_factored_scatter_matches_xla():
    from tcnn_tpu.ops.scatter_rows import scatter_rows_factored

    r = np.random.default_rng(7)
    idx = jnp.asarray(r.integers(0, 1000, 4096), jnp.int32)
    rows = jnp.asarray(r.normal(size=(4096, 8)), jnp.float32)
    ref = np.zeros((1000, 8), np.float32)
    np.add.at(ref, np.asarray(idx), np.asarray(rows))
    got = np.asarray(
        jax.jit(lambda i, v: scatter_rows_factored(i, v, 1000))(idx, rows)
    )
    # compensated bf16 pair: ~3e-6 relative error.
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    got32 = np.asarray(
        jax.jit(
            lambda i, v: scatter_rows_factored(
                i, v, 1000, compute_dtype=jnp.float32
            )
        )(idx, rows)
    )
    np.testing.assert_allclose(got32, ref, rtol=1e-4, atol=1e-4)


def test_factored_fused_pair_bitwise_matches_pair():
    # "pair_fused" concatenates the value/residual strips along lanes and
    # runs ONE matmul — same per-element summation order as the two-pass
    # pair, so the result is bitwise identical.
    from tcnn_tpu.ops.scatter_rows import scatter_rows_factored

    r = np.random.default_rng(17)
    idx = jnp.asarray(r.integers(0, 1000, 4096), jnp.int32)
    rows = jnp.asarray(r.normal(size=(4096, 8)), jnp.float32)
    two = np.asarray(
        jax.jit(lambda i, v: scatter_rows_factored(i, v, 1000))(idx, rows)
    )
    one = np.asarray(
        jax.jit(
            lambda i, v: scatter_rows_factored(
                i, v, 1000, rounding="pair_fused"
            )
        )(idx, rows)
    )
    np.testing.assert_array_equal(one, two)


def test_stochastic_round_bf16_properties():
    from tcnn_tpu.ops.scatter_rows import _stochastic_round_bf16

    r = np.random.default_rng(11)
    x = jnp.asarray(r.normal(size=(4096,)).astype(np.float32))
    got = np.asarray(jax.jit(_stochastic_round_bf16)(x)).astype(np.float32)
    xf = np.asarray(x)
    # Each output is one of the two bf16 neighbors of the input.
    lo = xf.view(np.uint32) & np.uint32(0xFFFF0000)
    lo_f = lo.view(np.float32)
    hi_f = (lo + np.uint32(0x10000)).view(np.float32)
    assert np.all((got == lo_f) | (got == hi_f))
    # Unbiased-ish across many values: mean signed error well under the
    # half-ulp bias a fixed rounding direction would produce.
    err = got - xf
    ulp = np.abs(hi_f - lo_f)
    assert abs(np.mean(err / ulp)) < 0.05
    # Exactly-representable values are fixed points; zeros stay zero.
    exact = jnp.asarray([0.0, -0.0, 1.0, -2.5, 3.140625])
    np.testing.assert_array_equal(
        np.asarray(_stochastic_round_bf16(exact)).astype(np.float32),
        np.asarray(exact),
    )


def test_factored_sr_scatter_close_and_trains():
    from tcnn_tpu.ops.scatter_rows import scatter_rows_factored

    r = np.random.default_rng(13)
    idx = jnp.asarray(r.integers(0, 1000, 4096), jnp.int32)
    rows = jnp.asarray(r.normal(size=(4096, 8)), jnp.float32)
    ref = np.zeros((1000, 8), np.float32)
    np.add.at(ref, np.asarray(idx), np.asarray(rows))
    got = np.asarray(
        jax.jit(
            lambda i, v: scatter_rows_factored(i, v, 1000, rounding="sr")
        )(idx, rows)
    )
    # Single stochastically-rounded bf16 contribution: per-element noise
    # ~ulp(|g|) * sqrt(rows/slot); f32 accumulation on the MXU.
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)

    cfg = {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
        "encoding": {
            "otype": "HashGrid",
            "n_levels": 4,
            "log2_hashmap_size": 10,
            "base_resolution": 4,
            "hash": "CoherentAdditive",
            "gather_strategy": "quad",
            "scatter_strategy": "factored_sr",
        },
        "network": {"otype": "CutlassMLP", "n_neurons": 16,
                    "n_hidden_layers": 1},
    }
    model = tc.create_from_config(2, 3, cfg)
    r2 = np.random.default_rng(0)
    x = jnp.asarray(r2.uniform(0, 1, (512, 2)).astype(np.float32))
    y = jnp.asarray(r2.uniform(0, 1, (512, 3)).astype(np.float32))
    l0 = float(model.trainer.training_step(x, y))
    for _ in range(20):
        loss = float(model.trainer.training_step(x, y))
    assert np.isfinite(loss) and loss < l0


def test_factored_quad_gradients_match_xla():
    base = dict(
        otype="HashGrid",
        n_levels=4,
        n_features_per_level=2,
        log2_hashmap_size=8,
        base_resolution=4,
        per_level_scale=1.5,
        hash="CoherentAdditive",
        gather_strategy="quad",
    )
    a = tc.create_encoding(2, {**base, "scatter_strategy": "factored"}, 16)
    b = tc.create_encoding(2, {**base, "scatter_strategy": "xla"}, 16)
    a.output_dtype = jnp.float32
    b.output_dtype = jnp.float32
    params = jnp.asarray(
        np.random.default_rng(0).standard_normal(a.n_params).astype(np.float32)
    )
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (512, 2)), jnp.float32
    )

    def loss(enc):
        return lambda p: (enc.apply(p, x) ** 2).sum()

    ga = np.asarray(jax.grad(loss(a))(params))
    gb = np.asarray(jax.grad(loss(b))(params))
    np.testing.assert_allclose(ga, gb, rtol=1e-3, atol=1e-3)


def test_stratified_3d_matches_quad():
    base = dict(
        otype="HashGrid",
        n_levels=4,
        n_features_per_level=2,
        log2_hashmap_size=8,
        base_resolution=4,
        per_level_scale=1.5,
        hash="CoherentAdditive",
    )
    a = tc.create_encoding(
        3, {**base, "gather_strategy": "stratified", "strata": 8}, 16
    )
    b = tc.create_encoding(3, {**base, "gather_strategy": "quad"}, 16)
    b.raster_max_scale = a.raster_max_scale
    a.output_dtype = jnp.float32
    b.output_dtype = jnp.float32
    params = jnp.asarray(
        np.random.default_rng(0).standard_normal(a.n_params).astype(np.float32)
    )
    x = stratified_uniform(jax.random.PRNGKey(0), 512, 3)
    assert is_stratified(x)
    ya = np.asarray(jax.jit(a.apply)(params, x))
    yb = np.asarray(jax.jit(b.apply)(params, x))
    np.testing.assert_allclose(ya, yb, rtol=1e-5, atol=1e-6)

    def loss(enc):
        return lambda p: (enc.apply(p, x) ** 2).sum()

    ga = np.asarray(jax.grad(loss(a))(params))
    gb = np.asarray(jax.grad(loss(b))(params))
    np.testing.assert_allclose(ga, gb, rtol=1e-4, atol=1e-5)


def test_factored_per_level_gradients_match_xla():
    base = dict(
        otype="HashGrid",
        n_levels=4,
        n_features_per_level=2,
        log2_hashmap_size=8,
        base_resolution=4,
        per_level_scale=1.5,
    )  # default per_level strategy, XOR hash
    a = tc.create_encoding(2, {**base, "scatter_strategy": "factored"}, 16)
    b = tc.create_encoding(2, {**base, "scatter_strategy": "xla"}, 16)
    a.output_dtype = jnp.float32
    b.output_dtype = jnp.float32
    params = jnp.asarray(
        np.random.default_rng(0).standard_normal(a.n_params).astype(np.float32)
    )
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (512, 2)), jnp.float32
    )

    def loss(enc):
        return lambda p: (enc.apply(p, x) ** 2).sum()

    ya = np.asarray(a.apply(params, x))
    yb = np.asarray(b.apply(params, x))
    np.testing.assert_allclose(ya, yb, rtol=1e-6, atol=1e-7)
    ga = np.asarray(jax.grad(loss(a))(params))
    gb = np.asarray(jax.grad(loss(b))(params))
    np.testing.assert_allclose(ga, gb, rtol=1e-3, atol=1e-3)


def test_stratified_smoothstep_matches_quad():
    base = dict(
        otype="HashGrid",
        n_levels=4,
        n_features_per_level=2,
        log2_hashmap_size=8,
        base_resolution=4,
        per_level_scale=1.5,
        hash="CoherentAdditive",
        interpolation="Smoothstep",
    )
    a = tc.create_encoding(
        2, {**base, "gather_strategy": "stratified", "strata": 16}, 16
    )
    b = tc.create_encoding(2, {**base, "gather_strategy": "quad"}, 16)
    b.raster_max_scale = a.raster_max_scale
    a.output_dtype = jnp.float32
    b.output_dtype = jnp.float32
    params = jnp.asarray(
        np.random.default_rng(0).standard_normal(a.n_params).astype(np.float32)
    )
    x = stratified_uniform(jax.random.PRNGKey(1), 256, 2)
    # Smoothstep + quad falls back to per-level (quad needs Linear), but
    # the hash/strides are identical, so outputs must match exactly.
    ya = np.asarray(a.apply(params, x))
    yb = np.asarray(b.apply(params, x))
    np.testing.assert_allclose(ya, yb, rtol=1e-5, atol=1e-6)

    def loss(enc):
        return lambda p: (enc.apply(p, x) ** 2).sum()

    ga = np.asarray(jax.grad(loss(a))(params))
    gb = np.asarray(jax.grad(loss(b))(params))
    np.testing.assert_allclose(ga, gb, rtol=1e-4, atol=1e-5)


def test_batched_gather_rows_op():
    """The batched level-axis gather/scatter op (kept for future use;
    measured slower composed than per-level on v5e) stays correct."""
    from tcnn_tpu.ops.scatter_rows import gather_rows_batched

    r = np.random.default_rng(3)
    K, S, B, R = 3, 256, 1024, 8
    tables = jnp.asarray(r.normal(size=(K, S, R)).astype(np.float32))
    idx = jnp.asarray(r.integers(0, S, (K, B)), jnp.int32)
    g = jnp.asarray(r.normal(size=(K, B, R)).astype(np.float32))
    out = np.asarray(gather_rows_batched(tables, idx, "factored"))
    ref = np.stack(
        [np.asarray(tables[k])[np.asarray(idx[k])] for k in range(K)]
    )
    np.testing.assert_array_equal(out, ref)
    for mode, tol in (("factored", 1e-3), ("xla", 0.0)):
        dt = jax.vjp(
            lambda t: gather_rows_batched(t, idx, mode), tables
        )[1](g)[0]
        refdt = np.zeros((K, S, R), np.float32)
        for k in range(K):
            np.add.at(refdt[k], np.asarray(idx[k]), np.asarray(g[k]))
        np.testing.assert_allclose(
            np.asarray(dt), refdt, rtol=tol, atol=tol
        )


def test_nonconforming_layout_poisons():
    """ADVICE r1 (high): a conforming-SIZE batch with a non-conforming
    LAYOUT must fail loudly (NaN poison), not silently return wrong
    features; stratified=False must give the exact per-sample fallback."""
    a, b, params = _pair()
    x = stratified_uniform(jax.random.PRNGKey(0), 256, 2)
    perm = np.random.default_rng(5).permutation(256)
    x_bad = x[jnp.asarray(perm)]
    assert not is_stratified(x_bad)

    y_bad = np.asarray(a.apply(params, x_bad))
    # All real feature lanes NaN (alignment padding lanes stay 0).
    n_real = a.n_levels * a.n_features_per_level
    assert np.isnan(y_bad[:, :n_real]).all(), "violation must NaN-poison"

    # Explicit opt-out: per-sample fallback, identical to the quad ref.
    y_ok = np.asarray(a.apply(params, x_bad, stratified=False))
    y_ref = np.asarray(b.apply(params, x_bad))
    np.testing.assert_allclose(y_ok, y_ref, rtol=1e-6, atol=1e-7)

    # Conforming batches never poison.
    y = np.asarray(a.apply(params, x))
    assert np.isfinite(y).all()

    # stratified=True with an impossible batch size raises at trace time.
    import pytest

    with pytest.raises(ValueError, match="stratified=True"):
        a.apply(params, x[:200], stratified=True)


def test_smoothstep_hashed_raster_level_permutation_invariance():
    """ADVICE r1 (medium): with Smoothstep interpolation, hashed levels
    under raster_max_scale must use the raster-additive fold on EVERY
    path — the encoding is a pure function of position, so shuffling the
    batch (which drops it to the per-sample fallback) must only permute
    the output."""
    base = dict(
        otype="HashGrid",
        n_levels=6,  # levels 4-5 (res 21/31) are hashed at 2^8 rows
        n_features_per_level=2,
        log2_hashmap_size=8,
        base_resolution=4,
        per_level_scale=1.5,
        hash="CoherentAdditive",
        interpolation="Smoothstep",
    )
    a = tc.create_encoding(
        2, {**base, "gather_strategy": "stratified", "strata": 16}, 16
    )
    a.output_dtype = jnp.float32
    # The interesting case needs a hashed level with raster strides.
    assert any(
        a._use_hash[l]
        and float(a.scales[l]) <= a.raster_max_scale
        for l in range(a.n_levels)
    )
    params = jnp.asarray(
        np.random.default_rng(0).standard_normal(a.n_params).astype(np.float32)
    )
    x = stratified_uniform(jax.random.PRNGKey(1), 256, 2)
    perm = jnp.asarray(np.random.default_rng(2).permutation(256))
    ya = np.asarray(a.apply(params, x, stratified=True))
    yb = np.asarray(a.apply(params, x[perm], stratified=False))
    np.testing.assert_allclose(ya[np.asarray(perm)], yb, rtol=1e-5, atol=1e-6)


def test_trainer_inference_forces_fallback():
    """Trainer.inference serves arbitrary batch layouts: it must route
    around the stratified static path (ADVICE r1: raster chunks of a
    w != strata image were silently corrupted)."""
    cfg = {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
        "encoding": {
            "otype": "HashGrid",
            "n_levels": 4,
            "n_features_per_level": 2,
            "log2_hashmap_size": 8,
            "base_resolution": 4,
            "per_level_scale": 1.5,
            "hash": "CoherentAdditive",
            "gather_strategy": "stratified",
            "strata": 16,
        },
        "network": {
            "otype": "CutlassMLP",
            "n_neurons": 16,
            "n_hidden_layers": 1,
        },
    }
    model = tc.create_from_config(2, 3, cfg)
    x = stratified_uniform(jax.random.PRNGKey(0), 256, 2)
    perm = jnp.asarray(np.random.default_rng(1).permutation(256))
    out_sorted = np.asarray(model.trainer.inference(x))
    out_shuffled = np.asarray(model.trainer.inference(x[perm]))
    assert np.isfinite(out_shuffled).all()
    np.testing.assert_allclose(
        out_sorted[np.asarray(perm)], out_shuffled, rtol=2e-2, atol=2e-3
    )


def test_factored_kernel_scatter_in_grid():
    """The fused Pallas factored scatter (scatter_strategy
    'factored_kernel') matches the XLA scatter path through a full grid
    gradient, and trains end-to-end."""
    base = dict(
        otype="HashGrid",
        n_levels=4,
        n_features_per_level=2,
        log2_hashmap_size=8,
        base_resolution=4,
        per_level_scale=1.5,
        hash="CoherentAdditive",
        gather_strategy="quad",
    )
    a = tc.create_encoding(
        2, {**base, "scatter_strategy": "factored_kernel"}, 16
    )
    b = tc.create_encoding(2, {**base, "scatter_strategy": "xla"}, 16)
    a.output_dtype = jnp.float32
    b.output_dtype = jnp.float32
    params = jnp.asarray(
        np.random.default_rng(0).standard_normal(a.n_params).astype(np.float32)
    )
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (512, 2)), jnp.float32
    )

    def loss(enc):
        return lambda p: (enc.apply(p, x) ** 2).sum()

    ga = np.asarray(jax.grad(loss(a))(params))
    gb = np.asarray(jax.grad(loss(b))(params))
    np.testing.assert_allclose(ga, gb, rtol=1e-3, atol=1e-3)



def test_factored_kernel_unroll_and_sr_modes():
    """Kernel-internal knobs: the unrolled chunk loop is bitwise-identical
    to the fori_loop form, and the in-kernel SR mode matches the XLA
    factored_sr rounding (same value-hash; same f32 accumulation)."""
    from tcnn_tpu.ops.scatter_rows import (
        scatter_rows_factored,
        scatter_rows_factored_pallas,
    )

    r = np.random.default_rng(3)
    B, S, R = 4096, 512, 8
    idx = jnp.asarray(r.integers(0, S, B), jnp.int32)
    rows = jnp.asarray(r.normal(0, 1, (B, R)), jnp.float32)
    a = np.asarray(
        scatter_rows_factored_pallas(idx, rows, S, sub=512, unroll=True)
    )
    b = np.asarray(
        scatter_rows_factored_pallas(idx, rows, S, sub=512, unroll=False)
    )
    np.testing.assert_array_equal(a, b)
    sr_k = np.asarray(
        scatter_rows_factored_pallas(idx, rows, S, sub=512, rounding="sr")
    )
    sr_x = np.asarray(scatter_rows_factored(idx, rows, S, rounding="sr"))
    np.testing.assert_allclose(sr_k, sr_x, rtol=1e-5, atol=1e-5)
    # SR stays close to the exact pair result on average.
    np.testing.assert_allclose(sr_k, a, rtol=2e-2, atol=2e-2)


def test_kernel_max_rows_slicing_parity():
    """The Mosaic-envelope slice split (max_rows) must be numerically
    equivalent to the unsliced kernel call up to partial-sum reordering
    (f32 adds of bf16-pair products)."""
    from tcnn_tpu.ops.scatter_rows import (
        scatter_rows_factored_pallas,
        scatter_rows_serial,
    )

    r = np.random.default_rng(7)
    B, S, R = 8192, 256, 8
    idx = jnp.asarray(r.integers(0, S, B), jnp.int32)
    rows = jnp.asarray(r.normal(0, 1, (B, R)), jnp.float32)
    whole = np.asarray(
        scatter_rows_factored_pallas(idx, rows, S, sub=512, max_rows=None)
    )
    sliced = np.asarray(
        scatter_rows_factored_pallas(idx, rows, S, sub=512, max_rows=2048)
    )
    np.testing.assert_allclose(sliced, whole, rtol=1e-5, atol=1e-5)
    whole_s = np.asarray(
        scatter_rows_serial(idx, rows, S, c_chunk=512, max_rows=None)
    )
    sliced_s = np.asarray(
        scatter_rows_serial(idx, rows, S, c_chunk=512, max_rows=2048)
    )
    np.testing.assert_allclose(sliced_s, whole_s, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(whole_s, whole, rtol=1e-2, atol=1e-2)

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

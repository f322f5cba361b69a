"""Lane-packed quad tables (quad_pack="auto"): exact re-layout of the quad
path — same rows, same weights, same scatter mode — so features and
gradients must match the unpacked path to float-roundoff.

The packing exists for TPU layout reasons (PLAN.md round 2: the unpacked
(size, 2^d*F) quad table pads every row to 128 lanes and its roll adjoints
materialize 64x-padded narrow arrays — 37 GB/step at 3D NeRF scale)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tcnn_tpu as tc


def _enc(n_dims, quad_pack, **extra):
    cfg = dict(
        otype="HashGrid",
        n_levels=8,
        n_features_per_level=2,
        log2_hashmap_size=12,
        base_resolution=4,
        per_level_scale=1.8,
        hash="CoherentAdditive",
        gather_strategy="quad",
        quad_pack=quad_pack,
    )
    cfg.update(extra)
    e = tc.create_encoding(n_dims, cfg, 16)
    e.output_dtype = jnp.float32
    return e


@pytest.mark.parametrize("n_dims", [2, 3])
@pytest.mark.parametrize("mode", ["packed", "auto"])
def test_packed_matches_unpacked(n_dims, mode):
    a = _enc(n_dims, "off")
    b = _enc(n_dims, mode)
    r = np.random.default_rng(0)
    params = jnp.asarray(r.standard_normal(a.n_params).astype(np.float32))
    x = jnp.asarray(r.uniform(0, 1, (128, n_dims)), jnp.float32)
    ya = np.asarray(jax.jit(a.apply)(params, x))
    yb = np.asarray(jax.jit(b.apply)(params, x))
    # The packed path gathers bitwise-identical rows (relayout only, covered
    # by the isolation check below); the composed program may still differ
    # by 1 ulp from different FMA contraction in XLA's fusions.
    np.testing.assert_allclose(ya, yb, rtol=2e-6, atol=2e-6)
    # Isolation: the packed table IS the quad table, bitwise.
    table = params.reshape(-1, a.n_features_per_level)
    for lvl in range(a.n_levels):
        K = a._pack_k()
        size = int(a.offset_table[lvl + 1] - a.offset_table[lvl])
        if K < 2 or size % K:
            continue
        q = np.asarray(a._quad_table(table, lvl))
        qp = np.asarray(a._quad_table_packed(params, lvl))
        C = 2**n_dims
        F = a.n_features_per_level
        qre = np.transpose(
            qp.reshape(size // K, C, K, F), (0, 2, 1, 3)
        ).reshape(size, C * F)
        np.testing.assert_array_equal(qre, q)


@pytest.mark.parametrize("n_dims", [2, 3])
def test_packed_gradients_match(n_dims):
    a = _enc(n_dims, "off")
    b = _enc(n_dims, "auto")
    r = np.random.default_rng(1)
    params = jnp.asarray(r.standard_normal(a.n_params).astype(np.float32))
    x = jnp.asarray(r.uniform(0, 1, (128, n_dims)), jnp.float32)

    def loss(e):
        return lambda p: (e.apply(p, x).astype(jnp.float32) ** 2).sum()

    ga = np.asarray(jax.jit(jax.grad(loss(a)))(params))
    gb = np.asarray(jax.jit(jax.grad(loss(b)))(params))
    np.testing.assert_allclose(ga, gb, rtol=1e-5, atol=1e-5)


def test_packed_second_order():
    # Eikonal-style grad-of-grad through the packed path (VERDICT r1 #3:
    # second-order must work on every execution path).
    e = _enc(3, "auto", interpolation="Smoothstep")
    r = np.random.default_rng(2)
    params = jnp.asarray(r.standard_normal(e.n_params).astype(np.float32))
    x = jnp.asarray(r.uniform(0.1, 0.9, (32, 3)), jnp.float32)

    def sdf(p, pts):
        return e.apply(p, pts[None, :]).astype(jnp.float32).sum()

    def eik(p):
        g = jax.vmap(jax.grad(sdf, argnums=1), in_axes=(None, 0))(p, x)
        return ((jnp.linalg.norm(g, axis=-1) - 1) ** 2).mean()

    gg = jax.jit(jax.grad(eik))(params)
    assert np.isfinite(np.asarray(gg)).all()
    assert float(jnp.abs(gg).max()) > 0


@pytest.mark.parametrize("n_dims", [2, 3])
def test_hybrid_matches_unpacked(n_dims):
    # quad_pack="hybrid": unpacked-gather forward (bitwise-identical
    # features) with the packed-layout scatter transpose (gradients match
    # the packed path to accumulation roundoff).
    a = _enc(n_dims, "off")
    h = _enc(n_dims, "hybrid")
    p = _enc(n_dims, "packed")
    r = np.random.default_rng(4)
    params = jnp.asarray(r.standard_normal(a.n_params).astype(np.float32))
    x = jnp.asarray(r.uniform(0, 1, (256, n_dims)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(jax.jit(a.apply)(params, x)),
        np.asarray(jax.jit(h.apply)(params, x)),
    )

    def loss(e):
        return lambda q: (e.apply(q, x).astype(jnp.float32) ** 2).sum()

    gh = np.asarray(jax.jit(jax.grad(loss(h)))(params))
    gp = np.asarray(jax.jit(jax.grad(loss(p)))(params))
    np.testing.assert_allclose(gh, gp, rtol=1e-5, atol=1e-5)


def test_hybrid_second_order():
    # grad∘grad composes through linear_call (transpose of the transpose
    # is the unpacked gather again).
    e = _enc(3, "hybrid", interpolation="Smoothstep")
    o = _enc(3, "off", interpolation="Smoothstep")
    r = np.random.default_rng(5)
    params = jnp.asarray(r.standard_normal(e.n_params).astype(np.float32))
    x = jnp.asarray(r.uniform(0.1, 0.9, (32, 3)), jnp.float32)

    def eik(enc):
        def sdf(p, pts):
            return enc.apply(p, pts[None, :]).astype(jnp.float32).sum()

        def f(p):
            g = jax.vmap(jax.grad(sdf, argnums=1), in_axes=(None, 0))(p, x)
            return ((jnp.linalg.norm(g, axis=-1) - 1) ** 2).mean()

        return f

    gg = np.asarray(jax.jit(jax.grad(eik(e)))(params))
    gg0 = np.asarray(jax.jit(jax.grad(eik(o)))(params))
    np.testing.assert_allclose(gg, gg0, rtol=1e-4, atol=1e-5)


def test_packed_skips_nondivisible_levels():
    # base_resolution=7 gives a 56-row dense level (8-aligned, not
    # 16-aligned for d=2/F=2 -> K=16); the packed gate must fall back
    # per-level without changing results.
    a = _enc(2, "off", base_resolution=7, n_levels=6)
    b = _enc(2, "auto", base_resolution=7, n_levels=6)
    r = np.random.default_rng(3)
    params = jnp.asarray(r.standard_normal(a.n_params).astype(np.float32))
    x = jnp.asarray(r.uniform(0, 1, (64, 2)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(jax.jit(a.apply)(params, x)),
        np.asarray(jax.jit(b.apply)(params, x)),
    )


def test_packed_hyperparam_roundtrip():
    e = _enc(2, "auto")
    hp = e.hyperparams()
    assert hp["quad_pack"] == "auto"
    e2 = tc.create_encoding(2, hp, 16)
    assert e2.quad_pack == "auto"


@pytest.mark.parametrize("tdtype", ["float16", "bfloat16"])
@pytest.mark.parametrize("mode", ["off", "auto"])
def test_table_dtype_close_and_differentiable(mode, tdtype):
    # table_dtype rounds the FORWARD table copy only (the reference stores
    # grid params in fp16 outright, grid.h params_type); outputs must match
    # the f32 table to storage-rounding tolerance and gradients must flow
    # back to the fp32 master params.
    a = _enc(3, mode)
    b = _enc(3, mode, table_dtype=tdtype)
    assert b.hyperparams()["table_dtype"] == tdtype
    r = np.random.default_rng(3)
    params = jnp.asarray(
        (r.standard_normal(a.n_params) * 0.1).astype(np.float32)
    )
    x = jnp.asarray(r.uniform(0, 1, (256, 3)), jnp.float32)
    ya = np.asarray(jax.jit(a.apply)(params, x))
    yb = np.asarray(jax.jit(b.apply)(params, x))
    tol = 2e-3 if tdtype == "float16" else 2e-2  # ~ulp of the storage type
    np.testing.assert_allclose(ya, yb, rtol=tol, atol=tol)

    def loss(p):
        return (b.apply(p, x).astype(jnp.float32) ** 2).sum()

    g = np.asarray(jax.jit(jax.grad(loss))(params))
    assert g.dtype == np.float32 and np.isfinite(g).all()
    ga = np.asarray(
        jax.jit(jax.grad(lambda p: (a.apply(p, x).astype(jnp.float32) ** 2).sum()))(params)
    )
    np.testing.assert_allclose(g, ga, rtol=0.1, atol=2 * tol)


def test_table_dtype_invalid_rejected():
    with pytest.raises(ValueError):
        _enc(2, "auto", table_dtype="int8")


def test_table_dtype_gradients_accumulate_f32():
    # Regression (review 2026-08-17): half forward tables must NOT tie
    # gradient accumulation to the half dtype — fp16 scatter-add overflows
    # under loss-scaled cotangents. The cast lives inside the linear
    # pair's forward, so the transpose accumulates in f32.
    from tcnn_tpu.ops.scatter_rows import gather_rows

    size, rows_n, R = 64, 65536, 4
    r = np.random.default_rng(5)
    idx = jnp.asarray(r.integers(0, size, rows_n), jnp.int32)
    table = jnp.asarray(r.standard_normal((size, R)).astype(np.float32))

    for mode in ("xla", "xla_pib", "factored"):
        def f(t):
            # Constant large cotangent: per-slot sums ~7e7 >> fp16 max.
            return (gather_rows(t, idx, mode,
                                forward_dtype=jnp.float16) * 7e4).sum()

        g = np.asarray(jax.grad(f)(table))
        assert np.isfinite(g).all(), mode
        exact = np.zeros((size, R), np.float32)
        np.add.at(exact, np.asarray(idx),
                  np.full((rows_n, R), 7e4, np.float32))
        np.testing.assert_allclose(g, exact, rtol=1e-3), mode

    # Forward values ARE rounded to fp16 storage.
    rows_half = np.asarray(gather_rows(table, idx, "xla",
                                       forward_dtype=jnp.float16))
    expect = np.asarray(table).astype(np.float16).astype(np.float32)[
        np.asarray(idx)
    ]
    np.testing.assert_array_equal(rows_half, expect)
    assert rows_half.dtype == np.float32


def test_table_dtype_full_model_overflow_regression():
    # End-to-end: fp16 tables + default loss scale + Adam must stay finite
    # (the pre-fix code NaN'd params after one step at modest scales).
    cfg = dict(
        otype="HashGrid", n_levels=4, n_features_per_level=2,
        log2_hashmap_size=8, base_resolution=4, per_level_scale=1.5,
        hash="CoherentAdditive", gather_strategy="quad",
        scatter_strategy="xla", table_dtype="float16",
    )
    import tcnn_tpu as tc2

    model = tc2.create_from_config(2, 3, {
        "loss": {"otype": "L2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
        "encoding": cfg,
        "network": {"otype": "CutlassMLP", "n_neurons": 16,
                    "n_hidden_layers": 1},
    })
    r = np.random.default_rng(0)
    x = jnp.asarray(r.uniform(0, 1, (4096, 2)).astype(np.float32))
    y = jnp.asarray(100.0 * r.uniform(0, 1, (4096, 3)).astype(np.float32))
    for _ in range(3):
        loss = float(model.trainer.training_step(x, y))
        assert np.isfinite(loss)
    assert np.isfinite(np.asarray(model.trainer.params)).all()

"""Phase-locked stratified mode: static-index fine levels (PLAN.md round 3).

The sampler shares ONE jitter vector across the batch
(stratified_uniform(phase_locked=True)); fine hashed levels then have
compile-time-constant cell indices plus one scalar table shift, and their
table-gradient scatter runs as a static reorder-gather + bucketed one-hot
MXU matmuls (ops.scatter_packed_static_csr) instead of the scatter
emitter. These tests pin:

- scale snapping invariants (param layout/checkpoint compatibility),
- forward/gradient parity against the per-sample fallback path of the
  SAME encoding (`stratified=False` — the exact-function oracle),
- every locked_rounding knob,
- second-order differentiation through the locked path,
- contract violations NaN-poisoning the output,
- the CSR builder and sampler contracts.

Reference context: the CUDA grid trains on i.i.d. uniform batches
(samples/mlp_learning_an_image.cu:266-270) with atomicAdd gradient
accumulation (grid.h:436-535); phase-locked stratification is the
TPU-native batch layout that removes the need for scatter hardware while
keeping per-sample uniform marginals (convergence validated by the
image-fit golden PSNR, samples/mlp_learning_an_image.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcnn_tpu.encodings.grid import create_grid_encoding
from tcnn_tpu.ops.scatter_rows import (
    build_static_csr,
    scatter_packed_static_csr,
)
from tcnn_tpu.utils.sampling import stratified_uniform

STRATA = 16
B = STRATA**2


def make_enc(d=2, strata=STRATA, **over):
    cfg = dict(
        otype="HashGrid",
        n_levels=8,
        n_features_per_level=2,
        log2_hashmap_size=9,
        base_resolution=4,
        per_level_scale=2.0,
        hash="CoherentAdditive",
        gather_strategy="stratified",
        strata=strata,
        phase_locked=True,
    )
    cfg.update(over)
    return create_grid_encoding(d, cfg)


def locked_batch(key, n=B, dims=2):
    return stratified_uniform(key, n, dims, phase_locked=True)


@pytest.fixture(scope="module")
def setup():
    enc = make_enc()
    rng = np.random.default_rng(0)
    params = jnp.asarray(
        rng.normal(0, 0.1, (enc.n_params,)).astype(np.float32)
    )
    x = locked_batch(jax.random.PRNGKey(3))
    return enc, params, x


def test_snapping_preserves_layout():
    enc = make_enc()
    ref = make_enc(phase_locked=False)
    assert enc.n_params == ref.n_params
    assert np.array_equal(enc.offset_table, ref.offset_table)
    locked = enc._locked_levels(STRATA)
    assert locked, "no locked levels in the test config"
    for lvl in locked:
        assert float(enc.scales[lvl]) % STRATA == 0
        assert enc._use_hash[lvl]
    # coarse static levels keep the exact reference scales
    for lvl in range(enc.n_levels):
        if float(ref.scales[lvl]) <= enc.raster_max_scale:
            assert float(enc.scales[lvl]) == float(ref.scales[lvl])


def test_forward_matches_fallback(setup):
    enc, params, x = setup
    y = enc.apply(params, x)
    y_ref = enc.apply(params, x, stratified=False)
    assert not jnp.isnan(y).any()
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=0, atol=1e-5
    )


@pytest.mark.parametrize("rounding", ["pair", "single", "sr", "f32"])
def test_grad_matches_fallback(setup, rounding):
    enc, params, x = setup
    enc.locked_rounding = rounding

    def loss(p, locked):
        y = enc.apply(p, x, stratified=None if locked else False)
        return jnp.sum(jnp.sin(y))

    try:
        g = jax.grad(loss)(params, True)
        g_ref = jax.grad(loss)(params, False)
    finally:
        enc.locked_rounding = "pair"
    scale = float(jnp.abs(g_ref).max()) + 1e-30
    rel = float(jnp.abs(g - g_ref).max()) / scale
    tol = {"pair": 2e-5, "f32": 1e-6, "single": 2e-2, "sr": 3e-2}[rounding]
    assert rel < tol, (rounding, rel)


def test_input_gradients_match(setup):
    enc, params, x = setup

    def out_sum(xx, locked):
        y = enc.apply(params, xx, stratified=None if locked else False)
        return jnp.sum(jnp.cos(y))

    g = jax.grad(out_sum)(x, True)
    g_ref = jax.grad(out_sum)(x, False)
    scale = float(jnp.abs(g_ref).max()) + 1e-30
    assert float(jnp.abs(g - g_ref).max()) / scale < 1e-5


def test_second_order(setup):
    """grad-of-grad through the locked linear pair (eikonal pattern)."""
    enc, params, x = setup

    def eikonal(p):
        def f(xx):
            return jnp.sum(enc.apply(p, xx))

        gx = jax.grad(f)(x)
        return jnp.sum((jnp.linalg.norm(gx, axis=-1) - 1.0) ** 2)

    g = jax.grad(eikonal)(params)
    assert jnp.isfinite(g).all()
    assert float(jnp.abs(g).max()) > 0


def test_boundary_phase_is_continuous():
    """A shared jitter landing exactly on a cell boundary must not corrupt
    the output: the predicted-grid/t split compensates by lerp continuity."""
    enc = make_enc()
    rng = np.random.default_rng(1)
    params = jnp.asarray(
        rng.normal(0, 0.1, (enc.n_params,)).astype(np.float32)
    )
    # dx such that dx * scale + 0.5 is an exact integer for the first
    # locked level (scale 64): dx = 1.5 / 64.
    dx = np.float32(1.5 / 64.0)
    ids = np.arange(B)
    base = np.stack([ids % STRATA, ids // STRATA], axis=1).astype(np.float32)
    x = jnp.asarray((base + dx) / STRATA)
    y = enc.apply(params, x)
    y_ref = enc.apply(params, x, stratified=False)
    assert not jnp.isnan(y).any()
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=0, atol=1e-4
    )


def test_misuse_poisons(setup):
    enc, params, _ = setup
    x_iid = jax.random.uniform(jax.random.PRNGKey(5), (B, 2))
    assert bool(jnp.isnan(enc.apply(params, x_iid)).any())
    # per-tile independent jitter satisfies the raster contract but NOT
    # the phase lock -> must also poison
    x_strat = stratified_uniform(jax.random.PRNGKey(6), B, 2)
    assert bool(jnp.isnan(enc.apply(params, x_strat)).any())
    # the fallback path stays clean for the same batches
    assert not jnp.isnan(
        enc.apply(params, x_strat, stratified=False)
    ).any()


def test_3d_locked(setup):
    enc = make_enc(d=3, strata=8, log2_hashmap_size=9)
    assert enc._locked_levels(8)
    rng = np.random.default_rng(2)
    params = jnp.asarray(
        rng.normal(0, 0.1, (enc.n_params,)).astype(np.float32)
    )
    x = stratified_uniform(jax.random.PRNGKey(7), 8**3, 3, phase_locked=True)
    y = enc.apply(params, x)
    y_ref = enc.apply(params, x, stratified=False)
    assert not jnp.isnan(y).any()
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=0, atol=1e-5
    )
    g = jax.grad(lambda p: jnp.sum(jnp.sin(enc.apply(p, x))))(params)
    g_ref = jax.grad(
        lambda p: jnp.sum(jnp.sin(enc.apply(p, x, stratified=False)))
    )(params)
    rel = float(jnp.abs(g - g_ref).max()) / (
        float(jnp.abs(g_ref).max()) + 1e-30
    )
    assert rel < 2e-5


def test_phase_locked_requires_stratified():
    with pytest.raises(ValueError, match="phase_locked"):
        create_grid_encoding(
            2, {"otype": "HashGrid", "phase_locked": True}
        )


def test_csr_builder():
    rng = np.random.default_rng(0)
    targets = rng.integers(0, 100, 57)
    order, lo, nb, M = build_static_csr(targets, 100, 16)
    assert nb == 7 and order.shape == (nb * M,)
    # every real row appears exactly once with the right lo
    seen = {}
    for slot_id, r in enumerate(order):
        if r < 57:
            seen[int(r)] = (slot_id // M, lo.reshape(-1)[slot_id])
    assert len(seen) == 57
    for r, (b, lo_r) in seen.items():
        assert targets[r] // 16 == b
        assert targets[r] % 16 == lo_r


def test_csr_scatter_matches_dense():
    rng = np.random.default_rng(3)
    B_, S, d, F = 500, 256, 2, 2
    C = 2**d
    K = 128 // (C * F)
    cells = rng.integers(0, S, B_)
    prow, slot = cells // K, cells % K
    order, lo, nb, M = build_static_csr(prow, S // K, 128)
    ss = np.full(order.shape, -1, np.int32)
    mask = order < B_
    ss[mask] = slot[order[mask]].astype(np.int32)
    rows = rng.normal(0, 1, (B_, C * F)).astype(np.float32)
    got = np.asarray(
        scatter_packed_static_csr(
            jnp.asarray(rows), order, lo, ss.reshape(nb, M), nb, M, K, F,
            S // K, "f32",
        )
    )
    want = np.zeros((S // K, 128), np.float32)
    for j in range(B_):
        for c in range(C):
            for f in range(F):
                want[prow[j], c * K * F + slot[j] * F + f] += rows[j, c * F + f]
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_sampler_phase_locked_contract():
    x = np.asarray(locked_batch(jax.random.PRNGKey(11)))
    ids = np.arange(B)
    tiles = np.stack([ids % STRATA, ids // STRATA], axis=1)
    frac = x * STRATA - tiles
    assert (frac >= 0).all() and (frac < 1).all()
    # one shared jitter vector
    assert np.abs(frac - frac[0]).max() < 1e-5
    with pytest.raises(ValueError, match="mutually exclusive"):
        stratified_uniform(
            jax.random.PRNGKey(0), B, 2, run_correlated=True,
            phase_locked=True,
        )


# ---------------------------------------------------------------------------
# G-phase locking (locked_phases > 1): G shared jitter vectors per batch,
# tile j on phase j % G — restores per-step jitter diversity (G=1 measured
# 44.2 dB vs the 47+ dB image-fit golden band) while every fine level stays
# compile-time static up to G scalar shifts.


@pytest.mark.parametrize("G", [2, 8])
def test_gphase_matches_fallback(G):
    enc = make_enc(locked_phases=G)
    rng = np.random.default_rng(0)
    params = jnp.asarray(
        rng.normal(0, 0.1, (enc.n_params,)).astype(np.float32)
    )
    x = stratified_uniform(jax.random.PRNGKey(7), B, 2, phase_locked=G)
    y = enc.apply(params, x)
    y_ref = enc.apply(params, x, stratified=False)
    assert jnp.isfinite(y).all()
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=0, atol=1e-5
    )

    def loss(p, locked):
        yy = enc.apply(p, x, stratified=None if locked else False)
        return jnp.sum(jnp.sin(yy))

    g = jax.grad(loss)(params, True)
    g_ref = jax.grad(loss)(params, False)
    scale = float(jnp.abs(g_ref).max()) + 1e-30
    assert float(jnp.abs(g - g_ref).max()) / scale < 2e-5


def test_gphase_sampler_divisibility_contract():
    enc = make_enc(locked_phases=4)
    rng = np.random.default_rng(0)
    params = jnp.asarray(
        rng.normal(0, 0.1, (enc.n_params,)).astype(np.float32)
    )
    # sampler G' divides grid G: valid (phase groups refine correctly)
    for gp in (1, 2, 4):
        x = stratified_uniform(jax.random.PRNGKey(5), B, 2, phase_locked=gp)
        assert jnp.isfinite(enc.apply(params, x)).all(), gp
    # sampler G' NOT dividing grid G, and per-sample jitter: poisoned
    x8 = stratified_uniform(jax.random.PRNGKey(5), B, 2, phase_locked=8)
    assert jnp.isnan(enc.apply(params, x8)).any()
    xs = stratified_uniform(jax.random.PRNGKey(5), B, 2)
    assert jnp.isnan(enc.apply(params, xs)).any()


def test_gphase_second_order():
    # Linear interpolation: _locked_levels requires it — Smoothstep
    # would silently test the unlocked fallback instead.
    enc = make_enc(locked_phases=2)
    assert enc._locked_levels(STRATA), "locked set empty — test is void"
    rng = np.random.default_rng(2)
    params = jnp.asarray(
        rng.normal(0, 0.1, (enc.n_params,)).astype(np.float32)
    )
    x = stratified_uniform(jax.random.PRNGKey(9), B, 2, phase_locked=2)

    def eikonal(p):
        def f(xx):
            return jnp.sum(enc.apply(p, xx))

        g = jax.grad(lambda xx: f(xx))(x)
        return jnp.sum((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    g2 = jax.grad(eikonal)(params)
    assert jnp.isfinite(g2).all()


def test_gphase_sampler_layout():
    G = 4
    x = np.asarray(
        stratified_uniform(jax.random.PRNGKey(11), B, 2, phase_locked=G)
    )
    ids = np.arange(B)
    tiles = np.stack([ids % STRATA, ids // STRATA], axis=1)
    frac = x * STRATA - tiles
    assert (frac >= 0).all() and (frac < 1).all()
    # exactly G distinct jitter vectors, assigned by j % G
    for g in range(G):
        assert np.abs(frac[g::G] - frac[g]).max() < 1e-5
    distinct = {tuple(np.round(f, 6)) for f in frac[:G]}
    assert len(distinct) == G
    with pytest.raises(ValueError, match="divisor"):
        stratified_uniform(jax.random.PRNGKey(0), B, 2, phase_locked=7)


def test_snap_tolerance_excludes_outliers():
    # tol excludes the big-move first snappable level; it keeps its exact
    # reference scale and stays unlocked, the rest lock; layout unchanged.
    tight = make_enc(locked_snap_tol=1e-6)
    loose = make_enc()
    ref = make_enc(phase_locked=False)
    assert tight.n_params == ref.n_params
    assert len(tight._locked_levels(STRATA)) <= len(
        loose._locked_levels(STRATA)
    )
    for lvl in range(tight.n_levels):
        if lvl not in tight._locked_levels(STRATA):
            if float(ref.scales[lvl]) % STRATA:
                assert float(tight.scales[lvl]) == float(ref.scales[lvl])


@pytest.mark.parametrize("d_strata", [(2, STRATA), (3, 8)])
def test_locked_fwd_packed_parity(d_strata):
    # The packed locked forward (compact (B,128) gather + KxK constant
    # one-hot select) is an exact relayout of the unpacked quad gather.
    d, strata = d_strata
    B_ = strata**d
    over = dict(strata=strata, locked_phases=2)
    if d == 3:
        over.update(log2_hashmap_size=10, n_levels=6)
    enc_u = make_enc(d=d, **over, locked_fwd="unpacked")
    enc_p = make_enc(d=d, **over, locked_fwd="packed")
    assert enc_p._locked_levels(strata)
    rng = np.random.default_rng(0)
    params = jnp.asarray(
        rng.normal(0, 0.1, (enc_u.n_params,)).astype(np.float32)
    )
    x = stratified_uniform(jax.random.PRNGKey(3), B_, d, phase_locked=2)
    np.testing.assert_array_equal(
        np.asarray(enc_u.apply(params, x)),
        np.asarray(enc_p.apply(params, x)),
    )

    def g(enc):
        return jax.grad(
            lambda p: jnp.sum(jnp.sin(enc.apply(p, x) * 3.0))
        )(params)

    np.testing.assert_array_equal(np.asarray(g(enc_u)), np.asarray(g(enc_p)))


@pytest.mark.parametrize("d_strata", [(2, STRATA), (3, 8)])
def test_locked_fwd_csr_parity(d_strata):
    # The CSR locked forward (bucket one-hot matmuls on the backward's
    # static-CSR structure) pre-rounds the table to an error-compensated
    # bf16 pair: features match the unpacked gather to ~3e-6 rel (the
    # pair residual carries 16 effective mantissa bits; same scheme as
    # the "pair" scatter, ops/scatter_rows.py). The params-gradient is
    # the SAME hand-written transpose either way (linear_call t_fn) so
    # the grads wrt params agree bitwise; only the primal (and grads
    # routed through it, e.g. input grads) see the table rounding.
    d, strata = d_strata
    B_ = strata**d
    over = dict(strata=strata, locked_phases=2)
    if d == 3:
        over.update(log2_hashmap_size=10, n_levels=6)
    enc_u = make_enc(d=d, **over, locked_fwd="unpacked")
    enc_c = make_enc(d=d, **over, locked_fwd="csr")
    # Compare primals in f32: the table pair-rounding's ~3e-6 error can
    # flip one ulp of the default bf16 output cast, which a bf16-domain
    # comparison mistakes for an 8e-4 miss.
    enc_u.output_dtype = jnp.float32
    enc_c.output_dtype = jnp.float32
    assert enc_c._locked_levels(strata)
    rng = np.random.default_rng(0)
    params = jnp.asarray(
        rng.normal(0, 0.1, (enc_u.n_params,)).astype(np.float32)
    )
    x = stratified_uniform(jax.random.PRNGKey(3), B_, d, phase_locked=2)
    yu = np.asarray(enc_u.apply(params, x))
    yc = np.asarray(enc_c.apply(params, x))
    assert not np.isnan(yc).any()
    scale = np.abs(yu).max() + 1e-12
    assert np.abs(yc - yu).max() / scale < 1e-5

    def g(enc):
        return np.asarray(jax.grad(
            lambda p: jnp.sum(enc.apply(p, x) * 3.0)
        )(params))

    # Linear post-map => cotangents are params-independent constants and
    # the shared t_fn sees identical inputs: grads agree bitwise.
    np.testing.assert_array_equal(g(enc_u), g(enc_c))

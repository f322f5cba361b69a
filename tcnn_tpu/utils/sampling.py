"""Batch samplers.

``stratified_uniform`` draws one jittered sample per cell of a regular
raster partition of [0, 1)^d, returned in raster order (last dim fastest).
Marginally each sample is uniform on its tile and the batch covers the
domain evenly — a standard variance-reduction sampler. Its purpose here is
also structural: batches with this layout satisfy the GridEncoding
``gather_strategy="stratified"`` contract (sample ``j`` lies in raster tile
``j``), which lets coarse grid levels run entirely on static dense ops
(no gather/scatter; see encodings/grid.py and PLAN.md).

The reference samples i.i.d. uniform positions in its training loops
(e.g. samples/mlp_learning_an_image.cu:266-270); stratified-jitter is the
TPU-native drop-in with the same convergence behavior (validated by the
image-fit PSNR golden test) and a hardware-friendly access structure.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def stratified_uniform(
    key: jax.Array,
    n: int,
    dims: int = 2,
    dtype=jnp.float32,
    run_correlated: bool = False,
    phase_locked: "bool | int" = False,
) -> jnp.ndarray:
    """One jittered uniform sample per raster tile; raster-ordered.

    Args:
      key: PRNG key.
      n: batch size; must be a perfect ``dims``-th power (e.g. 2^18 = 512^2
        for dims=2).
      dims: dimensionality of the unit cube.
      run_correlated: share the jitter of dims >= 1 across each dim-0 run
        (the ``strata`` consecutive samples that sweep dim 0). Per-sample
        marginals are unchanged (each sample is still uniform on its tile)
        and the stratified raster contract still holds; only the joint
        within a run differs. Structurally, a run then has ONE grid row
        per non-fastest dim at every grid level, which confines the run's
        raster-hashed table accesses to one contiguous window — the
        contract of the grid's windowed fine-level path (PLAN.md).
      phase_locked: share G jitter vectors across the batch: tile ``j``
        uses phase ``j % G`` (``True`` means G=1 — ONE phase, a pure
        translated raster lattice). Per-sample marginals are still
        uniform on each tile and coverage is still one sample per tile;
        across steps the phases resample uniformly, so SGD sees an
        unbiased, lower-discrepancy stream (quasi-Monte-Carlo style).
        Structurally this is the contract of the GridEncoding
        ``phase_locked`` mode (with ``locked_phases >= G``): every fine
        level's table accesses become compile-time static up to one
        scalar shift per phase (PLAN.md round 3). G > 1 restores most of
        the per-step jitter diversity that G=1 gives up (the measured
        ~3 dB image-fit PSNR cost of single-phase batches). Mutually
        exclusive with run_correlated.

    Returns:
      (n, dims) positions in [0, 1); sample ``j`` lies in tile
      ``unravel_index(j, (strata,) * dims)`` with dimension order
      (..., y, x) — i.e. dim 0 varies fastest, matching the GridEncoding
      stratified convention.
    """
    strata = round(n ** (1.0 / dims))
    if strata**dims != n:
        raise ValueError(
            f"stratified_uniform: n={n} is not a perfect {dims}-th power"
        )
    if phase_locked and run_correlated:
        raise ValueError(
            "stratified_uniform: phase_locked and run_correlated are "
            "mutually exclusive"
        )
    if phase_locked:
        n_phases = 1 if phase_locked is True else int(phase_locked)
        if n_phases < 1 or n % n_phases:
            raise ValueError(
                f"stratified_uniform: phase_locked={n_phases} must be a "
                f"positive divisor of n={n}"
            )
        phases = jax.random.uniform(key, (n_phases, dims), dtype)
        jitter = jnp.take(
            phases, jnp.arange(n, dtype=jnp.int32) % n_phases, axis=0
        )
    elif run_correlated and dims > 1:
        k0, k1 = jax.random.split(key)
        j0 = jax.random.uniform(k0, (n, 1), dtype)
        jr = jax.random.uniform(k1, (n // strata, 1, dims - 1), dtype)
        jr = jnp.broadcast_to(jr, (n // strata, strata, dims - 1))
        jitter = jnp.concatenate(
            [j0, jr.reshape(n, dims - 1)], axis=1
        )
    else:
        jitter = jax.random.uniform(key, (n, dims), dtype)
    ids = jnp.arange(n, dtype=jnp.int32)
    base = []
    for d in range(dims):
        base.append((ids // (strata**d)) % strata)  # dim d period strata^d
    base = jnp.stack(base, axis=1).astype(dtype)
    return (base + jitter) / strata


def raster_centers(side, dims: int = 2):
    """Tile-center raster positions, (prod(sides), dims) float32 numpy.

    ``side`` is an int (cubic raster) or a per-dim tuple
    ``(side_0, ..., side_{dims-1})`` (rectangular). Sample ``j`` is the
    CENTER of raster tile ``j`` (dim 0 fastest, like
    ``stratified_uniform``) — the jitter-free serving layout consumed by
    ``GridEncoding.apply_raster``, whose static-index fast path derives
    every table row at trace time from exactly these positions.
    """
    import numpy as np

    sides = (
        (int(side),) * dims
        if np.isscalar(side)
        else tuple(int(s) for s in side)
    )
    ids = np.arange(int(np.prod(sides)), dtype=np.int64)
    cols = []
    stride = 1
    for d in range(dims):
        base = (ids // stride) % sides[d]
        cols.append(
            (base.astype(np.float32) + np.float32(0.5)) / np.float32(sides[d])
        )
        stride *= sides[d]
    return np.stack(cols, axis=1)


def strata_of(n: int, dims: int = 2) -> Optional[int]:
    """The per-dim strata count if ``n`` is a perfect power, else None."""
    strata = round(n ** (1.0 / dims))
    return strata if strata**dims == n else None


def is_stratified(x, strata: Optional[int] = None) -> bool:
    """Debug helper (host-side): does batch ``x`` satisfy the stratified
    raster contract? Intended for tests/validation, not hot paths."""
    import numpy as np

    x = np.asarray(x)
    n, dims = x.shape
    strata = strata or strata_of(n, dims)
    if strata is None:
        return False
    ids = np.arange(n)
    for d in range(dims):
        tile = (ids // strata**d) % strata
        got = np.floor(x[:, d] * strata).astype(np.int64)
        if not np.array_equal(np.clip(got, 0, strata - 1), tile):
            return False
    return True

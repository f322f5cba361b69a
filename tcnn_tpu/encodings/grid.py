"""Multiresolution grid encoding (Instant-NGP hash grid).

TPU-native re-design of the reference's grid encoding
(reference: encodings/grid.h). The CUDA version launches one threadblock row
per level and scatter-adds gradients with atomics; here the forward pass is a
vectorized gather + d-linear interpolation over a (level, corner) axis, and
the backward pass is whatever JAX autodiff derives from it — an XLA
scatter-add, which on TPU is **deterministic** (an improvement over the
reference's atomics, cf. grid.h:252-255). Double backward (needed for
eikonal/SDF losses, reference grid.h:910-1042 + scripts/test_grid_bwdbwd.py)
falls out of ``jax.grad ∘ jax.grad`` with *all* second-order terms present.

Parameter layout parity: params are one flat vector of
``offset_table[n_levels] * n_features_per_level`` floats; level ``l`` owns
rows ``offset_table[l]:offset_table[l+1]`` of the ``(n_vertices, F)`` table,
features contiguous per vertex — identical offsets to the reference
(grid.h:673-737), so checkpoints are interchangeable.
"""

from __future__ import annotations

import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import (
    MAX_N_LEVELS,
    GridType,
    HashType,
    InterpolationType,
    json_value,
    next_multiple,
    string_to_grid_type,
    string_to_hash_type,
    string_to_interpolation_type,
)
from ..ops.scatter_rows import gather_rows
from .base import Encoding

# Hash factors (reference: common_device.h:782-795; primes from the
# Instant-NGP paper).
_PRIME_FACTORS = (
    1958374283,
    2654435761,
    805459861,
    3674653429,
    2097192037,
    1434869437,
    2165219737,
)
_COHERENT_PRIME_FACTORS = (1,) + _PRIME_FACTORS[1:]
_REVERSED_PRIME_FACTORS = tuple(reversed(_PRIME_FACTORS))
_BASE_CONVERT_FACTOR = 2531011

# Max grid resolution per n_dims that avoids uint32 overflow of the dense
# index (reference: common_device.h:855-870).
_MAX_BASES = [0x0, 0xFFFFFFFF, 0xFFFF, 0x659, 0xFF, 0x54, 0x28, 0x17, 0xF, 0xB, 0x9]


def grid_scale(level: int, log2_per_level_scale: float, base_resolution: int) -> float:
    """(reference: common_device.h:886-891)"""
    return 2.0 ** (level * log2_per_level_scale) * base_resolution - 1.0


def grid_resolution(scale: float) -> int:
    """(reference: common_device.h:893-895)"""
    return int(math.ceil(scale)) + 1


def _hash_factors(hash_type: HashType, n_dims: int):
    if hash_type == HashType.Prime:
        return _PRIME_FACTORS[:n_dims]
    if hash_type in (HashType.CoherentPrime, HashType.CoherentAdditive):
        return _COHERENT_PRIME_FACTORS[:n_dims]
    if hash_type == HashType.ReversedPrime:
        return _REVERSED_PRIME_FACTORS[:n_dims]
    raise NotImplementedError(f"hash type {hash_type} has no LCG factors")


def _grid_hash(pos_grid_u32: jnp.ndarray, hash_type: HashType) -> jnp.ndarray:
    """XOR/LCG spatial hash over the trailing dim (uint32, wrapping).

    pos_grid_u32: (..., D) uint32 -> (...) uint32.
    """
    d = pos_grid_u32.shape[-1]
    if hash_type == HashType.Rng:
        # step = XOR of coords packed into 64/d-bit fields, then a pcg32
        # jump-ahead by step (reference: common_device.h:814-827).
        from ..ops.pcg32_jump import pcg32_jump_output

        n_bits = 64 // d
        lo = jnp.zeros(pos_grid_u32.shape[:-1], jnp.uint32)
        hi = jnp.zeros(pos_grid_u32.shape[:-1], jnp.uint32)
        for i in range(d):
            v = pos_grid_u32[..., i]
            shift = i * n_bits
            if shift == 0:
                lo = lo ^ v
            elif shift < 32:
                lo = lo ^ (v << jnp.uint32(shift))
                hi = hi ^ (v >> jnp.uint32(32 - shift))
            else:
                hi = hi ^ (v << jnp.uint32(shift - 32))
        return pcg32_jump_output(hi, lo, seed=1337)
    if hash_type == HashType.BaseConvert:
        # k = ((p0)*F + p1)*F + ... (reference: common_device.h:803-812)
        k = jnp.zeros(pos_grid_u32.shape[:-1], jnp.uint32)
        for i in range(d):
            k = (k + pos_grid_u32[..., i]) * jnp.uint32(_BASE_CONVERT_FACTOR)
        return k
    factors = _hash_factors(hash_type, d)
    result = jnp.zeros(pos_grid_u32.shape[:-1], jnp.uint32)
    if hash_type == HashType.CoherentAdditive:
        for i in range(d):
            result = result + pos_grid_u32[..., i] * jnp.uint32(factors[i])
    else:
        for i in range(d):
            result = result ^ (pos_grid_u32[..., i] * jnp.uint32(factors[i]))
    return result


def _smoothstep(t):
    return t * t * (3.0 - 2.0 * t)


@jax.custom_vjp
def _stochastic_combine(feats, weights, corner_onehot):
    """Weighted corner reduction whose table-gradient goes to ONE sampled
    corner with weight 1 (reference: grid.h:284-299) while the
    interpolation-weight gradient (the dL/dx path) stays exact.

    feats: (B, C, F); weights, corner_onehot: (B, C).
    """
    return jnp.sum(feats * weights[..., None].astype(feats.dtype), axis=1)


def _stochastic_combine_fwd(feats, weights, corner_onehot):
    out = _stochastic_combine(feats, weights, corner_onehot)
    return out, (feats, corner_onehot)


def _stochastic_combine_bwd(res, g):
    feats, corner_onehot = res
    # Full gradient to the sampled corner only (weight 1.0).
    d_feats = (
        g[:, None, :] * corner_onehot[..., None].astype(g.dtype)
    ).astype(feats.dtype)
    # Exact weight gradients so input gradients stay the full dy_dx.
    d_weights = jnp.sum(g[:, None, :] * feats.astype(g.dtype), axis=-1)
    return d_feats, d_weights, jnp.zeros_like(corner_onehot)


_stochastic_combine.defvjp(_stochastic_combine_fwd, _stochastic_combine_bwd)


class GridEncoding(Encoding):
    """Hash/Dense/Tiled multiresolution grid (reference: encodings/grid.h)."""

    otype = "Grid"
    pad_value = 0.0  # grid pads with zeros (grid.h:757-767)

    def __init__(
        self,
        n_dims_to_encode: int,
        n_features: int = 32,
        log2_hashmap_size: int = 19,
        base_resolution: int = 16,
        per_level_scale: float = 2.0,
        stochastic_interpolation: bool = False,
        interpolation_type: InterpolationType = InterpolationType.Linear,
        grid_type: GridType = GridType.Hash,
        hash_type: HashType = HashType.CoherentPrime,
        n_features_per_level: int = 2,
        fixed_point_pos: bool = False,
    ):
        super().__init__(n_dims_to_encode)
        if n_dims_to_encode < 1 or n_dims_to_encode > 10:
            raise ValueError("GridEncoding supports 1..10 input dims")
        if n_features % n_features_per_level != 0:
            raise ValueError(
                f"GridEncoding: n_features={n_features} must be a multiple of "
                f"n_features_per_level={n_features_per_level}"
            )

        self.n_features = int(n_features)
        self.n_features_per_level = int(n_features_per_level)
        self.n_levels = self.n_features // self.n_features_per_level
        if self.n_levels > MAX_N_LEVELS:
            raise ValueError(
                f"GridEncoding: n_levels={self.n_levels} must be at most {MAX_N_LEVELS}"
            )
        self.log2_hashmap_size = int(log2_hashmap_size)
        self.base_resolution = int(base_resolution)
        self.per_level_scale = float(per_level_scale)
        self.stochastic_interpolation = bool(stochastic_interpolation)
        self.interpolation_type = interpolation_type
        self.grid_type = grid_type
        self.hash_type = hash_type
        # Positions given as uint32 fixed point spanning [0, 1)
        # (reference: grid.h:1143-1151, a JIT-codegen input mode there).
        self.fixed_point_pos = bool(fixed_point_pos)
        # TPU gather strategy: "per_level" (default; loop fusion), "quad"
        # (one row per cell; needs additive/dense indices), "fused"
        # (single materialized gather), or "stratified" (quad + gather-free
        # static path on coarse levels for raster-stratified batches).
        # Empirical on v5e — see PLAN.md.
        self.gather_strategy = "per_level"
        # Levels with scale <= raster_max_scale index with raster strides
        # (1, res, res^2, ...) — hashed levels then fold the raster index
        # mod table size ("raster-additive" hashing), which makes the dense
        # unfold a pure tile+reshape. Set (to strata-1) when the stratified
        # strategy is selected; part of the encoding function, so it must be
        # identical between training and inference configs.
        self.raster_max_scale: Optional[float] = None
        # Max per-dim window size (shift variants) the stratified fast path
        # will materialize; levels needing more fall back to the quad path.
        self.stratified_max_variants = 3
        # Variant accumulation of the static path: "select_n" (one
        # n_var^d-way lax.select_n — the round-4 auto) or "where" (the
        # original sequential where-chain; kept for A/B). Exact either
        # way (same f32 values selected).
        self.strat_accum = "auto"
        # Optional explicit XLA index mode for the quad gather (e.g.
        # "promise_in_bounds"); None = plain indexing (loop fusion).
        self.index_mode = None
        # Levels at or below this size use an MXU one-hot matmul for the
        # quad lookup (dense transpose-matmul backward instead of a serial
        # scatter). Measured neutral on v5e at 2048 — off by default.
        self.onehot_threshold = 0
        # Quad-table layout for emitter-scattered levels ("auto" |
        # "hybrid" | "packed" | "off"). The PACKED layout stores
        # K = 128/(2^d*F) cells per physical row so the table's minor dim
        # is exactly the TPU lane width — the unpacked (size, 2^d*F) form
        # pads every row to 128 lanes (8x for 16-wide rows) and its
        # backward's roll adjoints materialize (size, F)-narrow arrays in
        # a 64x-padded layout (measured 37 GB of traffic per flagship-3D
        # step vs ~3 GB packed; PLAN.md round 2). "auto" (default) =
        # "hybrid": unpacked-gather FORWARD (skips the packed form's
        # per-corner slot select, pure overhead) with the packed-layout
        # scatter TRANSPOSE — measured fastest on both directions
        # (probe_hybrid.py: 3D NeRF step 133.7 -> 121.5 ms over packed).
        # "packed" forces the symmetric packed gather+select. All three
        # are exact relayouts of the same linear map.
        self.quad_pack = "auto"
        # Quad-table build form: "view" (global (N, F) view slice),
        # "flat" (per-level 1D rolls; no narrow global view), "slice"
        # (1D level slice + ONE reshape, then 2D rolls — keeps view's
        # roll/concat fusions without the global padded view), or "cf"
        # (channel-first: F strided 1D feature-plane slices + 1D corner
        # rolls + stack — NO (rows, F)-minor array ever materializes, so
        # the 64x-lane-padded deinterleave disappears entirely; see
        # _quad_table_cf_from). "auto" = cf since round-4 session 3
        # (driver-command composed captures: 3D locked single 81.5 ->
        # 67.2 ms/step, 2D locked 24.4 -> 22.3); slice was the earlier
        # round-4 auto; flat measured a big composed NEGATIVE in both
        # dims.
        self.quad_build = "auto"
        # level_split (round 4): split the flat vector into per-level
        # compact arrays through ONE linear_call whose transpose is a
        # single concat, so per-level lookup adjoints never assemble
        # full (n_params,) buffers (see _split_levels). "auto" = on for
        # the per-level training branch; "off" restores the flat form
        # (the A/B stays one flag away, like quad_build). "barrier"
        # additionally wraps each level's slice in optimization_barrier:
        # without it XLA rewrites every reshape(slice_1d(p)) into
        # slice_2d(reshape(p)) and CSEs ONE global (n_params/F, F) view
        # in 64x-lane-padded layout — materialized in TWO layouts,
        # ~9.7 ms/step at 3D NeRF scale (_r4_3d_profile.txt:
        # reshape.175 + copy.2829). The barrier pins the slices 1D so
        # each level's reshape fuses into its own quad build.
        self.level_split = "auto"
        # Table-gradient reduction: "auto" picks the hierarchically
        # factored one-hot MXU scatter (ops/scatter_rows.py) for large
        # batches on per-level tables, XLA's scatter emitter otherwise;
        # "xla" / "factored" force one. Factored accumulates in bfloat16
        # (the reference accumulates grid grads in half, grid.h:660-671)
        # and measures ~2.4 ms/level faster at flagship shapes (PLAN.md).
        self.scatter_strategy = "auto"
        # Auto gate: factored needs a batch big enough to amortize the
        # masked-strip materialization and a per-level (not global) table.
        self.factored_min_rows = 65536
        self.factored_max_size = 65536
        # Phase-locked stratified mode (PLAN.md round 3): the sampler
        # shares G jitter vectors across the batch, tile j using phase
        # j % G (utils/sampling.stratified_uniform(phase_locked=G)),
        # which makes every fine hashed level's cell indices a
        # COMPILE-TIME constant plus one dynamic scalar table shift per
        # phase. Fine-level scales are snapped to strata multiples
        # (_apply_phase_lock), and the table-gradient scatter becomes a
        # static reorder-gather plus bucketed one-hot MXU matmuls
        # (ops.scatter_packed_static_csr) instead of the per-row scatter
        # emitter — measured ~2.1x faster at 3D NeRF scale. Enabled via
        # the "phase_locked" config knob (requires gather_strategy
        # "stratified"); "locked_phases" sets G (more phases = more
        # jitter diversity per step at slightly more transpose overhead;
        # G=1 measured ~3 dB below the image-fit golden band).
        self.phase_locked = False
        self.strata: Optional[int] = None
        self.locked_phases = 1
        # Max relative scale move a level may take to join the locked
        # set (see _apply_phase_lock); 1.0 = snap everything snappable.
        self.locked_snap_tol = 1.0
        # Locked-level FORWARD form: "unpacked" (plain quad gather) or
        # "packed" (compact (B, 128) packed-row gather + K x K constant
        # one-hot slot select; "csr" = bucket one-hot MXU matmuls on
        # the backward's static-CSR structure, no gather emitter at
        # all (table pair-rounded to bf16, ~3e-6 rel) — see
        # _quad_lookup_locked's p_fn).
        self.locked_fwd = "unpacked"
        # Gradient-contribution rounding on the phase-locked scatter:
        # "pair" (compensated bf16, ~3e-6 rel — default) | "single" |
        # "sr" | "f32".
        self.locked_rounding = "pair"
        self._csr_cache: dict = {}
        self._locked_base_cache: dict = {}
        # Storage dtype of the lookup tables on the RANDOM-ACCESS forward
        # paths (quad/hybrid/per-level vertex gathers): "float32" (default)
        # | "float16" (the reference's fp16 param regime, grid.h params_type
        # — 10 mantissa bits) | "bfloat16". Halves the materialized
        # quad-table bytes and gather traffic; interpolation stays f32
        # (better than the reference, whose lerp is half too). Master
        # params and gradients remain fp32 — only the forward table copy is
        # rounded. The stratified/raster STATIC paths keep f32 (their MXU
        # selects rely on exact operands).
        self.table_dtype = "float32"

        d = self.n_dims_to_encode
        log2_scale = math.log2(self.per_level_scale)
        max_params = 2**31

        # Per-level offset table (reference: grid.h:695-737).
        offsets: List[int] = []
        resolutions: List[int] = []
        scales: List[float] = []
        offset = 0
        for lvl in range(self.n_levels):
            scale = grid_scale(lvl, log2_scale, self.base_resolution)
            resolution = grid_resolution(scale)
            params_in_level = (
                max_params
                if float(resolution) ** d > max_params
                else resolution**d
            )
            params_in_level = next_multiple(params_in_level, 8)
            if grid_type == GridType.Dense:
                pass
            elif grid_type == GridType.Tiled:
                params_in_level = min(
                    params_in_level, self.base_resolution**d
                )
            elif grid_type == GridType.Hash:
                params_in_level = min(
                    params_in_level, 1 << self.log2_hashmap_size
                )
            else:
                raise ValueError(f"invalid grid type {grid_type}")
            offsets.append(offset)
            resolutions.append(resolution)
            scales.append(scale)
            offset += params_in_level
        offsets.append(offset)

        if offset > 2**31 - 1:
            # XLA gathers index with int32; a table beyond int32 rows cannot
            # be addressed on TPU (the reference's uint32 offsets silently
            # wrap past 2^32, grid.h:695-737 — an error is strictly better).
            raise ValueError(
                f"GridEncoding: total table rows {offset} exceed int32 "
                "indexing range; reduce n_levels/resolution or use Hash "
                "type with a log2_hashmap_size cap"
            )
        self.offset_table = np.asarray(offsets, np.int64)
        self.resolutions = np.asarray(resolutions, np.int64)
        self.scales = np.asarray(scales, np.float64)
        self._n_params = int(offset) * self.n_features_per_level
        self.n_output_dims = self.n_features

        # Per-level: does the dense index fit, or do we hash?
        # (reference: common_device.h:847-884)
        self._use_hash: List[bool] = []
        for lvl in range(self.n_levels):
            res = int(self.resolutions[lvl])
            level_size = int(self.offset_table[lvl + 1] - self.offset_table[lvl])
            if res <= _MAX_BASES[d]:
                stride = res**d
            else:
                stride = 0xFFFFFFFF
            self._use_hash.append(
                grid_type == GridType.Hash and level_size < stride
            )

        # Corner enumeration for d-linear interpolation: (2^d, d) bits.
        self._corners = np.asarray(
            [[(c >> dim) & 1 for dim in range(d)] for c in range(2**d)],
            np.int64,
        )

        # Per-level static per-dim index strides for the quad-row gather
        # (PLAN.md): available when corner indices are affine in the corner
        # bits — dense/tiled raster indexing, or the additive hash. None
        # where unsupported (XOR hashes).
        self._corner_strides: List[Optional[List[int]]] = []
        for lvl in range(self.n_levels):
            res = int(self.resolutions[lvl])
            if not self._use_hash[lvl]:
                self._corner_strides.append([res**k for k in range(d)])
            elif hash_type == HashType.CoherentAdditive:
                self._corner_strides.append(
                    [int(f) for f in _hash_factors(hash_type, d)]
                )
            else:
                self._corner_strides.append(None)

    # -- parameters ----------------------------------------------------------
    @property
    def n_params(self) -> int:
        return self._n_params

    def initialize_params(self, rng, scale: float = 1.0) -> np.ndarray:
        """U(-1e-4, 1e-4), like the reference (grid.h:1076-1079)."""
        return (rng.next_float(self._n_params) * 2e-4 - 1e-4).astype(np.float32) * scale

    def layer_sizes(self):
        # Grid params are non-matrix params for the optimizer
        # (reference: grid.h:1101-1105).
        return []

    def _scatter_mode(self, n_rows: int, size: int) -> str:
        if self.scatter_strategy in (
            "xla", "xla_pib", "xla_half", "xla_half_sr", "factored",
            "factored_f32", "factored_sr", "factored_kernel",
            "factored_kernel_sr", "factored_fused", "drop",
            "xla_f32_b", "xla_half_b", "xla_half_ob", "xla_half_bb",
        ):
            return self.scatter_strategy
        if n_rows >= self.factored_min_rows:
            if size <= self.factored_max_size:
                return "factored"
            if self.n_features_per_level >= 2:
                # Large tables are past the factored-matmul crossover; the
                # bf16 scatter emitter runs ~5x faster than f32 (22 vs
                # 94-137 ns/row on v5e) and half-precision accumulation is
                # the reference's own grad_t regime for F>=2
                # (grid.h:660-671). F==1 grids keep exact f32, like the
                # reference's fp32 fallback.
                return "xla_half"
        return "xla"

    def _apply_phase_lock(self, strata: int) -> None:
        """Enable phase-locked mode: snap fine hashed levels' scales to
        multiples of ``strata`` so the tile->cell map of a phase-locked
        stratified batch is integral per tile (cell = tile * q + E with a
        shared scalar E) — the enabler for compile-time-static fine-level
        indices. Only power-of-two-size hashed levels above the coarse
        static path snap (mod-2^32 index folding must distribute over the
        table-size mod), and only when snapping preserves the level's
        param count (checkpoint layout) and hashed classification —
        AND only when the relative scale move is within
        ``locked_snap_tol`` (the first snappable level can move a lot:
        the 2D flagship's level 11 moves 1384 -> 1536 = +11%; levels a
        tolerance excludes keep exact reference scales and stay on the
        factored/hybrid scatter paths). A documented deviation from the
        reference's exact per_level_scale geometry, opt-in via the
        "phase_locked" knob.
        """
        self.phase_locked = True
        self.strata = int(strata)
        d = self.n_dims_to_encode
        tol = float(getattr(self, "locked_snap_tol", 1.0))
        for lvl in range(self.n_levels):
            scale = float(self.scales[lvl])
            if (
                self.raster_max_scale is not None
                and scale <= self.raster_max_scale
            ):
                continue  # coarse static levels keep exact reference scales
            if not self._use_hash[lvl]:
                continue
            size = int(self.offset_table[lvl + 1] - self.offset_table[lvl])
            if size & (size - 1):
                continue
            snapped = max(int(round(scale / strata)), 1) * int(strata)
            if abs(snapped - scale) / scale > tol:
                continue  # keep the exact reference scale; level unlocked
            res = snapped + 1  # integer scale: ceil(scale) + 1
            if res**d <= size:
                continue  # would flip to dense indexing / shrink the level
            self.scales[lvl] = float(snapped)
            self.resolutions[lvl] = res

    def _locked_levels(self, strat_strata: int) -> set:
        """Levels eligible for the phase-locked static-index path given a
        stratified batch with ``strat_strata`` tiles per dim."""
        if (
            not self.phase_locked
            or self.strata != strat_strata
            or self.gather_strategy != "stratified"
            or self.interpolation_type != InterpolationType.Linear
            or self.fixed_point_pos
            or self.quad_pack == "off"
        ):
            return set()
        K = self._pack_k()
        if K < 2:
            return set()
        out = set()
        for lvl in range(self.n_levels):
            scale = float(self.scales[lvl])
            size = int(self.offset_table[lvl + 1] - self.offset_table[lvl])
            if (
                scale > (self.raster_max_scale or 0.0)
                and self._use_hash[lvl]
                and size & (size - 1) == 0
                and size % K == 0
                and scale == int(scale)
                and int(scale) % strat_strata == 0
                and self._level_strides(lvl) is not None
            ):
                out.add(lvl)
        return out

    def _locked_csr(
        self,
        lvl: int,
        base_np: np.ndarray,
        size: int,
        K: int,
        n_phases: int = 1,
        phase: int = 0,
    ):
        """Cached static-CSR structure over one phase's packed-row targets
        (phase g owns rows ``g::n_phases`` of the batch)."""
        key = (lvl, len(base_np), n_phases, phase)
        hit = self._csr_cache.get(key)
        if hit is None:
            from ..ops.scatter_rows import build_static_csr

            sub = base_np[phase::n_phases]
            prow = sub.astype(np.int64) // K
            order, lo, nb, M = build_static_csr(prow, size // K, 128)
            slot = (sub.astype(np.int64) % K).astype(np.int32)
            ss = np.full(order.shape, -1, np.int32)
            mask = order < len(sub)
            ss[mask] = slot[order[mask]]
            # Inverse permutation for the CSR *forward* (locked_fwd
            # "csr"): sub-batch row j's position in the bucket-sorted
            # (nb * M) layout.
            inv = np.empty(len(sub), np.int32)
            inv[order[mask]] = np.nonzero(mask)[0].astype(np.int32)
            hit = (order, lo, ss.reshape(nb, M), nb, M, inv)
            self._csr_cache[key] = hit
        return hit

    def _level_strides(self, lvl: int) -> Optional[List[int]]:
        """Per-dim affine index strides for level ``lvl``'s corner layout.

        Raster strides (1, res, res^2, ...) when the level is below
        ``raster_max_scale`` (the stratified fast path's hashing), else the
        constructor-derived strides (dense raster or additive hash factors).
        """
        if (
            self.raster_max_scale is not None
            and float(self.scales[lvl]) <= self.raster_max_scale
        ):
            res = int(self.resolutions[lvl])
            return [res**k for k in range(self.n_dims_to_encode)]
        return self._corner_strides[lvl]

    def _forward_dtype(self):
        """Storage dtype for FORWARD lookups (None = f32 tables).

        Applied only inside hand-written linear pairs (gather_rows'
        ``forward_dtype``, the hybrid p_fn) so gradient accumulation
        never runs in the half dtype — casting tables at call sites ties
        autodiff's scatter-add transpose to fp16/bf16 accumulation, which
        overflows under loss-scaled gradients (found 2026-08-17)."""
        if self.table_dtype == "float16":
            return jnp.float16
        if self.table_dtype == "bfloat16":
            return jnp.bfloat16
        return None

    def _quad_table(self, params, lvl: int, strides: Optional[List[int]] = None):
        """Per-level (size, 2^d * F) cell table: row i holds the features of
        all 2^d corners of the cell whose base-vertex index is i. Built with
        static rolls of the vertex table (their VJP turns the backward into
        one scatter row per cell plus cheap roll adjoints).

        ``params`` is the FLAT (n_params,) vector. Two equivalent builds
        (knob ``quad_build``; rolls of (size, F) rows == rolls of the flat
        slice by delta*F, row-major):

        - "view": slice the global ``params.reshape(-1, F)`` view. In 3D
          at NeRF scale that (6.5M, 2)-narrow view materializes 64x
          lane-PADDED and its forward+adjoint layout traffic measured
          ~24 ms/step (reshape.39 9.8 + pad_add 5.1 + reshape.401 4.5 +
          copy 4.4 — probe_3d_profile2/probe_3d_hlo_names).
        - "flat": per-corner 1D rolls of the level's flat slice, reshaped
          (size, F) locally — no global narrow view anywhere. Composed
          NEGATIVE in BOTH dims (another instance of the layout
          non-monotonicity rule: the padded bytes visible in the HLO are
          not additive with the fusions XLA otherwise builds): 2D
          flagship 27.49 vs 26.48 ms (round-2 session 3 #2), 3D
          NeRF-scale locked single 151.9 vs 87.7 ms (!) — the per-level
          1D->2D reshapes break the roll/concat fusions (probe_3d_final
          round 3, flat A/B).

        - "slice": 1D level slice + ONE reshape, then the same 2D rolls
          as "view". Keeps view's roll/concat fusions WITHOUT the global
          padded view — the early-round-4 winner: 2D locked 30.1 -> 25.4
          ms/step, 3D locked single 169.3 -> 130.5 (bench captures,
          benchmarks/logs/_r4_bench_*); neutral on the stratified-only
          path (27.83 vs 27.84). XLA still CSEs the per-level
          reshape(slice_1d) pattern into ONE global (N, F) view
          materialized in two layouts — 9.7 ms/step at 3D NeRF scale
          (_r4_3d_profile.txt: reshape.175 + copy.2829).
        - "cf": channel-first build (_quad_table_cf_from) — no
          (rows, F)-minor array exists at any point, so the padded
          deinterleave vanishes. Round-4 session-3 winner: 3D locked
          single 81.5 -> 67.2 ms/step, 2D locked 24.4 -> 22.3
          (driver-command bench captures, benchmarks/logs/_r4q6_*).

        "auto" = cf since round-4 session 3 ("view"/"flat"/"slice" kept
        as knobs so the A/B stays one flag away on future XLA bumps).
        """
        size = int(self.offset_table[lvl + 1] - self.offset_table[lvl])
        off = int(self.offset_table[lvl])
        F = self.n_features_per_level
        if strides is None:
            strides = self._level_strides(lvl)
        build = getattr(self, "quad_build", "auto")
        if build == "auto":
            build = "cf"
        deltas = []
        for cbits in self._corners:
            delta = 0
            for dim, bit in enumerate(cbits):
                delta += int(bit) * strides[dim]
            deltas.append(delta % size)
        if isinstance(params, (tuple, list)):
            # level_split mode (round 4): ``params`` is the per-level
            # tuple from ``_split_levels`` — this level's own compact
            # (size*F,) array. Same 2D roll/concat build as "slice"; the
            # difference is the ADJOINT: the cotangent stays (size*F,)
            # and rides the split's one-concat transpose instead of a
            # zeros((n_params,)) + dynamic_update_slice per level.
            return self._quad_table_from(params[lvl], lvl, deltas)
        if build == "cf":
            fl = params.reshape(-1)
            return self._quad_table_cf_from(
                fl[F * off : F * (off + size)], deltas
            )
        if build == "flat":
            fl = params[F * off : F * (off + size)]
            cols = [
                (jnp.roll(fl, -d * F) if d else fl).reshape(size, F)
                for d in deltas
            ]
        elif build == "slice":
            # Round-4 form: slice the FLAT vector (1D, compact layout),
            # reshape ONCE per level, then the same 2D roll/concat build
            # as "view". Identical elements; the difference is that no
            # global params.reshape(-1, F) view exists for XLA to
            # materialize 64x-lane-padded at the step boundary (the
            # ~24 ms/step of reshape.39/copy.1795/pad_add/reshape.401
            # traffic in the 3D locked profile, PLAN.md 3c), and each
            # level's adjoint accumulates through its own 1D slice.
            # Unlike "flat" (measured negative), the rolls stay 2D so the
            # roll->concat fusions XLA builds around "view" are preserved.
            # reshape(-1) first: callers pass either the flat vector or an
            # already-(N, F) table (row-major — same flat layout either way;
            # a no-op reshape when 1D).
            fl = params.reshape(-1)
            sl = fl[F * off : F * (off + size)].reshape(size, F)
            cols = [
                jnp.roll(sl, -d, axis=0) if d else sl for d in deltas
            ]
        else:
            sl = params.reshape(-1, F)[off : off + size]
            cols = [
                jnp.roll(sl, -d, axis=0) if d else sl for d in deltas
            ]
        return jnp.concatenate(cols, axis=1)

    def _quad_table_from(self, level_arr, lvl: int, deltas=None):
        """(size, 2^d*F) quad table built from the level's OWN compact
        parameter array ((size*F,) or (size, F)) — the level_split form
        of ``_quad_table`` (same rolls; compact adjoint). Routes through
        the channel-first build when ``quad_build`` is "cf"."""
        size = int(self.offset_table[lvl + 1] - self.offset_table[lvl])
        F = self.n_features_per_level
        if deltas is None:
            strides = self._level_strides(lvl)
            deltas = []
            for cbits in self._corners:
                delta = 0
                for dim, bit in enumerate(cbits):
                    delta += int(bit) * strides[dim]
                deltas.append(delta % size)
        if getattr(self, "quad_build", "auto") in ("cf", "auto"):
            return self._quad_table_cf_from(level_arr.reshape(-1), deltas)
        sl = level_arr.reshape(size, F)
        cols = [jnp.roll(sl, -d, axis=0) if d else sl for d in deltas]
        return jnp.concatenate(cols, axis=1)

    def _quad_table_cf_from(self, flat, deltas):
        """(size, 2^d*F) quad table from the level's flat (size*F,) array
        via never-lane-padded ops (``quad_build: "cf"``, round 4): F
        strided 1D feature-plane slices (the deinterleave), a 1D roll per
        corner, ``stack`` to (2^d*F, size) — whose minor dim is the
        128-multiple ``size``, so every intermediate stays layout-compact
        — then a transpose XLA emits as a pure layout flip ((size, C*F)
        in {0,1} IS the stack's memory). Identical elements to the
        "slice" build (bit-parity tested); the point is that no
        (rows, F)-minor array ever materializes, killing the global
        double-layout (n_params/F, F) view that cost 9.7 ms/step at 3D
        NeRF scale (_r4_3d_profile.txt: reshape.175 + copy.2829;
        probe_r4_cf_build: build-only 10.7 -> 2.1 ms, 12-level composed
        stand-in 28.7 -> 20.7). Reference semantics unchanged: this is
        still grid.h:214-320's corner-offset table walk, re-laid-out."""
        F = self.n_features_per_level
        n = flat.shape[0]
        planes = [jax.lax.slice(flat, (f,), (n,), (F,)) for f in range(F)]
        rows = []
        for d in deltas:
            for f in range(F):
                p = planes[f]
                rows.append(jnp.roll(p, -d) if d else p)
        return jnp.stack(rows, axis=0).T

    def _split_levels(self, params):
        """Split the flat parameter vector into the per-level tuple of
        compact (size*F,) arrays via ONE ``linear_call`` whose transpose
        is a single concatenation (``level_split`` mode, round 4).

        Why: each per-level lookup's adjoint otherwise ends in
        ``zeros((n_params,)) + dynamic_update_slice`` — at 3D NeRF scale
        that is 10+ full 42 MB gradient buffers built and summed per step
        (the pad_add/reshape layout tax in PLAN.md 3c's profile). The
        levels partition the vector contiguously (offset table is
        cumulative), so the exact transpose of the split IS
        ``concatenate`` — gradients are bit-identical, only the assembly
        changes. Returns None (caller keeps the flat form) when the
        levels do not exactly tile the vector.

        NOTE a split output must be CONSUMED by the traced computation
        for higher-order autodiff (an unused output's symbolic-Zero
        cotangent crashes linear_call's jvp-of-transpose path); apply()
        only splits on the per-level branch, where every level's lookup
        reads its array.
        """
        from jax.custom_derivatives import linear_call

        F = self.n_features_per_level
        L = self.n_levels
        starts = [F * int(self.offset_table[lvl]) for lvl in range(L)]
        sizes_f = [
            F * int(self.offset_table[lvl + 1] - self.offset_table[lvl])
            for lvl in range(L)
        ]
        fl = params.reshape(-1)
        if starts[0] != 0 or sum(sizes_f) != fl.shape[0]:
            return None  # non-contiguous layout: keep the flat form

        barrier = getattr(self, "level_split", "auto") == "barrier"

        def p_fn(_, p):
            sls = tuple(
                jax.lax.slice(p, (starts[lvl],), (starts[lvl] + sizes_f[lvl],))
                for lvl in range(L)
            )
            # "barrier": keep the slices 1D — see the level_split comment
            # in __init__ (kills the global padded (N, F) view rewrite).
            return jax.lax.optimization_barrier(sls) if barrier else sls

        def t_fn(_, cts):
            return jnp.concatenate([c.reshape(-1) for c in cts])

        try:
            return linear_call(p_fn, t_fn, (), fl)
        except NotImplementedError:  # vmap: no linear_call batching rule
            return p_fn((), fl)

    def split_params(self, params):
        """Flat (n_params,) -> tuple of per-level compact ``(size_l*F,)``
        arrays (the ``level_params`` form of :meth:`apply`). Plain
        slicing — use at state-construction/checkpoint boundaries, not
        inside the step (that's what the structured state avoids)."""
        F = self.n_features_per_level
        off = self.offset_table
        return tuple(
            params[F * int(off[l]) : F * int(off[l + 1])]
            for l in range(self.n_levels)
        )

    def join_params(self, level_arrays):
        """Inverse of :meth:`split_params` (checkpoint/API boundary)."""
        return jnp.concatenate([a.reshape(-1) for a in level_arrays])

    def _pack_k(self) -> int:
        """Cells per packed row: 128 / (2^d * F), or 0 when not packable."""
        slot = (2 ** self.n_dims_to_encode) * self.n_features_per_level
        if slot > 128 or 128 % slot:
            return 0
        return 128 // slot

    def _quad_table_packed(self, params, lvl: int):
        """Corner-major lane-packed quad table: (size/K, 128), where lanes
        [c*K*F : (c+1)*K*F) of row i hold K consecutive cells' F features
        for corner c — ``Q[i, c*K*F + k*F + f] = sl[K*i + k + delta_c, f]``.

        Built as a lane-concat of reshaped FLAT rolls of the level's
        parameter slice: every intermediate is 1D or has a 128-multiple
        minor dim, so all layouts are compact (the whole point; see the
        ``quad_pack`` comment in __init__). The gather then fetches row
        ``idx // K`` and selects cell ``idx % K`` per corner block.
        """
        F = self.n_features_per_level
        size = int(self.offset_table[lvl + 1] - self.offset_table[lvl])
        off = int(self.offset_table[lvl])
        if isinstance(params, (tuple, list)):  # level_split mode
            flat = params[lvl].reshape(-1)
        else:
            flat = params[F * off : F * (off + size)]
        return self._quad_table_packed_from(flat, lvl)

    def _quad_table_packed_from(self, flat, lvl: int):
        """Packed quad table from the level's OWN flat (size*F,) array
        (the level_split form of ``_quad_table_packed``)."""
        F = self.n_features_per_level
        K = self._pack_k()
        size = int(self.offset_table[lvl + 1] - self.offset_table[lvl])
        strides = self._level_strides(lvl)
        rolls = []
        for cbits in self._corners:
            delta = 0
            for dim, bit in enumerate(cbits):
                delta += int(bit) * strides[dim]
            delta = (delta % size) * F
            r = jnp.roll(flat, -delta) if delta else flat
            rolls.append(r.reshape(size // K, K * F))
        return jnp.concatenate(rolls, axis=1)  # (size/K, 128)

    def _quad_lookup_hybrid(self, params, idx, lvl: int, mode: str):
        """Quad-cell lookup with an UNPACKED-gather forward and a
        PACKED-scatter transpose (``quad_pack="hybrid"``).

        The two measured facts this combines (PLAN.md round 2, v5e,
        S=2^19 fine level, B=2^18):
        - forward: the unpacked ``quad[idx]`` gather runs 3.0 ms vs
          4.5 ms for the packed gather + slot select (the (B,128) row
          fetch is the same per-row emitter cost; the 8-way one-hot
          select is pure overhead);
        - backward: the packed-layout scatter runs ~4.8 ms vs ~15 ms
          unpacked (the (size, 2^d*F)-narrow scatter output and the
          (size, F) roll adjoints lane-pad 8-64x).

        The lookup is linear in ``params``, so ``linear_call`` gives the
        forward to one direction and the hand-written packed transpose to
        the other, composable at any differentiation order (same
        construction as ``ops.gather_rows``). Exact: both directions are
        transposes of the same linear map; only layouts differ.
        """
        from jax.custom_derivatives import linear_call

        from ..ops.scatter_rows import _stochastic_round_bf16

        F = self.n_features_per_level
        K = self._pack_k()
        C = 2 ** self.n_dims_to_encode
        size = int(self.offset_table[lvl + 1] - self.offset_table[lvl])
        off = int(self.offset_table[lvl])
        strides = self._level_strides(lvl)
        deltas = []
        for cbits in self._corners:
            delta = 0
            for dim, bit in enumerate(cbits):
                delta += int(bit) * strides[dim]
            deltas.append(delta % size)
        # level_split mode: the linear arg is the level's OWN compact
        # array and the transpose returns its (size*F,) cotangent
        # directly — no zeros((n_params,)) + dynamic_update_slice (the
        # per-level flat-grad assembly the split exists to remove).
        level_mode = isinstance(params, (tuple, list))
        lin_arg = params[lvl] if level_mode else params
        n_params = None if level_mode else params.shape[0]
        batch = idx.shape[0]

        def p_fn(i, p):
            quad = (
                self._quad_table_from(p, lvl, deltas)
                if level_mode
                else self._quad_table(p, lvl)
            )
            fd = self._forward_dtype()
            if fd is not None:
                # Storage rounding inside the linear pair: half-width
                # gather traffic; t_fn (the transpose) never sees it.
                return quad.astype(fd).at[i].get(
                    mode="promise_in_bounds"
                ).astype(quad.dtype)
            return quad.at[i].get(mode="promise_in_bounds")

        def t_fn(i, dfeats):
            # Lane placement into the packed layout (see
            # _quad_table_packed): cell idx = K*row + slot; corner c's F
            # features land at lanes [c*K*F + slot*F, +F).
            slot = i % K
            row = i // K
            oh = (
                jnp.arange(K, dtype=jnp.int32)[None, :] == slot[:, None]
            )
            g = dfeats.reshape(batch, C, 1, F) * oh[
                :, None, :, None
            ].astype(dfeats.dtype)
            g128 = g.reshape(batch, C * K * F)
            if mode.startswith("xla_half"):
                rows128 = (
                    _stochastic_round_bf16(g128.astype(jnp.float32))
                    if mode == "xla_half_sr"
                    else g128.astype(jnp.bfloat16)
                )
                acc_dtype = jnp.bfloat16
            else:
                rows128 = g128.astype(jnp.float32)
                acc_dtype = jnp.float32
            dpacked = (
                jnp.zeros((size // K, C * K * F), acc_dtype)
                .at[row]
                .add(rows128, mode="promise_in_bounds")
                .astype(jnp.float32)
            )
            # Adjoint of the packed build's flat rolls.
            dflat = jnp.zeros((size * F,), jnp.float32)
            for c, delta in enumerate(deltas):
                blk = dpacked[:, c * K * F : (c + 1) * K * F].reshape(-1)
                dflat = dflat + (
                    jnp.roll(blk, delta * F) if delta else blk
                )
            if level_mode:
                return dflat.reshape(lin_arg.shape)
            out = jnp.zeros((n_params,), jnp.float32)
            return jax.lax.dynamic_update_slice(out, dflat, (F * off,))

        try:
            return linear_call(p_fn, t_fn, idx, lin_arg)
        except NotImplementedError:  # vmap: no linear_call batching rule
            return p_fn(idx, lin_arg)

    def _quad_lookup_locked(self, params, idx, lvl: int, base_np, d_shift):
        """Quad-cell lookup for a PHASE-LOCKED level: unpacked-gather
        forward (identical to the hybrid path) with a STATIC-CSR packed
        transpose.

        The level's cell indices are ``(base_np + d_shift) % size`` with
        ``base_np`` a compile-time constant and ``d_shift`` one traced
        scalar (see the phase-locked branch in ``apply``), so the
        table-gradient scatter-add becomes a static reorder-gather plus
        bucketed one-hot MXU matmuls (``ops.scatter_packed_static_csr``),
        and the dynamic shift rides ONE flat roll — rolls are
        shift-additive, so it hoists out of the per-corner adjoint sum.
        Measured ~2.1x the bf16 scatter emitter at the 3D NeRF-scale
        level shape (benchmarks/probe_r3_static.py). Exact linear
        transpose of the forward (linear_call, any differentiation
        order), like _quad_lookup_hybrid.
        """
        from jax.custom_derivatives import linear_call

        from ..ops.scatter_rows import scatter_packed_static_csr

        F = self.n_features_per_level
        K = self._pack_k()
        C = 2 ** self.n_dims_to_encode
        size = int(self.offset_table[lvl + 1] - self.offset_table[lvl])
        off = int(self.offset_table[lvl])
        strides = self._level_strides(lvl)
        deltas = []
        for cbits in self._corners:
            delta = 0
            for dim, bit in enumerate(cbits):
                delta += int(bit) * strides[dim]
            deltas.append(delta % size)
        # level_split mode (see _quad_lookup_hybrid): linear arg = the
        # level's own compact array; transpose returns (size*F,).
        level_mode = isinstance(params, (tuple, list))
        lin_arg = params[lvl] if level_mode else params
        n_params = None if level_mode else params.shape[0]
        batch = idx.shape[0]
        G = int(self.locked_phases)
        csrs = [
            self._locked_csr(lvl, base_np, size, K, G, g) for g in range(G)
        ]
        rounding = self.locked_rounding

        fwd_mode = getattr(self, "locked_fwd", "unpacked")

        def p_fn(res, p):
            i, dsh = res
            fd = self._forward_dtype()
            if fwd_mode == "csr":
                # Static-CSR forward (PLAN.md round 3): the gather
                # emitter charges its per-row rate even on compile-time-
                # constant indices, so route the lookup around it — the
                # same bucket structure as the backward transpose, run
                # forward: per 128-packed-row bucket, one-hot MXU matmul
                # selects the needed rows in bucket-sorted order, the
                # STATIC slot/corner select narrows to (nb*M, C*F), and
                # one static take un-permutes to batch order. The packed
                # table is pre-rounded to an error-compensated bf16 pair
                # (two native-MXU passes, ~3e-6 rel on features — same
                # compensation as the "pair" scatter; the reference
                # stores forward tables in half outright, grid.h:660-671).
                # The dynamic per-phase shift rides a 1D roll of the
                # level's FLAT slice before the packed build (exact:
                # cell (b + s) of the unrolled table == cell b of the
                # rolled one).
                off_f = F * off
                size_f = F * size
                flat = (
                    p.reshape(-1)
                    if level_mode
                    else jax.lax.dynamic_slice(p, (off_f,), (size_f,))
                )
                if fd is not None:
                    # Honor table_dtype: round storage to the half dtype
                    # FIRST so the CSR forward sees the same rounding
                    # regime as the unpacked/packed gathers (the bf16
                    # compensation pair below then reproduces that
                    # rounded value to ~3e-6). Barrier: TPU XLA elides
                    # bare half round-trips (precision postmortem).
                    flat = jax.lax.optimization_barrier(
                        flat.astype(fd)
                    ).astype(jnp.float32)
                flat2 = jnp.concatenate([flat, flat])
                W = 128
                outs = []
                for g in range(G):
                    order, lo, slot_sorted, nb, M, inv = csrs[g]
                    sh = (dsh[g].astype(jnp.int32)) * F
                    rolled = jax.lax.dynamic_slice(flat2, (sh,), (size_f,))
                    rolls = []
                    for delta in deltas:
                        rr = jnp.roll(rolled, -delta * F) if delta else rolled
                        rolls.append(rr.reshape(size // K, K * F))
                    qp = jnp.concatenate(rolls, axis=1)  # (size/K, 128)
                    if nb * W > size // K:
                        qp = jnp.pad(qp, ((0, nb * W - size // K), (0, 0)))
                    hi = jax.lax.optimization_barrier(
                        qp.astype(jnp.bfloat16)
                    )
                    resid = (
                        (qp - hi.astype(jnp.float32)) * 256.0
                    ).astype(jnp.bfloat16)
                    oh = (
                        jnp.asarray(lo)[:, :, None]
                        == jnp.arange(W, dtype=jnp.int32)[None, None, :]
                    )
                    ohk = (
                        jnp.asarray(slot_sorted)[:, :, None]
                        == jnp.arange(K, dtype=jnp.int32)[None, None, :]
                    ).astype(jnp.float32)

                    def core(tab, oh=oh, ohk=ohk, nb=nb, M=M):
                        rows = jnp.einsum(
                            "bmw,bwp->bmp",
                            oh.astype(tab.dtype),
                            tab.reshape(nb, W, C * K * F),
                            preferred_element_type=jnp.float32,
                        )
                        return (
                            rows.reshape(nb, M, C, K, F)
                            * ohk[:, :, None, :, None]
                        ).sum(3)  # (nb, M, C, F)

                    sel = core(hi) + (1.0 / 256.0) * core(resid)
                    outs.append(
                        jnp.take(
                            sel.reshape(-1, C * F),
                            jnp.asarray(inv),
                            axis=0,
                        )
                    )
                # Interleave phases back to batch order (sample j =
                # phase j % G at within-phase position j // G).
                return jnp.stack(outs, axis=1).reshape(batch, C * F)
            if fwd_mode == "packed":
                # Packed-row forward: the (B, 128) gather output is
                # layout-COMPACT (the unpacked (B, C*F)-narrow output
                # lane-pads 8-16x and pays a conversion copy), and the
                # slot select's one-hot comes from a K x K constant
                # table (locked indices make slot = static base % K plus
                # a per-phase scalar — no per-sample compare chain).
                qp = (
                    self._quad_table_packed_from(p.reshape(-1), lvl)
                    if level_mode
                    else self._quad_table_packed(p, lvl)
                )
                if fd is not None:
                    qp = qp.astype(fd)
                g = qp.at[i // K].get(mode="promise_in_bounds")
                oh = jnp.eye(K, dtype=g.dtype)[i % K]  # (B, K)
                rows = (
                    g.reshape(batch, C, K, F) * oh[:, None, :, None]
                ).sum(2)
                return rows.reshape(batch, C * F).astype(jnp.float32)
            quad = (
                self._quad_table_from(p, lvl, deltas)
                if level_mode
                else self._quad_table(p, lvl)
            )
            if fd is not None:
                return quad.astype(fd).at[i].get(
                    mode="promise_in_bounds"
                ).astype(quad.dtype)
            return quad.at[i].get(mode="promise_in_bounds")

        def t_fn(res, dfeats):
            i, dsh = res
            if rounding == "emitter":
                # Diagnostic mode (benchmarks/probe_3d_locked2.py): the
                # hybrid path's slot-spread + bf16 emitter scatter on the
                # TRACED indices, inside otherwise-identical locked
                # plumbing — isolates the CSR transpose's composed cost
                # from the rest of the locked path. Not a config value.
                slot = i % K
                row = i // K
                oh = (
                    jnp.arange(K, dtype=jnp.int32)[None, :] == slot[:, None]
                )
                g = dfeats.reshape(batch, C, 1, F) * oh[
                    :, None, :, None
                ].astype(dfeats.dtype)
                dpacked = (
                    jnp.zeros((size // K, C * K * F), jnp.bfloat16)
                    .at[row]
                    .add(
                        g.reshape(batch, C * K * F).astype(jnp.bfloat16),
                        mode="promise_in_bounds",
                    )
                    .astype(jnp.float32)
                )
                dsh = None  # idx already includes every phase's shift
                packs = [dpacked]
            else:
                rows = dfeats.reshape(batch, C * F).astype(jnp.float32)
                rows = rows.reshape(batch // G, G, C * F)
                packs = []
                for g in range(G):
                    order, lo, slot_sorted, nb, M, _inv = csrs[g]
                    packs.append(
                        scatter_packed_static_csr(
                            rows[:, g, :], order, lo, slot_sorted, nb, M,
                            K, F, size // K, rounding,
                        )  # (size/K, 128)
                    )
            # Per-corner static delta rolls (shared across phases), then
            # one dynamic per-phase shift roll — rolls are shift-additive
            # so the phase sum commutes with the corner sum.
            dflat = jnp.zeros((size * F,), jnp.float32)
            for g, dpacked in enumerate(packs):
                acc = jnp.zeros((size * F,), jnp.float32)
                for c, delta in enumerate(deltas):
                    blk = dpacked[:, c * K * F : (c + 1) * K * F].reshape(-1)
                    acc = acc + (
                        jnp.roll(blk, delta * F) if delta else blk
                    )
                if dsh is not None:
                    acc = jnp.roll(acc, dsh[g].astype(jnp.int32) * F)
                dflat = dflat + acc
            if level_mode:
                return dflat.reshape(lin_arg.shape)
            out = jnp.zeros((n_params,), jnp.float32)
            return jax.lax.dynamic_update_slice(out, dflat, (F * off,))

        try:
            return linear_call(p_fn, t_fn, (idx, d_shift), lin_arg)
        except NotImplementedError:  # vmap: no linear_call batching rule
            return p_fn((idx, d_shift), lin_arg)

    def _raster_separable_feats(self, table, lvl: int, sides):
        """Raster-serving fast path for one raster-stride level: SEPARABLE
        d-linear interpolation with trace-time-static indices/weights.

        Tile-center positions (``utils.sampling.raster_centers``) are a
        tensor product of one per-dim coordinate vector, so the cell index
        and interpolation weight along each dim are static (side_k,)
        vectors — the lookup is d successive static ``jnp.take``+lerp
        stages over the dense vertex grid instead of per-sample gathers,
        variants, or masks. Corner wraparound reproduces the
        raster-additive fold ``(flat + shift) % size`` exactly: each
        corner reads from a shifted window of the mod-``size``-tiled flat
        parameter vector (the same construction as the quad table's
        rolls, grid.h:49-212's dense indexing). Channel-first layout
        throughout — intermediates are (F, side, res)-shaped with wide
        minor dims (the (B, F)-narrow forms lane-pad 16-64x; PLAN.md
        round 2).

        Args:
          sides: per-dim tile counts (side_0, ..., side_{d-1}) —
            rectangular rasters supported (e.g. a w x h image).

        Returns (F, prod(sides)) float32, flattened with dim 0 fastest.
        """
        import itertools

        d = self.n_dims_to_encode
        F = self.n_features_per_level
        res = int(self.resolutions[lvl])
        scale = float(self.scales[lvl])
        size = int(self.offset_table[lvl + 1] - self.offset_table[lvl])
        off = int(self.offset_table[lvl])
        strides = self._level_strides(lvl)

        # Static per-dim base index / weight — an exact f32 replica of
        # apply()'s pos_fract on raster_centers (same IEEE ops in numpy).
        i0s, ws = [], []
        for side in sides:
            base = (
                np.arange(side, dtype=np.float32) + np.float32(0.5)
            ) / np.float32(side)
            pos = base * np.float32(scale) + np.float32(0.5)
            i0 = np.floor(pos)
            t = (pos - i0).astype(np.float32)
            if self.interpolation_type == InterpolationType.Smoothstep:
                t = t * t * (np.float32(3.0) - np.float32(2.0) * t)
            i0s.append(jnp.asarray(i0.astype(np.int32)))
            ws.append(jnp.asarray(t))

        n_cells = res**d
        max_shift = sum(strides)
        reps = -(-(n_cells + max_shift) // size)
        slT = table[off : off + size].T  # (F, size)
        E = slT if reps == 1 else jnp.tile(slT, (1, reps))

        # 2^d corner tensors = shifted dense views of E; key ordered like
        # the tensor axes (dim d-1 first).
        tensors = {}
        for cbits in self._corners:
            shift = sum(int(b) * strides[dim] for dim, b in enumerate(cbits))
            key = tuple(int(b) for b in reversed(list(cbits)))
            tensors[key] = E[:, shift : shift + n_cells].reshape(
                (F,) + (res,) * d
            )
        # Lerp one axis per stage, halving the corner set by prefix.
        # Tensor axis 1+k is input dim d-1-k.
        for k in range(d):
            rem = d - 1 - k
            dim = d - 1 - k
            side = int(sides[dim])
            wb = ws[dim].reshape((1,) * (1 + k) + (side,) + (1,) * rem)
            new = {}
            for suffix in itertools.product((0, 1), repeat=rem):
                a = jnp.take(tensors[(0,) + suffix], i0s[dim], axis=1 + k)
                b = jnp.take(tensors[(1,) + suffix], i0s[dim], axis=1 + k)
                new[suffix] = (1.0 - wb) * a + wb * b
            tensors = new
        return tensors[()].reshape(F, int(np.prod(sides)))

    def _stratified_feats(self, params, lvl: int, strata: int, bits):
        """Gather-free corner features for one coarse level of a stratified
        batch (PLAN.md): unfold the raster-hashed quad table to the dense
        (res,)*d vertex grid (pure tile+reshape), upsample it to the
        (strata,)*d tile grid with static slice-gathers (one per window
        shift), and pick each sample's variant with an elementwise mask —
        the backward is static slice scatter-adds (a few hundred constant
        indices over whole planes: bandwidth-bound, nothing like the
        per-sample random scatter this path exists to avoid).

        Returns (strata^d, 2^d * F) corner features in quad-column order.
        """
        import itertools

        dim_bits, c0, n_var = bits
        d = self.n_dims_to_encode
        res = int(self.resolutions[lvl])
        quad = self._quad_table(params, lvl)  # (size, C) raster strides
        size, C = quad.shape
        n_cells = res**d
        reps = -(-n_cells // size)
        D = quad if reps == 1 else jnp.tile(quad, (reps, 1))
        # Raster flat index = sum_i x_i * res^i -> axis order [x_{d-1},...,x_0]
        D = D[:n_cells].reshape((res,) * d + (C,)).astype(jnp.float32)

        # Upsample via successive STATIC slice-gathers (jnp.take with
        # constant indices), contracted highest input-dim first;
        # intermediates are shared across window variants by delta-prefix
        # (the first stage touches the full res^d tensor and dominates).
        # A gather of `strata` constant indices whose slices are whole
        # (res^k * C)-element planes is bandwidth-bound on XLA's TPU
        # emitter (per-index overhead amortizes over the big slice), its
        # VJP is an equally cheap static slice scatter-add, and — unlike a
        # one-hot MXU contraction — it is EXACT in f32 with no precision
        # knobs (default MXU passes truncate operands to bf16; HIGHEST
        # costs 6 passes — both measured worse, see PLAN.md). Gathering
        # each axis IN PLACE keeps D's [dim_{d-1}, ..., dim_0, C] axis
        # order, which already matches raster sample order — no
        # transposes (the moveaxis form cost ~3 ms/step in layout copies).
        cache: dict = {(): D}

        def rows_for(shift):
            return jnp.asarray(np.minimum(c0 + shift, res - 1), jnp.int32)

        def partial_contract(prefix):
            if prefix in cache:
                return cache[prefix]
            t = partial_contract(prefix[:-1])
            i = len(prefix) - 1
            t = jnp.take(t, rows_for(prefix[-1]), axis=i)
            cache[prefix] = t
            return t

        def contract(deltas):
            # deltas per input dim (dim 0 fastest); axis 0 of D is dim
            # d-1, so the prefix order is the reversed delta tuple.
            t = partial_contract(tuple(reversed(deltas)))
            return t.reshape(strata**d, C)

        accum = getattr(self, "strat_accum", "auto")
        if accum == "auto":
            accum = "select_n"
        combos = list(itertools.product(range(n_var), repeat=d))
        if accum == "select_n":
            # ONE n_var^d-way select instead of a sequential where-chain:
            # the chain re-reads feats per combo AND lets XLA recompute
            # shared take-prefixes into each where's fusion — the top
            # composed block in BOTH dims once the quad-build taxes fell
            # (round-4 session 3: 2D 10 x 0.885 ms, 3D 7.8 ms/step).
            # select_n's which = the per-tile variant-combo id; every
            # case is a direct operand of one op. Exact: same f32 values
            # selected; the VJP selects cotangents per case like the
            # where-chain did.
            cases = [contract(list(deltas)) for deltas in combos]
            which = jnp.zeros_like(dim_bits[0])
            for i in range(d):
                which = which + dim_bits[i].astype(jnp.int32) * (
                    n_var ** (d - 1 - i)
                )
            return jax.lax.select_n(
                jnp.broadcast_to(which[:, None], cases[0].shape), *cases
            )
        feats = jnp.zeros((strata**d, C), jnp.float32)
        for deltas in combos:
            mask = None
            for i in range(d):
                m = dim_bits[i] == deltas[i]
                mask = m if mask is None else jnp.logical_and(mask, m)
            feats = jnp.where(mask[:, None], contract(list(deltas)), feats)
        return feats

    # -- compute ---------------------------------------------------------------
    def apply(
        self,
        params,
        x,
        max_level: Optional[float] = None,
        rng=None,
        stratified: Optional[bool] = None,
        raster_side: Optional[int] = None,
        served_tables: Optional[dict] = None,
    ):
        """Encode positions.

        Args:
          params: flat (n_params,) parameter slice, OR a tuple of
            per-level compact ``(size_l * F,)`` arrays (the
            ``level_split`` partition carried as separate buffers). The
            tuple form is the structured-state fast path: per-level
            consumers read their own program input directly — no global
            ``(N, F)`` view, no per-level slice, and the gradient comes
            back as per-level arrays with no concatenation (see
            ``split_params``/``Trainer(split_grid_state=True)``).
            Supported on the per-level execution branch
            (per_level/quad/stratified/phase-locked); the fused /
            quad_fused global-gather strategies and raster serving
            require the flat form.
          x: (batch, n_dims) positions, nominally in [0, 1]^d.
          served_tables: optional prebuilt quad tables from
            ``serving_tables`` (production serving: the per-call quad
            builds are loop-invariant when params are frozen, so
            ``FrozenServer`` hoists them out of the jitted program and
            passes them here as device-resident inputs). Levels present
            in the dict gather directly from their prebuilt table;
            differentiation w.r.t. ``params`` does NOT see those levels
            (serving only).
          max_level: optional coarse-to-fine masking in [0, 1]; levels
            ``l >= max_level * n_levels + 1e-3`` output zeros
            (reference: grid.h:69-92).
          rng: PRNG key enabling stochastic interpolation when the encoding
            was built with ``stochastic_interpolation`` — the table gradient
            of each (sample, level) goes in full to ONE corner sampled per
            the interpolation weights (reference: grid.h:284-299); input
            gradients stay exact.
          stratified: gate for the gather-free static coarse-level path of
            ``gather_strategy="stratified"``. ``None`` (default) auto-detects
            by batch size; ``False`` forces the per-sample fallback (use for
            arbitrary batches, e.g. serving); ``True`` asserts the contract.
            Whenever the static path runs, an on-device check verifies the
            raster-tile contract (sample j in tile j) and **NaN-poisons the
            output on violation** — a conforming-size but non-conforming-
            layout batch fails loudly instead of silently corrupting
            features.
        """
        d = self.n_dims_to_encode
        L = self.n_levels
        F = self.n_features_per_level
        if self.fixed_point_pos:
            if x.dtype != jnp.uint32:
                raise TypeError(
                    "fixed_point_pos expects uint32 inputs spanning [0, 1)"
                )
            x_fixed = x
        else:
            x = x.astype(jnp.float32)
        batch = x.shape[0]

        level_params = None
        if isinstance(params, (tuple, list)):
            level_params = tuple(params)
            if len(level_params) != L:
                raise ValueError(
                    f"level-split params: got {len(level_params)} arrays "
                    f"for {L} levels"
                )
            if raster_side is not None:
                raise ValueError(
                    "level-split params: raster serving uses the flat "
                    "form (frozen params — join_params once)"
                )
            params = None
            table = None
        else:
            table = params.reshape(-1, F)
        n_corners = 1 if self.interpolation_type == InterpolationType.Nearest else 2**d

        # Per-level index/weight computation is cheap vectorized arithmetic;
        # the expensive part — the table lookup — is batched into ONE gather
        # across all levels. (XLA TPU schedules N separate gathers an order
        # of magnitude worse than one fused gather, and random access is the
        # dominant cost of this encoding on TPU.)
        idx_levels = []
        w_levels = []
        sto_onehots = []
        strat_bits: dict = {}
        stochastic = self.stochastic_interpolation and rng is not None and (
            self.interpolation_type != InterpolationType.Nearest
        )
        # Stratified fast path (PLAN.md): when the caller guarantees sample
        # j lies in raster tile j of a (strata x strata) partition of
        # [0,1)^2 (see utils/sampling.py), coarse levels (scale <= strata-1)
        # need NO random access at all — the tile->cell map is static, so
        # the lookup becomes tile+reshape unfold, static one-hot einsum
        # upsampling (MXU), and a 2x2 elementwise select; the autodiff
        # backward is dense pooling matmuls instead of a scatter-add.
        strat_strata = 0
        if (
            stratified is not False
            and self.gather_strategy == "stratified"
            and d in (2, 3)
            and not self.fixed_point_pos
            and not stochastic
            and self.raster_max_scale is not None
            and self.interpolation_type
            in (InterpolationType.Linear, InterpolationType.Smoothstep)
        ):
            s_ = round(batch ** (1.0 / d))
            if s_**d == batch and s_ >= 2:
                strat_strata = s_
        # Raster-serving separability (apply_raster): positions are the
        # static tile-center tensor product, so raster-stride levels use
        # the separable static-lerp path (no variants, no contract check
        # needed — the layout holds by construction).
        raster_sides = None
        if raster_side is not None:
            raster_sides = (
                (int(raster_side),) * d
                if np.isscalar(raster_side)
                else tuple(int(s) for s in raster_side)
            )
        separable_ok = (
            raster_sides is not None
            and len(raster_sides) == d
            and int(np.prod(raster_sides)) == batch
            and d in (2, 3)
            and not self.fixed_point_pos
            and not stochastic
            and self.raster_max_scale is not None
            and self.interpolation_type
            in (InterpolationType.Linear, InterpolationType.Smoothstep)
        )
        if stratified and not strat_strata:
            raise ValueError(
                "stratified=True but the static path is unavailable "
                f"(batch {batch} must be a perfect {d}-th power and the "
                "encoding must be configured with gather_strategy="
                "'stratified')"
            )
        contract_ok = None
        # Phase-locked fine levels (PLAN.md round 3): static cell indices
        # + one dynamic scalar shift per level; see _locked_levels.
        locked_set = (
            self._locked_levels(strat_strata)
            if strat_strata and not separable_ok and not stochastic
            else set()
        )
        locked_info: dict = {}
        i_const = None
        n_phases = 1
        g_const = None
        if locked_set:
            n_phases = int(self.locked_phases)
            if n_phases < 1 or batch % n_phases:
                raise ValueError(
                    f"locked_phases={n_phases} must be a positive divisor "
                    f"of the batch size {batch}"
                )
            ids_np = np.arange(batch, dtype=np.int64)
            i_np = np.stack(
                [(ids_np // strat_strata**k) % strat_strata for k in range(d)],
                axis=1,
            )
            i_const = jnp.asarray(i_np.astype(np.int32))  # (B, d) tiles
            g_const = jnp.asarray(
                (ids_np % n_phases).astype(np.int32)
            )  # (B,) phase of each tile
        if strat_strata and not separable_ok:
            # On-device raster-tile contract check (cheap VPU compares):
            # sample j must lie in tile j (dim i tile = (j // strata^i) %
            # strata). One extra tile of slack per dim absorbs f32 rounding
            # at tile boundaries (base+jitter can round up into the next
            # tile; the static path's dim_bits clamp handles those). The
            # result NaN-poisons the output below — misuse fails loudly.
            ids = jnp.arange(batch, dtype=jnp.int32)
            contract_ok = jnp.bool_(True)
            for dim in range(d):
                tile = (ids // (strat_strata**dim)) % strat_strata
                got = jnp.floor(x[:, dim] * strat_strata).astype(jnp.int32)
                diff = jnp.clip(got, 0, strat_strata - 1) - tile
                contract_ok = jnp.logical_and(
                    contract_ok, jnp.all((diff >= 0) & (diff <= 1))
                )
            if locked_set:
                # Phase-lock contract: tile j's within-tile jitter vector
                # equals phase j % G's (utils/sampling.stratified_uniform
                # with phase_locked=G for any G dividing locked_phases).
                # The locked levels' static indices assume it; violation
                # NaN-poisons the output below.
                frac = x * jnp.float32(strat_strata) - i_const.astype(
                    jnp.float32
                )
                frac_ref = jnp.take(frac[:n_phases], g_const, axis=0)
                contract_ok = jnp.logical_and(
                    contract_ok,
                    jnp.all(jnp.abs(frac - frac_ref) <= 2e-3),
                )
        for lvl in range(L):
            scale = float(self.scales[lvl])
            res = int(self.resolutions[lvl])
            level_size = int(self.offset_table[lvl + 1] - self.offset_table[lvl])
            level_offset = int(self.offset_table[lvl])

            if (
                separable_ok
                and scale <= self.raster_max_scale
                and lvl == len(strat_bits)
                and all(v == "separable" for v in strat_bits.values())
            ):
                # Raster-stride level on a tile-center raster: fully
                # static separable lerp (see _raster_separable_feats) —
                # no per-sample index/weight arithmetic at all. Only a
                # level PREFIX is taken (scales are monotone in practice;
                # the output assembly re-joins one channel-first block).
                strat_bits[lvl] = "separable"
                idx_levels.append(None)
                w_levels.append(None)
                continue

            if self.fixed_point_pos:
                # Fixed-point cell decomposition (reference: grid.h:1143-1151):
                # uint32 inputs span [0, 1); the +half-cell offset plays the
                # 0.5-stagger role, wrapping handled in uint32 arithmetic.
                cell = max(int(0xFFFFFFFF / scale), 1)
                pos_fixed = x_fixed + jnp.uint32(cell // 2)
                pg = pos_fixed // jnp.uint32(cell)
                pg = pg + jnp.where(
                    pos_fixed < jnp.uint32(cell // 2), jnp.uint32(int(scale)),
                    jnp.uint32(0),
                )
                rem = pos_fixed - pg * jnp.uint32(cell)
                pos_grid = pg.astype(jnp.int32)
                t = (scale / float(0xFFFFFFFF)) * rem.astype(jnp.float32)
            elif lvl in locked_set:
                # Phase-locked level: cell = tile * q + E_g with integral
                # q = scale / strata and E_g = floor(grid pos of phase
                # g's jitter) — one (d,) int vector per phase (tile j
                # uses phase j % G, verified by the contract check
                # above). Indices derive from the PREDICTED grid so they
                # are static up to G scalars; t keeps the per-sample
                # position (exact input gradients). A global off-by-one
                # of E at a cell boundary is harmless by lerp continuity
                # (t compensates).
                pos = x * scale + 0.5
                q = int(scale) // strat_strata
                G = n_phases
                # Samples 0..G-1 carry phases 0..G-1; subtract their
                # static tile offsets to recover each phase's E.
                tg = jnp.asarray(i_np[:G].astype(np.int32))  # (G, d)
                Eg = (
                    jnp.floor(pos[:G]).astype(jnp.int32)
                    - tg * jnp.int32(q)
                )  # (G, d)
                pos_grid = i_const * jnp.int32(q) + jnp.take(
                    Eg, g_const, axis=0
                )
                t = pos - pos_grid.astype(jnp.float32)
                # Static base indices (numpy, cached) + the dynamic
                # per-phase scalar shifts for the locked lookup's
                # static-CSR transpose.
                bkey = (lvl, batch)
                base_np = self._locked_base_cache.get(bkey)
                if base_np is None:
                    strides_l = self._level_strides(lvl)
                    acc = np.zeros(batch, np.uint64)
                    ids_np = np.arange(batch, dtype=np.int64)
                    for dim in range(d):
                        i_dim = (ids_np // strat_strata**dim) % strat_strata
                        acc += i_dim.astype(np.uint64) * np.uint64(
                            (q * strides_l[dim]) & 0xFFFFFFFF
                        )
                        acc &= 0xFFFFFFFF
                    base_np = (acc % np.uint64(level_size)).astype(np.int32)
                    self._locked_base_cache[bkey] = base_np
                dsh = jnp.zeros((G,), jnp.uint32)
                strides_l = self._level_strides(lvl)
                for dim in range(d):
                    dsh = dsh + Eg[:, dim].astype(jnp.uint32) * jnp.uint32(
                        strides_l[dim] & 0xFFFFFFFF
                    )
                locked_info[lvl] = (
                    base_np,
                    (dsh % jnp.uint32(level_size)).astype(jnp.int32),
                )
            else:
                # pos_fract with the 0.5 stagger offset
                # (reference: common_device.h:1000-1043).
                pos = x * scale + 0.5
                pos_floor = jnp.floor(pos)
                pos_grid = pos_floor.astype(jnp.int32)  # (B, D)
                t = pos - pos_floor
            if self.interpolation_type == InterpolationType.Smoothstep:
                w = _smoothstep(t)
            else:
                w = t

            if self.interpolation_type == InterpolationType.Nearest:
                corner = pos_grid.astype(jnp.uint32)[:, None, :]  # (B, 1, D)
                weights = jnp.ones((batch, 1), jnp.float32)
            else:
                corners = jnp.asarray(self._corners, jnp.int32)  # (C, D)
                corner = (
                    pos_grid[:, None, :] + corners[None, :, :]
                ).astype(jnp.uint32)  # (B, C, D)
                bits = corners[None, :, :].astype(jnp.float32)
                # weight = prod_dim (bit ? w : 1-w)
                weights = jnp.prod(
                    bits * w[:, None, :] + (1.0 - bits) * (1.0 - w[:, None, :]),
                    axis=-1,
                )  # (B, C)
                if stochastic:
                    # One uniform per (sample, level); per-dim corner bit
                    # u < w_dim (grid.h:286-297).
                    u = jax.random.uniform(
                        jax.random.fold_in(rng, lvl), (batch, 1)
                    )
                    sample_bits = (u < w).astype(jnp.int32)  # (B, D)
                    match = jnp.all(
                        sample_bits[:, None, :] == corners[None, :, :], axis=-1
                    )
                    sto_onehots.append(match.astype(jnp.float32))  # (B, C)

            lvl_stratified = False
            if strat_strata and self.interpolation_type != InterpolationType.Nearest:
                n_var = int(math.ceil(scale / strat_strata)) + 1
                lvl_stratified = (
                    scale <= self.raster_max_scale
                    and n_var <= self.stratified_max_variants
                )
            if lvl_stratified:
                # Static tile->cell map: sample j sits in raster tile
                # ((j // strata^i) % strata per dim i); its base cell is
                # c0 + a small dynamic shift in [0, n_var) per dim.
                c0 = np.floor(
                    np.arange(strat_strata) / strat_strata * scale + 0.5
                ).astype(np.int64)
                c0j = jnp.asarray(c0, jnp.int32)
                dim_bits = []
                for dim in range(d):
                    c0_dim = jnp.tile(
                        jnp.repeat(c0j, strat_strata**dim),
                        strat_strata ** (d - 1 - dim),
                    )
                    # Clamp: for in-contract inputs the shift is already in
                    # [0, n_var); float32-vs-float64 floor ties at tile
                    # boundaries then degrade to an adjacent cell instead
                    # of silently zero features.
                    dim_bits.append(
                        jnp.clip(pos_grid[:, dim] - c0_dim, 0, n_var - 1)
                    )
                strat_bits[lvl] = (dim_bits, c0, n_var)
                idx_levels.append(None)
            elif (
                self.gather_strategy in ("quad", "quad_fused", "stratified")
                and self.interpolation_type == InterpolationType.Linear
                and self._level_strides(lvl) is not None
            ):
                # Base-corner index only; the other 2^d-1 corners are
                # reached by static offsets via the quad table (PLAN.md).
                base = jnp.zeros((batch,), jnp.uint32)
                pg = pos_grid.astype(jnp.uint32)
                for dim, stride in enumerate(self._level_strides(lvl)):
                    base = base + pg[:, dim] * jnp.uint32(stride & 0xFFFFFFFF)
                idx_levels.append(
                    (base % jnp.uint32(level_size)).astype(jnp.int32)
                )
            elif self._level_strides(lvl) is not None:
                # Affine corner fold over the level's strides — identical
                # indices to the quad path for ANY interpolation mode and
                # batch shape. Covers dense/tiled raster indexing (uint32
                # wrapping like the reference's index_dense,
                # common_device.h:855-884), the additive hash, and — the
                # part that matters for consistency — hashed levels under
                # ``raster_max_scale``, which must fold raster strides mod
                # the table size on EVERY path (a Smoothstep batch that
                # misses the quad elif previously fell into the `_use_hash`
                # branch and produced different features; see ADVICE r1).
                strides = self._level_strides(lvl)
                idx = jnp.zeros(corner.shape[:-1], jnp.uint32)
                for dim in range(d):
                    idx = idx + corner[..., dim] * jnp.uint32(
                        strides[dim] & 0xFFFFFFFF
                    )
                idx = idx % jnp.uint32(level_size)
                idx_levels.append(
                    idx.astype(jnp.int32) + jnp.int32(level_offset)
                )
            else:
                idx = _grid_hash(corner, self.hash_type)
                idx = idx % jnp.uint32(level_size)
                idx_levels.append(
                    idx.astype(jnp.int32) + jnp.int32(level_offset)
                )
            w_levels.append(weights)

        if level_params is not None and self.gather_strategy in (
            "quad_fused",
            "fused",
        ):
            raise ValueError(
                "level-split params require a per-level gather strategy "
                f"(got {self.gather_strategy!r}, which gathers from one "
                "global table)"
            )
        if self.gather_strategy == "quad_fused" and all(
            i.ndim == 1 for i in idx_levels
        ):
            # ONE gather for the whole encoding: concatenate the per-level
            # quad tables (each row = all 2^d corner features of one cell)
            # into a supertable and look up (B, L) rows at once. The VJP is
            # one scatter-add of B*L rows into the supertable plus the
            # roll/concat adjoints. Composes best when the supertable is
            # small (2^15-class configs); per-level loop fusion wins for
            # 2^19-class tables — measure, don't guess (PLAN.md).
            quads = []
            q_offsets = []
            q_off = 0
            for lvl in range(L):
                quads.append(self._quad_table(params, lvl))
                q_offsets.append(q_off)
                q_off += quads[-1].shape[0]
            supertable = jnp.concatenate(quads, axis=0)  # (sum sizes, C*F)
            gidx = jnp.stack(
                [idx_levels[lvl] + jnp.int32(q_offsets[lvl]) for lvl in range(L)],
                axis=1,
            )  # (B, L)
            feats = supertable.at[gidx].get(mode="promise_in_bounds")
            feats = feats.reshape(batch, L, n_corners, F)
            weights = jnp.stack(w_levels, axis=1)  # (B, L, C)
            if stochastic:
                y = jnp.stack(
                    [
                        _stochastic_combine(
                            feats[:, l], weights[:, l], sto_onehots[l]
                        )
                        for l in range(L)
                    ],
                    axis=1,
                )
            else:
                y = jnp.sum(
                    feats * weights[..., None].astype(feats.dtype), axis=2
                )
        elif self.gather_strategy == "fused":
            # ONE gather across all levels; promise_in_bounds (indices are
            # %-reduced above) — XLA's default bounds-checked gather takes a
            # catastrophically slower path on TPU standalone, and the VJP
            # inherits the mode for the scatter-add.
            global_idx = jnp.stack(idx_levels, axis=1)  # (B, L, C)
            weights = jnp.stack(w_levels, axis=1)  # (B, L, C)
            feats = table.at[global_idx.reshape(batch, L * n_corners)].get(
                mode="promise_in_bounds"
            )  # (B, L*C, F)
            feats = feats.reshape(batch, L, n_corners, F)
            if stochastic:
                y = jnp.stack(
                    [
                        _stochastic_combine(
                            feats[:, l], weights[:, l], sto_onehots[l]
                        )
                        for l in range(L)
                    ],
                    axis=1,
                )
            else:
                y = jnp.sum(
                    feats * weights[..., None].astype(feats.dtype), axis=2
                )
        else:
            # Per-level gathers; XLA fuses each into the surrounding
            # interpolation arithmetic (loop fusion), which measures faster
            # in the full training step than the materialized fused gather.
            # (Batching same-shape quad levels through ONE
            # gather_rows_batched call measured 4 ms/step SLOWER composed
            # — the materialized (K, B, C) tensors cost more than the
            # saved op launches; per-level loop fusion wins. The batched
            # ops remain in ops/scatter_rows.py with CPU coverage.)
            #
            # level_split (round 4): on this branch every level's lookup
            # reads its own contiguous parameter slice, so split the flat
            # vector ONCE into per-level compact arrays whose adjoint is
            # one concat (see _split_levels) instead of per-level
            # zeros+dynamic_update_slice assemblies. Serving paths keep
            # the flat form (frozen params — no adjoint to optimize; and
            # served/separable levels would leave split outputs unused,
            # which higher-order autodiff can't tolerate).
            if level_params is not None:
                # Structured state: the split already happened at the
                # program boundary — each level's array IS its own input
                # buffer (no in-graph slice, no concat adjoint).
                lp = level_params
            else:
                lp = params
                if (
                    getattr(self, "level_split", "auto") != "off"
                    and served_tables is None
                    and raster_sides is None
                ):
                    split = self._split_levels(params)
                    if split is not None:
                        lp = split
            outs = []
            sep_blocks = []  # (F, B) channel-first blocks (level prefix)
            for lvl in range(L):
                idx = idx_levels[lvl]
                if idx is None and strat_bits.get(lvl) == "separable":
                    sep_blocks.append(
                        self._raster_separable_feats(table, lvl, raster_sides)
                    )
                    outs.append(None)
                    continue
                if idx is None:
                    # Stratified static path — no random access (PLAN.md).
                    feats = self._stratified_feats(
                        lp, lvl, strat_strata, strat_bits[lvl]
                    ).reshape(batch, n_corners, F)
                elif idx.ndim == 1:
                    # Quad-row path: ONE random access per cell (PLAN.md).
                    size = int(
                        self.offset_table[lvl + 1] - self.offset_table[lvl]
                    )
                    mode = self._scatter_mode(idx.shape[0], size)
                    K = self._pack_k()
                    packed = (
                        self.quad_pack != "off"
                        and K >= 2
                        and size % K == 0
                        and size > self.onehot_threshold
                        and self.index_mode is None
                        and mode.startswith("xla")
                    )
                    if served_tables is not None and lvl in served_tables:
                        # Production serving: gather from the prebuilt
                        # quad table (built once by serving_tables; the
                        # per-call roll+concat quad build is loop-
                        # invariant under frozen params). The table
                        # carries the server's dtype choice — f32 by
                        # default, bf16 under table_dtype overrides.
                        feats = gather_rows(
                            served_tables[lvl], idx, mode
                        ).reshape(batch, n_corners, F)
                    elif lvl in locked_info:
                        # Phase-locked: static-CSR transpose (no scatter
                        # emitter at all); forward identical to hybrid.
                        base_np, d_shift = locked_info[lvl]
                        feats = self._quad_lookup_locked(
                            lp, idx, lvl, base_np, d_shift
                        ).reshape(batch, n_corners, F)
                    elif packed and self.quad_pack in ("auto", "hybrid"):
                        # Unpacked-gather forward + packed-scatter
                        # transpose (see _quad_lookup_hybrid). Default:
                        # measured faster than the packed gather+select on
                        # BOTH directions (3D NeRF step 133.7 -> 121.5 ms,
                        # 2D 2^19 step 81.2 -> 74.4; probe_hybrid.py).
                        feats = self._quad_lookup_hybrid(
                            lp, idx, lvl, mode
                        ).reshape(batch, n_corners, F)
                    elif packed:
                        # Lane-packed quad lookup (see _quad_table_packed):
                        # gather the (B, 128) packed row, select cell
                        # idx % K per corner block elementwise. Exact — the
                        # same rows/weights as the unpacked path.
                        qp = self._quad_table_packed(lp, lvl)
                        g = gather_rows(
                            qp, idx // K, mode,
                            forward_dtype=self._forward_dtype(),
                        )  # (B, 128)
                        g = g.reshape(batch, n_corners, K, F)
                        sel = jax.nn.one_hot(idx % K, K, dtype=g.dtype)
                        feats = jnp.sum(g * sel[:, None, :, None], axis=2)
                    else:
                        quad = self._quad_table(lp, lvl)  # (size, C*F)
                        if size <= self.onehot_threshold:
                            # Tiny level: route the lookup through the MXU
                            # as a one-hot matmul — the VJP becomes a dense
                            # transpose matmul instead of a serial
                            # scatter-add.
                            onehot = jax.nn.one_hot(idx, size, dtype=quad.dtype)
                            feats = jnp.dot(
                                onehot, quad,
                                preferred_element_type=jnp.float32,
                            ).astype(quad.dtype)
                        elif self.index_mode is None:
                            feats = gather_rows(
                                quad, idx, mode,
                                forward_dtype=self._forward_dtype(),
                            )
                        else:
                            feats = quad.at[idx].get(mode=self.index_mode)
                        feats = feats.reshape(batch, n_corners, F)
                else:
                    # Per-level vertex gather, rebased to the level's table
                    # slice so the factored MXU scatter can take the VJP
                    # when the level fits the gate (slice/pad adjoints are
                    # dense and cheap).
                    size = int(
                        self.offset_table[lvl + 1] - self.offset_table[lvl]
                    )
                    off = int(self.offset_table[lvl])
                    mode = self._scatter_mode(idx.size, size)
                    if isinstance(lp, tuple):
                        # level_split: always rebase onto the level's own
                        # compact table (gather mode semantics unchanged;
                        # "xla" is plain indexing on any table).
                        feats = gather_rows(
                            lp[lvl].reshape(size, F),
                            idx - jnp.int32(off),
                            mode,
                            forward_dtype=self._forward_dtype(),
                        )
                    elif mode == "xla":
                        feats = gather_rows(
                            table, idx, "xla",
                            forward_dtype=self._forward_dtype(),
                        )  # (B, C, F)
                    else:
                        feats = gather_rows(
                            table[off : off + size],
                            idx - jnp.int32(off),
                            mode,
                            forward_dtype=self._forward_dtype(),
                        )
                feats = feats.astype(jnp.float32)
                if stochastic:
                    outs.append(
                        _stochastic_combine(
                            feats, w_levels[lvl], sto_onehots[lvl]
                        )
                    )
                else:
                    outs.append(
                        jnp.sum(feats * w_levels[lvl][..., None], axis=1)
                    )
            if sep_blocks:
                # Separable levels form a prefix (scales are monotone);
                # ONE transpose re-joins the channel-first block with the
                # per-sample levels.
                k = len(sep_blocks)
                assert all(outs[i] is None for i in range(k))
                y_sep = jnp.concatenate(sep_blocks, axis=0).T.reshape(
                    batch, k, F
                )
                rest = outs[k:]
                y = (
                    jnp.concatenate([y_sep, jnp.stack(rest, axis=1)], axis=1)
                    if rest
                    else y_sep
                )
            else:
                y = jnp.stack(outs, axis=1)  # (B, L, F)

        if max_level is not None:
            # Level l is active iff l < max_level * L + 1e-3 (grid.h:69-92).
            lvl_ids = jnp.arange(L, dtype=jnp.float32)
            active = lvl_ids < (jnp.float32(max_level) * L + 1e-3)
            y = jnp.where(active[None, :, None], y, 0.0)

        if contract_ok is not None and (strat_bits or locked_info):
            # Static coarse levels ran: poison everything if the batch
            # violated the raster contract (see docstring).
            y = jnp.where(contract_ok, y, jnp.nan)

        y = y.reshape(batch, L * F)
        return self._pad(y)

    def serving_tables(self, params) -> dict:
        """Prebuild the per-level quad tables for production serving.

        The quad build (per-corner static rolls + lane concat of each
        level's parameter slice, ``_quad_table``) re-executes inside every
        jitted inference call even though it is loop-invariant under
        frozen params. ``FrozenServer`` (serving.py) runs this ONCE under
        jit, keeps the result device-resident, and passes it back through
        ``apply(..., served_tables=...)`` so per-call work is gathers +
        interpolation + MLP only. Tables are stored in the forward dtype
        (``table_dtype``), matching the training forward's storage
        rounding.

        Covers every level with affine index strides (additive-hash fine
        levels and dense/tiled raster levels — the levels the quad path
        can serve); the stratified/separable coarse paths read parameter
        windows directly and need no prebuild. Memory: 2^d * F floats per
        cell, i.e. 2^d x the level's parameter bytes.

        The reference has no analogue (its inference re-runs the training
        kernels); this is the TPU-native equivalent of resident
        ``params_inference`` (reference: trainer.h:171-186).
        """
        if self.gather_strategy not in ("quad", "stratified"):
            # per_level/fused strategies gather vertices (idx.ndim == 2)
            # — the quad-row served branch never runs, so prebuilding
            # would hold 2^d x the parameter bytes for nothing.
            return {}
        fd = self._forward_dtype()
        out = {}
        for lvl in range(self.n_levels):
            if self._level_strides(lvl) is None:
                continue
            quad = self._quad_table(params, lvl)
            out[lvl] = quad.astype(fd) if fd is not None else quad
        return out

    def apply_raster(
        self,
        params,
        side,
        max_level: Optional[float] = None,
        served_tables: Optional[dict] = None,
    ):
        """Encode the tile-center raster (serving layout:
        ``utils.sampling.raster_centers`` — sample j at the center of
        raster tile j, dim 0 fastest). ``side`` is an int (cubic raster,
        ``side^d`` points) or a per-dim tuple ``(side_0, ..., side_{d-1})``
        (rectangular — e.g. a w x h image gives ``(w, h)``).

        Tile centers satisfy the raster-tile contract by construction, so
        a ``gather_strategy="stratified"`` encoding routes through the
        gather-free static coarse-level path (``stratified=True``) — the
        fastest known serving form (PLAN.md: 11.6 vs 16.0 ms encoding at
        B=2^18 flagship). Other strategies use the per-sample fallback:
        their coarse levels hash with plain additive factors rather than
        raster strides (``raster_max_scale`` is part of the encoding
        function), so the static unfold machinery does not apply to them.

        A static-index window-gather design (per-run contiguous packed-row
        windows + one-hot MXU select) was built and measured here first:
        neutral-to-worse at every level count (10.4 vs 7.6 ms at L11,
        15.4 vs 11.6 at L16 against the stratified path; 87 vs 50 ms on
        the 3D NeRF config where windows approach the whole table) — the
        XLA gather emitter charges ~the same per row for static contiguous
        windows as for random rows, and the select einsum eats the rest.
        See PLAN.md round 2 for the numbers; the design was deliberately
        dropped.

        The reference has no analogue (its inference re-runs the training
        kernels, reference: samples/mlp_learning_an_image.cu:116-124).
        """
        from ..utils.sampling import raster_centers

        d = self.n_dims_to_encode
        sides = (
            (int(side),) * d
            if np.isscalar(side)
            else tuple(int(s) for s in side)
        )
        x = jnp.asarray(raster_centers(sides, d))
        if (
            self.gather_strategy == "stratified"
            and self.raster_max_scale is not None
            and not self.fixed_point_pos
            and not self.stochastic_interpolation
            and d in (2, 3)
            and self.interpolation_type
            in (InterpolationType.Linear, InterpolationType.Smoothstep)
        ):
            # raster_side activates the separable static-lerp path on
            # raster-stride levels (strictly faster than the stratified
            # variant machinery: no masks, no variants, no contract check).
            return self.apply(
                params, x, max_level=max_level, raster_side=sides,
                served_tables=served_tables,
            )
        return self.apply(
            params, x, max_level=max_level, stratified=False,
            served_tables=served_tables,
        )

    def hyperparams(self):
        hp = {
            "otype": self.otype,
            "type": self.grid_type.value,
            "n_levels": self.n_levels,
            "n_features_per_level": self.n_features_per_level,
            "log2_hashmap_size": self.log2_hashmap_size,
            "base_resolution": self.base_resolution,
            "per_level_scale": self.per_level_scale,
            "interpolation": self.interpolation_type.value,
            "hash": self.hash_type.value,
            "gather_strategy": self.gather_strategy,
            "scatter_strategy": self.scatter_strategy,
            "quad_pack": self.quad_pack,
            "quad_build": self.quad_build,
            "level_split": self.level_split,
            "strat_accum": self.strat_accum,
            "table_dtype": self.table_dtype,
        }
        if self.raster_max_scale is not None:
            hp["stratified_max_variants"] = self.stratified_max_variants
            hp["strata"] = int(
                self.raster_max_scale / max(self.stratified_max_variants - 1, 1)
            )
        if self.phase_locked:
            hp["phase_locked"] = True
            hp["locked_rounding"] = self.locked_rounding
            hp["locked_phases"] = self.locked_phases
            hp["locked_snap_tol"] = self.locked_snap_tol
            hp["locked_fwd"] = self.locked_fwd
        return hp


_warned_hash_auto = False


def _resolve_hash_type(name: str, grid_type) -> HashType:
    """Resolve the "hash" config value. Default "auto" picks
    CoherentAdditive — a TPU-FIRST DEVIATION from the reference's
    CoherentPrime default, loudly documented: the additive hash makes
    every level's 2^d cell-corner indices affine in the corner bits, so
    the quad-row gather applies to hashed levels too (measured on the
    untouched reference config_hash.json: 114.2 -> 36.7 ms/step,
    probe_r5_verbatim_ab; same collision-rate class, equal-or-better
    golden quality — PLAN.md). Set "hash": "CoherentPrime" for bit-exact
    reference index parity — REQUIRED when loading checkpoints trained
    by the reference with ITS default hash."""
    global _warned_hash_auto
    if name.lower() == "auto":
        if grid_type == GridType.Hash and not _warned_hash_auto:
            _warned_hash_auto = True
            from ..utils.log import log_warning

            log_warning(
                "GridEncoding: no \"hash\" specified — using "
                "CoherentAdditive (TPU-fast, 3-4x the training "
                "throughput of the reference's CoherentPrime default; "
                "same collision class). For bit-exact reference hashing "
                "— e.g. to load a reference-trained checkpoint that "
                "used the reference's default — set \"hash\": "
                "\"CoherentPrime\"."
            )
        return HashType.CoherentAdditive
    return string_to_hash_type(name)


def create_grid_encoding(n_dims_to_encode: int, encoding: dict) -> GridEncoding:
    """Factory reproducing the reference's JSON defaults (grid.h:1725-1755),
    except the execution-strategy extensions ("hash" defaults to "auto" —
    see _resolve_hash_type — and "gather_strategy" to "auto")."""
    encoding = encoding or {}
    log2_hashmap_size = json_value(encoding, "log2_hashmap_size", 19)
    otype = json_value(encoding, "otype", "Grid")
    if otype.lower() == "tiledgrid":
        default_type = "Tiled"
    elif otype.lower() == "densegrid":
        default_type = "Dense"
    else:
        default_type = "Hash"

    n_features_per_level = json_value(encoding, "n_features_per_level", 2)

    has_nf = "n_features" in encoding or "n_grid_features" in encoding
    if has_nf:
        if "n_levels" in encoding:
            raise ValueError(
                "GridEncoding: may not specify n_features and n_levels "
                "simultaneously (one determines the other)"
            )
        n_features = json_value(
            encoding, "n_features", json_value(encoding, "n_grid_features", None)
        )
    else:
        n_features = n_features_per_level * json_value(encoding, "n_levels", 16)

    n_levels = n_features // n_features_per_level
    grid_type = string_to_grid_type(json_value(encoding, "type", default_type))
    base_resolution = json_value(encoding, "base_resolution", 16)

    if grid_type == GridType.Dense:
        default_scale = math.exp(
            math.log(256.0 / base_resolution) / max(n_levels - 1, 1)
        )
    else:
        default_scale = 2.0

    enc = GridEncoding(
        n_dims_to_encode=n_dims_to_encode,
        n_features=n_features,
        log2_hashmap_size=log2_hashmap_size,
        base_resolution=base_resolution,
        per_level_scale=json_value(encoding, "per_level_scale", default_scale),
        stochastic_interpolation=json_value(
            encoding, "stochastic_interpolation", False
        ),
        interpolation_type=string_to_interpolation_type(
            json_value(encoding, "interpolation", "Linear")
        ),
        grid_type=grid_type,
        hash_type=_resolve_hash_type(
            json_value(encoding, "hash", "auto"), grid_type
        ),
        n_features_per_level=n_features_per_level,
        fixed_point_pos=json_value(encoding, "fixed_point_pos", False),
    )
    # Checkpoint-load guard: deserialize warns when params land in a
    # model whose hash was auto-picked (a reference-trained checkpoint
    # under the reference's default hash needs "hash": "CoherentPrime").
    enc.hash_auto_resolved = (
        json_value(encoding, "hash", "auto").lower() == "auto"
        and grid_type == GridType.Hash
    )
    # tcnn_tpu extension: TPU gather strategy ("auto" | "per_level" |
    # "fused" | "quad" | "quad_fused" | "stratified"); see PLAN.md.
    # "auto" (the default) resolves to the quad-table gather for linear
    # deterministic interpolation — all 2^d corners of the affine
    # (dense/tiled/additive-hash) levels come from ONE table row; XOR-
    # hashed levels keep per-corner gathers. Measured on the untouched
    # reference config_hash.json (CoherentPrime): 158.7 -> 114.2 ms/step
    # (probe_r5_verbatim_ab). Identical forward features; backward
    # scatter composition differs at fp32-rounding level only.
    gs = json_value(encoding, "gather_strategy", "auto")
    if gs == "auto":
        gs = (
            "quad"
            if (
                enc.interpolation_type == InterpolationType.Linear
                and not enc.stochastic_interpolation
            )
            else "per_level"
        )
    enc.gather_strategy = gs
    enc.scatter_strategy = json_value(encoding, "scatter_strategy", "auto")
    if enc.scatter_strategy not in (
        "auto", "xla", "xla_pib", "xla_half", "xla_half_sr", "factored",
        "factored_f32", "factored_sr", "factored_kernel",
        "factored_kernel_sr", "factored_fused", "drop",
        "xla_f32_b", "xla_half_b", "xla_half_ob", "xla_half_bb",
    ):
        raise ValueError(
            f"invalid scatter_strategy {enc.scatter_strategy!r}"
        )
    enc.quad_pack = json_value(encoding, "quad_pack", "auto")
    enc.quad_build = json_value(encoding, "quad_build", "auto")
    if enc.quad_build not in ("auto", "view", "flat", "slice", "cf"):
        raise ValueError(f"invalid quad_build {enc.quad_build!r}")
    enc.level_split = json_value(encoding, "level_split", "auto")
    if enc.level_split not in ("auto", "off", "barrier"):
        raise ValueError(f"invalid level_split {enc.level_split!r}")
    enc.table_dtype = json_value(encoding, "table_dtype", "float32")
    if enc.table_dtype not in ("float32", "float16", "bfloat16"):
        raise ValueError(f"invalid table_dtype {enc.table_dtype!r}")
    if enc.gather_strategy == "stratified":
        # The stratified fast path's static tile->cell maps require raster
        # index strides on its levels; which levels those are is part of
        # the encoding function, so it is fixed by config (not by the
        # runtime batch): levels with scale <= (max_variants-1) * strata.
        # Default strata per dim: a 2^18 batch partitioned as 512^2 / 64^3.
        strata = json_value(
            encoding, "strata", 512 if n_dims_to_encode == 2 else 64
        )
        # Default 3 in 2D; 2 in 3D. The 3D window cost is cubic in the
        # window size: variants=3 (raster_max_scale 128, 27 one-hot
        # window shifts on up-to-129^3 dense grids) measured +50 ms/step
        # on the NeRF-scale config (stratified 172.5 vs quad 122.1 ms,
        # probe_3d_locked2), but variants=2 (only scale<=64 levels
        # static, 8 shifts on <=55^3 grids) WINS: 98.9 -> 87.7 ms/step
        # locked-single composed (probe_3d_variants). Explicit configs
        # override.
        enc.stratified_max_variants = json_value(
            encoding,
            "stratified_max_variants",
            3 if n_dims_to_encode == 2 else 2,
        )
        enc.raster_max_scale = float(
            (enc.stratified_max_variants - 1) * strata
        )
        enc.strat_accum = json_value(encoding, "strat_accum", "auto")
        if enc.strat_accum not in ("auto", "select_n", "where"):
            raise ValueError(f"invalid strat_accum {enc.strat_accum!r}")
        enc.locked_rounding = json_value(encoding, "locked_rounding", "pair")
        if enc.locked_rounding not in ("pair", "single", "sr", "f32"):
            raise ValueError(
                f"invalid locked_rounding {enc.locked_rounding!r}"
            )
        enc.locked_phases = int(json_value(encoding, "locked_phases", 1))
        if enc.locked_phases < 1:
            raise ValueError(
                f"locked_phases must be >= 1: {enc.locked_phases}"
            )
        enc.locked_snap_tol = float(
            json_value(encoding, "locked_snap_tol", 1.0)
        )
        if not 0.0 <= enc.locked_snap_tol:
            raise ValueError(
                f"locked_snap_tol must be >= 0: {enc.locked_snap_tol}"
            )
        enc.locked_fwd = json_value(encoding, "locked_fwd", "unpacked")
        if enc.locked_fwd not in ("unpacked", "packed", "csr"):
            raise ValueError(f"invalid locked_fwd {enc.locked_fwd!r}")
        if json_value(encoding, "phase_locked", False):
            # Phase-locked stratified mode: fine hashed levels run with
            # compile-time-static indices (see _apply_phase_lock). Batches
            # must come from stratified_uniform(phase_locked=True).
            enc._apply_phase_lock(strata)
    elif json_value(encoding, "phase_locked", False):
        raise ValueError(
            "phase_locked requires gather_strategy 'stratified'"
        )
    return enc

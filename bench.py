#!/usr/bin/env python
"""Headline benchmark: Instant-NGP-style image fit training throughput.

Protocol mirrors the reference's flagship number (README.md:151-153 /
samples/mlp_learning_an_image.cu): HashGrid (16 levels x 2 features) +
FullyFusedMLP 64x2, RelativeL2, Adam, batch 2^18; metric is trained
samples/second. Baseline: ~2.62e8 samples/s (1000 steps of batch 2^18 in "a
bit over 1 second" on an RTX 4090).

Each timed step includes on-device batch generation and target sampling from
a synthetic 512x512 texture, matching the reference sample's loop structure.

Timing methodology (round 4): the steps are split into --timing-blocks
blocks, each synced with a scalar fetch; the reported number is the MEDIAN
block (tunnel sessions show multi-ms per-block dispersion — one pass cannot
distinguish a regression from a bad session). The default 2D run ALSO
measures `--sampler stratified` back-to-back in the same session and records
it under "secondary" in the same JSON line, so the locked-vs-stratified A/B
is re-established every capture.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/s", "vs_baseline": N,
   "ms_per_step": median, "ms_blocks": [...], "sampler": ...,
   "secondary": {...}}
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

import numpy as np

BASELINE_SAMPLES_PER_SEC = 2.62e8  # RTX 4090, reference README.md:151-153


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=2**18)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--warmup", type=int, default=10)
    parser.add_argument(
        "--timing-blocks",
        type=int,
        default=5,
        help="Split the timed steps into this many synced blocks and "
        "report the MEDIAN block's ms/step (plus all blocks in the JSON) "
        "— single-pass timings over the tunneled TPU cannot distinguish "
        "a real regression from a bad session.",
    )
    parser.add_argument(
        "--no-ab",
        action="store_true",
        help="Skip the secondary back-to-back measurement of the other "
        "sampler (default: a 2d training run also measures stratified "
        "vs the locked default in the same session and records it under "
        "'secondary').",
    )
    parser.add_argument("--width", type=int, default=64)
    parser.add_argument("--hidden", type=int, default=2)
    parser.add_argument("--log2-hashmap", type=int, default=None)
    parser.add_argument("--per-level-scale", type=float, default=1.5)
    parser.add_argument(
        "--protocol",
        choices=["2d", "3d"],
        default="2d",
        help="'2d' = the reference flagship image-fit protocol "
        "(config_hash.json: 2D HashGrid 16x2 @ 2^15 + FFMLP 64x2). "
        "'3d' = the NeRF-scale protocol the reference's marquee "
        "application (Instant-NGP) trains: 3D HashGrid 16x2 @ 2^19 + "
        "FFMLP 64x2, batch 2^18 = 64^3 strata, synthetic density-field "
        "targets. Metric: trained samples/s either way.",
    )
    parser.add_argument(
        "--steps-per-call",
        type=int,
        default=1,
        help="Training steps folded into one dispatch via lax.scan "
        "(>1). MEASURED NEGATIVE on the 2D flagship: ~29 ms/step at "
        "every steps-per-call in {1, 10, 25} vs 23.75 plain — the scan "
        "lowering taxes every iteration ~5 ms and there was no "
        "per-dispatch latency to amortize (the 'device-busy ~10 ms' "
        "figure that motivated it was a lane-double-counting profiler "
        "artifact; see probe_dispatch_gap.py and PLAN.md). Default 1 = "
        "plain one-dispatch-per-step (no scan wrapper).",
    )
    parser.add_argument(
        "--serving",
        action="store_true",
        help="Measure SERVING throughput instead of training: "
        "trainer.freeze_serving() (prebuilt quad tables) rendering the "
        "1024^2 raster, pipelined x16. Prints the serving JSON line "
        "(metric: flagship_serving_throughput_raster1024_frozen). "
        "Baseline: the reference's fully-fused inference protocol "
        "(benchmarks/mlp/bench_mlp_ours.cu:64-137, ~1e9-class elem/s).",
    )
    parser.add_argument(
        "--serving-dtype",
        choices=["float32", "bfloat16"],
        default="float32",
        help="Storage dtype of the PREBUILT serving tables (serve-time "
        "only; training/live inference untouched). bfloat16 trades one "
        "table-read rounding (~0.4%% rel) for smaller gather traffic "
        "(the emitter charges per row, so the win is small; see "
        "serving.FrozenServer).",
    )
    parser.add_argument(
        "--sort-batch",
        action="store_true",
        help="Morton-sort each batch before the step (same training "
        "semantics — a batch is a set; improves hash-lookup locality)",
    )
    parser.add_argument(
        "--sampler",
        choices=["stratified", "phase_locked", "iid"],
        default=None,
        help="Batch sampler: 'stratified' draws one jittered uniform sample "
        "per raster tile (variance-reduced; enables the gather-free static "
        "path on coarse grid levels), 'phase_locked' shares --locked-phases "
        "jitter vectors per batch (additionally enables compile-time-static "
        "fine levels — no scatter emitter at all; PLAN.md round 3), 'iid' "
        "matches the reference's curand-uniform loop exactly. Default: "
        "stratified in 2D (the round-4 flagship mode: reference-exact "
        "geometry + stochastically-rounded one-matmul scatter + EMA — "
        "21.9 ms at 53.2 dB on the 1000-step golden), phase_locked for "
        "--protocol 3d (static-CSR fine levels win at NeRF scale), "
        "stratified for --serving (the mode the committed serving "
        "artifact was measured with).",
    )
    parser.add_argument(
        "--locked-rounding",
        default=None,
        choices=["pair", "single", "sr", "f32"],
        help="Gradient-contribution rounding of the phase-locked CSR "
        "scatter. Protocol defaults: pair in 2D (beats single composed "
        "at flagship scale, round-3 queue 7), SINGLE in 3D (one bf16 "
        "pass = the reference's half grad_t regime, grid.h:660-671; "
        "measured ~7 ms/step faster at NeRF scale, probe_3d_final).",
    )
    parser.add_argument(
        "--locked-fwd",
        default=None,
        choices=["unpacked", "packed", "csr"],
        help="Locked-level forward form: 'packed' gathers compact "
        "(B,128) packed rows + KxK constant one-hot slot select "
        "(avoids the unpacked gather's lane-padded output); 'csr' "
        "routes the lookup around the gather emitter entirely via the "
        "backward's static-CSR bucket one-hot matmuls (table "
        "pair-rounded to bf16, ~3e-6 rel).",
    )
    parser.add_argument(
        "--ema",
        type=float,
        default=None,
        help="Wrap the optimizer in EMA with this decay (0 = off). "
        "Inference/serving then run on the averaged weights — the "
        "reference's optimizers/ema.h. EMA averages sampler/rounding "
        "dither across steps: it lifts the stratified golden 47.3 -> "
        "53.2 dB and the locked golden to 51.6 dB at ~zero step cost. "
        "Default: 0.99 for the stratified/phase_locked samplers, 0 for "
        "iid and --serving (the committed serving artifact's program).",
    )
    parser.add_argument(
        "--locked-phases",
        type=int,
        default=1,
        help="Jitter phases per batch with --sampler phase_locked. Pair "
        "with --ema 0.99: locked G=1 + EMA measured 50.1 dB on the "
        "image-fit golden (above the 47+ band) at full locked speed; "
        "without EMA the phase-dither equilibrium spans 39-45 dB.",
    )
    parser.add_argument(
        "--stratified-variants",
        type=int,
        default=None,
        help="Max per-dim window size of the stratified static path "
        "(levels needing more fall back to quad rows). Default: the "
        "config-layer default (3 in 2D; 2 in 3D — 2-wide windows on "
        "<=55^3 grids win there, while variants=3's 27 window shifts "
        "measured +50 ms/step; probe_3d_variants).",
    )
    parser.add_argument(
        "--gather-strategy",
        default=None,
        help="Override the HashGrid gather strategy (default: 'stratified' "
        "with the stratified sampler, 'quad' otherwise).",
    )
    parser.add_argument(
        "--scatter-strategy",
        default=None,
        help="Override the HashGrid scatter strategy (default: "
        "'factored_sr' for the 2D stratified primary — ONE bf16 MXU "
        "matmul per fine level with value-hashed stochastic rounding, "
        "the precision class of the reference's half grad_t atomics "
        "(grid.h:660-671); EMA recovers the rounding dither (golden "
        "53.2 dB vs the fp32-exact pair's 53.2). 'auto' (= the "
        "fp32-exact compensated pair on fine levels) everywhere else; "
        "also 'factored_fused', 'xla_half', 'xla'.",
    )
    parser.add_argument(
        "--table-dtype",
        default=None,
        help="Forward lookup-table storage dtype override "
        "('float16'/'bfloat16'; default f32).",
    )
    parser.add_argument(
        "--quad-build",
        default=None,
        choices=["view", "flat", "slice", "cf"],
        help="Quad-table build form (see encodings/grid.py _quad_table; "
        "'slice' = per-level 1D slice + one reshape — no global padded "
        "(N,F) view; 'cf' = channel-first never-padded build from 1D "
        "feature-plane rolls).",
    )
    parser.add_argument(
        "--layout",
        default=None,
        choices=["rm", "cf"],
        help="FFMLP in-kernel activation layout override (see "
        "ops/ffmlp.DEFAULT_LAYOUT).",
    )
    parser.add_argument(
        "--strat-accum",
        default=None,
        choices=["select_n", "where"],
        help="Static-path variant accumulation (grid.py _stratified_feats):"
        " 'select_n' (one n_var^d-way select; the auto) vs 'where' (the"
        " pre-round-4 sequential where-chain).",
    )
    parser.add_argument(
        "--level-split",
        default=None,
        choices=["auto", "off"],
        help="Per-level parameter split with a one-concat gradient "
        "assembly (encodings/grid.py _split_levels; round 4). Default "
        "'auto' (on); 'off' restores per-level flat-vector adjoints.",
    )
    parser.add_argument(
        "--split-state",
        choices=["auto", "on", "off"],
        default="auto",
        help="Carry the grid's per-level tables as separate training-"
        "state buffers (Trainer(split_grid_state=True)): no global "
        "params view in the step. Bit-identical. 'auto' = on for the "
        "3d protocol (driver-command capture 65.78 vs 67.2 ms/step, "
        "_r5q8_bench_3d_split.json), off for 2d (measured neutral).",
    )
    parser.add_argument(
        "--reference-verbatim",
        action="store_true",
        help="Run /root/reference/data/config_hash.json EXACTLY as "
        "shipped: the untouched JSON (CoherentPrime hash, no tcnn_tpu "
        "extension knobs — the package's own defaults pick the "
        "execution strategy) with iid uniform batches and no EMA — what "
        "a drop-in reference user gets. Overrides sampler/ema/strategy "
        "flags; metric name gains the _refverbatim suffix.",
    )
    return parser


def build_config(args, sampler, ema, scatter=None):
    """Flagship config for one sampler mode (exact protocol parity with the
    reference's data/config_hash.json: Adam beta2=0.99/eps=1e-15/l2=1e-6).
    ``scatter`` overrides the scatter strategy for THIS config only (used
    by main() to give the 2D stratified primary its factored_sr default
    without leaking it into the phase-locked secondary's program)."""
    scatter = scatter if scatter is not None else args.scatter_strategy
    adam = {
        "otype": "Adam",
        "learning_rate": 1e-2,
        "beta1": 0.9,
        "beta2": 0.99,
        "epsilon": 1e-15,
        "l2_reg": 1e-6,
    }
    if getattr(args, "reference_verbatim", False):
        # data/config_hash.json byte-for-byte (comments/formatting aside):
        # no hash/gather/scatter/quad-build/EMA knobs — the package's own
        # config-layer defaults decide the execution strategy, exactly as
        # they would for a drop-in reference user.
        return {
            "loss": {"otype": "RelativeL2"},
            "optimizer": adam,
            "encoding": {
                "otype": "HashGrid",
                "n_levels": 16,
                "n_features_per_level": 2,
                "log2_hashmap_size": 15,
                "base_resolution": 16,
                "per_level_scale": 1.5,
                "fixed_point_pos": False,
            },
            "network": {
                "otype": "FullyFusedMLP",
                "activation": "ReLU",
                "output_activation": "None",
                "n_neurons": 64,
                "n_hidden_layers": 2,
            },
        }
    return {
        "loss": {"otype": "RelativeL2"},
        "optimizer": (
            {"otype": "EMA", "decay": ema, "nested": adam} if ema else adam
        ),
        "encoding": {
            "otype": "HashGrid",
            "n_levels": 16,
            "n_features_per_level": 2,
            "log2_hashmap_size": args.log2_hashmap,
            "base_resolution": 16,
            "per_level_scale": args.per_level_scale,
            # TPU-native fast path: additive coherent hash + quad-row
            # gathers on fine levels, gather-free static path on coarse
            # levels for stratified batches (see PLAN.md).
            "hash": "CoherentAdditive",
            "gather_strategy": args.gather_strategy
            or (
                "stratified"
                if sampler in ("stratified", "phase_locked")
                else "quad"
            ),
            **(
                {"stratified_max_variants": args.stratified_variants}
                if args.stratified_variants is not None
                else {}
            ),
            **(
                {
                    "phase_locked": True,
                    "locked_phases": args.locked_phases,
                    **(
                        {"locked_rounding": args.locked_rounding}
                        if args.locked_rounding
                        else {}
                    ),
                    **(
                        {"locked_fwd": args.locked_fwd}
                        if args.locked_fwd
                        else {}
                    ),
                }
                if sampler == "phase_locked"
                else {}
            ),
            **(
                {"scatter_strategy": scatter}
                if scatter
                else {}
            ),
            **(
                {"table_dtype": args.table_dtype} if args.table_dtype else {}
            ),
            **(
                {"quad_build": args.quad_build} if args.quad_build else {}
            ),
            **(
                {"level_split": args.level_split} if args.level_split else {}
            ),
            **(
                {"strat_accum": args.strat_accum} if args.strat_accum else {}
            ),
        },
        "network": {
            "otype": "FullyFusedMLP",
            "activation": "ReLU",
            "output_activation": "None",
            "n_neurons": args.width,
            "n_hidden_layers": args.hidden,
            **({"layout": args.layout} if args.layout else {}),
        },
    }


def timed_blocks(run_block, state, keys_blocks, n_steps_per_block):
    """Run the warm state through len(keys_blocks) timing blocks, each
    synced with a scalar fetch; returns (state, [ms_per_step per block])."""
    ms = []
    for ks in keys_blocks:
        t0 = time.perf_counter()
        state, loss = run_block(state, ks)
        _ = float(loss)  # full sync; block_until_ready is lazy over tunnel
        ms.append((time.perf_counter() - t0) / n_steps_per_block * 1e3)
    return state, ms


def measure_training(args, sampler, ema, image_np=None, scatter=None):
    """One full training-throughput measurement for one sampler config.
    Returns a dict with the median-block throughput + per-block ms."""
    import jax
    import jax.numpy as jnp

    import tcnn_tpu as tc
    from tcnn_tpu.utils.sampling import stratified_uniform

    n_dims = 2 if args.protocol == "2d" else 3
    model = tc.create_from_config(
        n_dims, 3, build_config(args, sampler, ema, scatter),
        split_grid_state=resolve_split_state(args),
    )
    trainer = model.trainer

    res = 512
    image_dev = (
        jnp.asarray(image_np) if image_np is not None else None
    )

    def make_batch(key):
        if sampler in ("stratified", "phase_locked"):
            x = stratified_uniform(
                key, args.batch, n_dims,
                phase_locked=(
                    args.locked_phases
                    if sampler == "phase_locked"
                    else False
                ),
            )
        else:
            x = jax.random.uniform(key, (args.batch, n_dims), jnp.float32)
        return x

    if args.protocol == "3d":
        # NeRF-scale protocol: synthetic smooth density/color field
        # evaluated analytically per sample (3 fused trig ops on the
        # (B, 3) batch — negligible next to the encoding).
        def bench_step(state, key, img):
            x = make_batch(key)
            t = jnp.stack(
                [
                    0.5 + 0.5 * jnp.sin(6 * jnp.pi * x[:, 0])
                    * jnp.cos(4 * jnp.pi * x[:, 1]),
                    0.5 + 0.5 * jnp.cos(5 * jnp.pi * (x[:, 1] + x[:, 2])),
                    0.5 + 0.5 * jnp.sin(3 * jnp.pi * x[:, 0] * x[:, 2] * 2),
                ],
                axis=-1,
            )
            # Materialize (x, t) ONCE before the step. Without this
            # barrier XLA fuses/recomputes the cheap generator expression
            # into its many consumers across the 16 grid levels, with
            # layout conversions at each site — a measured ~53 ms/step
            # composed tax at this shape (probe_r4_gap: 77.0 ms with x/t
            # as args vs 130.5 ms in-graph). The barrier restores the
            # as-args program while keeping generation on-device in the
            # timed region (same protocol semantics).
            x, t = jax.lax.optimization_barrier((x, t))
            return trainer._step_impl(state, x, t, None)

    else:

        def bench_step(state, key, img):
            xy = make_batch(key)
            if args.sort_batch:
                # Morton-order the batch (a batch is a set — the loss and
                # the update are permutation-invariant) so grid lookups of
                # nearby samples hit nearby table rows.
                q = (xy * 1024).astype(jnp.uint32)
                key_bits = jnp.zeros(xy.shape[0], jnp.uint32)
                for b in range(10):
                    key_bits = (
                        key_bits
                        | (((q[:, 0] >> b) & 1) << (2 * b))
                        | (((q[:, 1] >> b) & 1) << (2 * b + 1))
                    )
                xy = xy[jnp.argsort(key_bits)]
            if (
                sampler in ("stratified", "phase_locked")
                and args.batch == res * res
            ):
                # Stratified tiles coincide with pixels (strata == res): the
                # nearest-pixel target of sample j is EXACTLY pixel j.
                target = img.reshape(res * res, 3)
            else:
                ij = jnp.clip((xy * res).astype(jnp.int32), 0, res - 1)
                # Flat promise_in_bounds lookup: default-mode 2D indexing
                # takes XLA's bounds-checked gather (~1000x slower on TPU).
                flat = ij[:, 1] * res + ij[:, 0]
                target = img.reshape(res * res, 3).at[flat].get(
                    mode="promise_in_bounds"
                )
            return trainer._step_impl(state, xy, target, None)

    spc = max(1, args.steps_per_call)
    k = max(1, args.timing_blocks)
    # Round the step count so it divides evenly into k blocks of whole
    # scan dispatches.
    steps_per_block = max(spc, (args.steps // k) // spc * spc)
    n_steps = steps_per_block * k
    n_warm_blocks = max(1, -(-args.warmup // spc))

    if spc == 1:
        # Plain one-dispatch-per-step. Do NOT wrap single steps in a
        # length-1 lax.scan: the scan lowering taxes the composed step
        # (~5 ms/step at 2D flagship scale, tens of ms at 3D state sizes
        # — it was what --steps-per-call measured negative, and a
        # scan-wrapped "spc=1" silently re-measures that tax; caught when
        # the round-4 capture read 30.2 ms vs the 23.75 plain claim).
        # Plain jit, no donation — byte-identical program to the round-3
        # claim runs (donation is composed-neutral, probe_3d_donate).
        step_jit = jax.jit(bench_step)

        def run_block(state, ks, _img=image_dev):
            loss = None
            for j in range(ks.shape[0]):
                state, loss = step_jit(state, ks[j, 0], _img)
            return state, loss

    else:

        @jax.jit
        def bench_block(state, ks, img):
            def body(st, kk):
                return bench_step(st, kk, img)

            return jax.lax.scan(body, state, ks)

        def run_block(state, ks, _img=image_dev):
            # One timing block = steps_per_block/spc dispatches.
            loss = None
            for j in range(ks.shape[0]):
                state, losses = bench_block(state, ks[j], _img)
                loss = losses[-1]
            return state, loss

    state = trainer.state
    total = n_warm_blocks * spc + n_steps
    keys = jax.random.split(jax.random.PRNGKey(0), total)
    warm_keys = keys[: n_warm_blocks * spc].reshape(n_warm_blocks, 1, spc, 2)
    timed_keys = keys[n_warm_blocks * spc:].reshape(
        k, steps_per_block // spc, spc, 2
    )

    for i in range(n_warm_blocks):
        state, loss = run_block(state, warm_keys[i])
    _ = float(loss)

    state, ms_blocks = timed_blocks(run_block, state, timed_keys,
                                    steps_per_block)
    median_ms = statistics.median(ms_blocks)
    return {
        "sampler": sampler,
        "ema": ema,
        "scatter": scatter or args.scatter_strategy or "auto",
        "ms_per_step": round(median_ms, 3),
        "ms_blocks": [round(m, 3) for m in ms_blocks],
        "samples_per_sec": round(args.batch / median_ms * 1e3, 1),
        "final_loss": float(loss),
    }


def resolve_split_state(args) -> bool:
    """'auto' = split state on for the 3d protocol (65.78 vs 67.2
    ms/step, driver-command capture), off for 2d (neutral) — and off
    whenever the gather strategy is a global-table one (fused/
    quad_fused), which the split state cannot express."""
    mode = getattr(args, "split_state", "auto")
    if mode == "auto":
        return args.protocol == "3d" and getattr(
            args, "gather_strategy", None
        ) not in ("fused", "quad_fused")
    return mode == "on"


def resolve_mode_defaults(args):
    """Resolve the per-protocol mode defaults in place; returns
    (explicit_sampler, primary_scatter).

    Flagship fast mode (PLAN.md round 4 session 5): stratified sampler
    (reference-exact geometry — no scale snapping) + factored_sr scatter
    (ONE bf16 MXU matmul per fine level, stochastic rounding = the
    precision class of the reference's half grad_t atomics) + EMA(0.99)
    (the reference's optimizers/ema.h; averages the rounding dither
    across steps) — 21.5-21.9 ms/step at 53.23 dB on the 1000-step
    golden, vs the round-3 phase-locked default's 21.9-22.1 ms at
    51.6 dB. 3D keeps the phase-locked static-CSR default (wins at NeRF
    scale). Serving keeps the stratified/no-EMA config the committed
    serving artifact was measured with (the sampler never runs at
    serving time; only the encoding-config cache key depends on it).
    The factored_sr default applies to the 2D stratified PRIMARY only
    (returned separately, not written to args.scatter_strategy) so it
    never leaks into the phase-locked secondary's program.
    """
    if getattr(args, "reference_verbatim", False):
        if args.protocol != "2d":
            raise SystemExit("--reference-verbatim is the 2d protocol")
        args.sampler = "iid"
        args.ema = 0.0
        args.log2_hashmap = 15
        return True, None  # explicit sampler (no secondary A/B)
    explicit_sampler = args.sampler is not None
    if args.sampler is None:
        args.sampler = (
            "stratified"
            if (args.serving or args.protocol == "2d")
            else "phase_locked"
        )
    if args.ema is None:
        args.ema = (
            0.0
            if (args.serving or args.sampler == "iid")
            else 0.99
        )
    primary_scatter = args.scatter_strategy
    if (
        primary_scatter is None
        and args.protocol == "2d"
        and args.sampler == "stratified"
        and not args.serving
    ):
        primary_scatter = "factored_sr"
    if args.log2_hashmap is None:
        args.log2_hashmap = 15 if args.protocol == "2d" else 19
    if args.locked_rounding is None and args.protocol == "3d":
        # 3D protocol default: single bf16 gradient pass — the
        # reference's own half-precision grid-gradient regime
        # (grid.h:660-671) and ~7 ms/step faster at NeRF scale than the
        # compensated pair (probe_3d_final round 3; pair stays the 2D
        # default where it wins composed).
        args.locked_rounding = "single"
    return explicit_sampler, primary_scatter


def main():
    args = build_parser().parse_args()
    explicit_sampler, primary_scatter = resolve_mode_defaults(args)

    import os

    import jax

    if os.environ.get("TCNN_BENCH_FORCE_CPU"):
        # Smoke-testing knob: numbers are meaningless off-TPU. (env
        # JAX_PLATFORMS alone does not work here — sitecustomize pins the
        # axon platform via jax.config; see CLAUDE.md.)
        jax.config.update("jax_platforms", "cpu")

    # Persistent compile cache: the flagship step takes many minutes to
    # compile on the remote-compile service; repeat runs hit the disk cache.
    from pathlib import Path as _P

    cache_dir = _P(__file__).resolve().parent / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.serving:
        import jax.numpy as jnp

        import tcnn_tpu as tc

        if args.protocol != "2d":
            raise SystemExit("--serving is defined for the 2d protocol only")
        # Serving protocol: FrozenServer (prebuilt quad tables,
        # device-resident) rendering the 1024^2 tile-center raster,
        # pipelined — the production novel-view/serving shape. The
        # reference's serving headline is the fully-fused inference
        # protocol (benchmarks/mlp/bench_mlp_ours.cu:64-137), ~1e9-class.
        model = tc.create_from_config(
            2, 3, build_config(args, args.sampler, args.ema)
        )
        server = model.trainer.freeze_serving(
            table_dtype=(
                None if args.serving_dtype == "float32" else args.serving_dtype
            )
        )
        side = 1024
        n = side * side
        y = server.raster((side, side))
        _ = float(y.ravel()[0])  # warm + sync
        reps = 16
        k = max(1, args.timing_blocks)
        ms_blocks = []
        for _b in range(k):
            t0 = time.perf_counter()
            outs = [server.raster((side, side)) for _ in range(reps)]
            _ = float(outs[-1].ravel()[0])
            ms_blocks.append((time.perf_counter() - t0) / reps * 1e3)
        ms = statistics.median(ms_blocks)
        samples_per_sec = n / ms * 1e3
        result = {
            "metric": "flagship_serving_throughput_raster1024_frozen",
            "value": round(samples_per_sec, 1),
            "unit": "samples/s",
            "vs_baseline": round(samples_per_sec / 1e9, 4),
            "ms_per_raster": round(ms, 3),
            "ms_blocks": [round(m, 3) for m in ms_blocks],
        }
        print(json.dumps(result))
        print(
            f"# serving {ms:.3f} ms per 1024^2 raster, "
            f"backend={jax.default_backend()}",
            file=sys.stderr,
        )
        return

    image_np = None
    if args.protocol == "2d":
        # Synthetic "image": smooth multi-frequency texture, sampled
        # nearest. Passed as an explicit jit argument — closure-captured
        # device arrays are inlined as constants at lowering time, which
        # forces a device->host fetch (randomly stalls over the tunnel)
        # and bloats the compile-cache key.
        res = 512
        yy, xx = np.meshgrid(
            np.linspace(0, 1, res), np.linspace(0, 1, res), indexing="ij"
        )
        image_np = np.stack(
            [
                0.5 + 0.5 * np.sin(8 * np.pi * xx) * np.cos(6 * np.pi * yy),
                0.5 + 0.5 * np.cos(4 * np.pi * (xx + yy)),
                0.5 + 0.5 * np.sin(2 * np.pi * xx * yy * 4),
            ],
            axis=-1,
        ).astype(np.float32)

    primary = measure_training(
        args, args.sampler, args.ema, image_np, scatter=primary_scatter
    )

    secondary = None
    if args.protocol == "2d" and not args.no_ab and not explicit_sampler:
        # Back-to-back A/B in the SAME session (VERDICT r3 next-2 — one
        # captured number per mode, same tunnel conditions): the
        # stratified-SR primary vs the round-3 phase-locked static-CSR
        # mode (its program unchanged: auto scatter, EMA 0.99).
        secondary = measure_training(
            args, "phase_locked", 0.99, image_np,
            scatter=args.scatter_strategy,
        )

    metric = (
        "image_fit_training_throughput_hashgrid16x2_ffmlp64x2_b2^18"
        if args.protocol == "2d"
        else "nerf3d_training_throughput_hashgrid16x2_ffmlp64x2_b2^18"
    )
    if getattr(args, "reference_verbatim", False):
        metric += "_refverbatim"
    result = {
        "metric": metric,
        "value": primary["samples_per_sec"],
        "unit": "samples/s",
        "vs_baseline": round(
            primary["samples_per_sec"] / BASELINE_SAMPLES_PER_SEC, 4
        ),
        "sampler": primary["sampler"],
        "scatter": primary["scatter"],
        "ema": primary["ema"],
        "ms_per_step": primary["ms_per_step"],
        "ms_blocks": primary["ms_blocks"],
    }
    if secondary is not None:
        result["secondary"] = {
            "sampler": secondary["sampler"],
            "scatter": secondary["scatter"],
            "ema": secondary["ema"],
            "ms_per_step": secondary["ms_per_step"],
            "ms_blocks": secondary["ms_blocks"],
            "samples_per_sec": secondary["samples_per_sec"],
            "vs_baseline": round(
                secondary["samples_per_sec"] / BASELINE_SAMPLES_PER_SEC, 4
            ),
        }
    print(json.dumps(result))
    print(
        f"# {primary['ms_per_step']:.3f} ms/step (median of "
        f"{len(primary['ms_blocks'])} blocks: {primary['ms_blocks']}), "
        f"final loss {primary['final_loss']:.3e}, "
        f"backend={jax.default_backend()}",
        file=sys.stderr,
    )
    if secondary is not None:
        print(
            f"# secondary [{secondary['sampler']}]: "
            f"{secondary['ms_per_step']:.3f} "
            f"ms/step (blocks: {secondary['ms_blocks']}), final loss "
            f"{secondary['final_loss']:.3e}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()

"""bench.py mode-default resolution — the protocol contract the driver
and the README numbers depend on (PLAN.md round-4 session 5).

Pure argparse/logic test: no models are built, no device is touched
(bench.py imports jax lazily inside main/measure functions).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def resolve(argv):
    args = bench.build_parser().parse_args(argv)
    explicit_sampler, primary_scatter = bench.resolve_mode_defaults(args)
    return args, explicit_sampler, primary_scatter


def test_2d_default_is_stratified_sr_ema():
    args, explicit, scatter = resolve([])
    assert args.sampler == "stratified"
    assert args.ema == 0.99
    assert scatter == "factored_sr"
    assert args.log2_hashmap == 15
    assert not explicit


def test_2d_default_scatter_not_leaked_into_args():
    # The SR default is primary-only: the phase-locked secondary builds
    # from args.scatter_strategy, which must stay None (-> grid 'auto').
    args, _, _ = resolve([])
    assert args.scatter_strategy is None


def test_3d_default_is_locked_single():
    args, _, scatter = resolve(["--protocol", "3d"])
    assert args.sampler == "phase_locked"
    assert args.ema == 0.99
    assert args.locked_rounding == "single"
    assert args.log2_hashmap == 19
    assert scatter is None  # grid 'auto' (the 3D locked CSR path)


def test_serving_keeps_artifact_program():
    # The committed serving artifact was measured with the stratified
    # no-EMA, auto-scatter config; the defaults must not drift it.
    args, _, scatter = resolve(["--serving"])
    assert args.sampler == "stratified"
    assert args.ema == 0.0
    assert scatter is None


def test_explicit_flags_win():
    args, explicit, scatter = resolve(
        ["--sampler", "stratified", "--scatter-strategy", "auto",
         "--ema", "0"]
    )
    assert explicit
    assert args.ema == 0.0
    assert scatter == "auto"  # the fp32-exact pair mode


def test_split_state_auto_respects_fused_gather():
    import bench

    p = bench.build_parser()
    assert bench.resolve_split_state(p.parse_args(["--protocol", "3d"]))
    assert not bench.resolve_split_state(p.parse_args([]))
    # fused/quad_fused gather strategies can't express the split state:
    # auto must fall back to off instead of crashing at construction.
    assert not bench.resolve_split_state(
        p.parse_args(["--protocol", "3d", "--gather-strategy",
                      "quad_fused"])
    )
    assert not bench.resolve_split_state(
        p.parse_args(["--protocol", "3d", "--split-state", "off"])
    )


def test_iid_has_no_ema():
    args, _, _ = resolve(["--sampler", "iid"])
    assert args.ema == 0.0

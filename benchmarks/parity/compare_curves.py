#!/usr/bin/env python
"""One-command convergence-parity comparator: our loss curve vs a
reference-side run.

No CUDA box exists in this environment, so reference-executed numbers
cannot be produced here; this harness is the committed contract so that the
day a reference run IS obtainable, the comparison is one command:

    python benchmarks/parity/compare_curves.py OURS THEIRS \
        [--tail 0.5] [--rae 0.5] [--psnr-tol 1.0]

Accepted curve formats (auto-detected):
  1. tcnn_tpu golden metrics.json — ``{"loss_curve": [[step, loss], ...],
     "psnr_db": ...}`` (written by ``samples/mlp_learning_an_image.py
     IMAGE CONFIG STEPS OUTDIR`` — the albert.jpg / config_hash protocols).
  2. bare curve JSON — ``{"steps": [...], "loss": [...]}`` (optionally
     ``"psnr_db"``).
  3. reference sample stdout — lines ``Step#N: loss=X time=Y[µs]`` as
     printed by the CUDA ``mlp_learning_an_image`` app (reference:
     samples/mlp_learning_an_image.cu:283); pipe the app's output to a
     file and pass it directly. NOTE the reference prints a RUNNING MEAN
     of the loss sampled every min(interval, 100) steps, and its print
     interval grows 10x per print — comparisons are therefore made on the
     matched/interpolated tail, where both curves are near their plateau
     and the running mean ~= the instantaneous loss.

Methodology mirrors the reference's own cross-implementation matcher
(reference: tests/test_common.h:59-122): symmetric relative absolute error
``2|a-b| / (|a|+|b|)`` with a mean-over-tail acceptance (grid-encoding
training is piecewise-constant in its gradients and the two runs use
different RNG streams, so elementwise matching is meaningless — the curve
SHAPE and the final plateau are the parity claim). Default tolerances:
mean tail RAE <= 0.5 (loss within ~1.7x at matched steps) and final PSNR
within 1.0 dB; tighten with flags for same-RNG reruns of our own code.

Exit code 0 = parity holds, 1 = mismatch, 2 = unusable inputs.
"""

from __future__ import annotations

import argparse
import json
import math
import re
import sys
from pathlib import Path

_STEP_RE = re.compile(r"Step#(\d+):\s*loss=([0-9.eE+-]+|nan|inf)")


def load_curve(path: str):
    """Returns (steps list, losses list, psnr_db or None)."""
    text = Path(path).read_text()
    stripped = text.lstrip()
    if stripped.startswith("{"):
        obj = json.loads(text)
        if "loss_curve" in obj:
            steps = [int(s) for s, _ in obj["loss_curve"]]
            losses = [float(v) for _, v in obj["loss_curve"]]
        elif "steps" in obj and "loss" in obj:
            steps = [int(s) for s in obj["steps"]]
            losses = [float(v) for v in obj["loss"]]
        else:
            raise ValueError(
                f"{path}: JSON has neither 'loss_curve' nor 'steps'+'loss'"
            )
        psnr = obj.get("psnr_db")
        return steps, losses, (float(psnr) if psnr is not None else None)
    # reference app stdout
    steps, losses = [], []
    for m in _STEP_RE.finditer(text):
        steps.append(int(m.group(1)))
        losses.append(float(m.group(2)))
    if not steps:
        raise ValueError(f"{path}: no JSON object and no 'Step#N: loss=' lines")
    return steps, losses, None


def interp_log_loss(steps, losses, at_step):
    """Piecewise-linear interpolation of log(loss) in step; clamps to the
    curve's endpoints. Loss curves are ~power-law decays, so log-space
    interpolation is the faithful one."""
    if at_step <= steps[0]:
        return losses[0]
    if at_step >= steps[-1]:
        return losses[-1]
    for i in range(1, len(steps)):
        if steps[i] >= at_step:
            s0, s1 = steps[i - 1], steps[i]
            l0, l1 = losses[i - 1], losses[i]
            t = (at_step - s0) / max(s1 - s0, 1)
            if l0 > 0 and l1 > 0:
                return math.exp(
                    (1 - t) * math.log(l0) + t * math.log(l1)
                )
            return (1 - t) * l0 + t * l1
    return losses[-1]


def rae(a: float, b: float) -> float:
    denom = abs(a) + abs(b)
    return 0.0 if denom == 0 else 2.0 * abs(a - b) / denom


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Loss-curve convergence parity check (RAE over the tail)"
    )
    ap.add_argument("ours", help="our metrics.json / curve JSON")
    ap.add_argument("theirs", help="reference-side curve (JSON or app stdout)")
    ap.add_argument(
        "--tail",
        type=float,
        default=0.5,
        help="fraction of the step range (from the end) to compare on "
        "(default 0.5 — the plateau half)",
    )
    ap.add_argument(
        "--rae",
        type=float,
        default=0.5,
        help="max mean symmetric RAE over the tail (default 0.5)",
    )
    ap.add_argument(
        "--psnr-tol",
        type=float,
        default=1.0,
        help="max |PSNR difference| in dB when both sides report psnr_db",
    )
    args = ap.parse_args(argv)

    try:
        s_a, l_a, psnr_a = load_curve(args.ours)
        s_b, l_b, psnr_b = load_curve(args.theirs)
    except (ValueError, OSError, json.JSONDecodeError) as e:
        print(f"ERROR: {e}", file=sys.stderr)
        return 2

    lo = max(min(s_a), min(s_b))
    hi = min(max(s_a), max(s_b))
    if hi <= lo:
        print(
            f"ERROR: step ranges do not overlap (ours {min(s_a)}..{max(s_a)}, "
            f"theirs {min(s_b)}..{max(s_b)})",
            file=sys.stderr,
        )
        return 2
    tail_lo = hi - args.tail * (hi - lo)
    # Evaluate at OUR recorded steps inside the tail (plus the common
    # endpoint), interpolating the reference curve.
    eval_steps = sorted({s for s in s_a if tail_lo <= s <= hi} | {hi})

    errs = []
    print(f"{'step':>8} {'ours':>12} {'theirs':>12} {'RAE':>8}")
    for s in eval_steps:
        va = interp_log_loss(s_a, l_a, s)
        vb = interp_log_loss(s_b, l_b, s)
        e = rae(va, vb)
        errs.append(e)
        print(f"{s:>8} {va:>12.4e} {vb:>12.4e} {e:>8.3f}")
    mean_rae = sum(errs) / len(errs)

    ok = mean_rae <= args.rae
    print(
        f"tail [{tail_lo:.0f}, {hi}] mean RAE {mean_rae:.3f} "
        f"(tolerance {args.rae}) -> {'OK' if ok else 'FAIL'}"
    )
    if psnr_a is not None and psnr_b is not None:
        d = abs(psnr_a - psnr_b)
        psnr_ok = d <= args.psnr_tol
        ok = ok and psnr_ok
        print(
            f"PSNR ours {psnr_a:.2f} dB vs theirs {psnr_b:.2f} dB "
            f"(|d| {d:.2f} <= {args.psnr_tol}) -> "
            f"{'OK' if psnr_ok else 'FAIL'}"
        )
    print("PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

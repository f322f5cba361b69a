#!/usr/bin/env python
"""Quality attribution round 2: EMA-across-steps + the fixed f32 mode.

probe_quality_ab landed: A snapped-unlocked = 47.54 dB (snapping is
innocent), B locked-f32 = 37.80 dB (exposed the MXU default-precision
f32->bf16 truncation bug in the CSR einsum — fixed with HIGHEST).
Remaining hypothesis for the locked-pair gap (44.2 vs 47.5): with one
(or few) phases per step, each step's gradient pulls the fit to THAT
phase exactly; the constant-lr equilibrium dithers between phases with
variance per-sample jitter would average away WITHIN a step. If so,
averaging across steps instead — the EMA optimizer wrapper the
reference itself ships (optimizers/ema.h; inference runs on the
averaged weights) — should recover the band without giving up the
locked speed.

  E: locked-pair G=1 + EMA(0.99)   (~100-step averaging window)
  F: locked-pair G=8 + EMA(0.99)   (phases x steps averaging)
  G: locked-f32  G=1 (post-HIGHEST-fix re-measure; also times HIGHEST)
  H: stratified default + EMA(0.99) (control: does EMA alone move the
     unlocked golden? guards against attributing a generic EMA gain to
     the locked equilibrium)

Run ON TPU: python -u benchmarks/probe_quality_ab2.py > _quality_ab2.txt 2>&1
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, str(Path(__file__).resolve().parent))
from probe_quality_ab import fit  # noqa: E402 — shares the golden-fit loop

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "samples"))
from mlp_learning_an_image import DEFAULT_CONFIG  # noqa: E402


def with_ema(cfg, decay=0.99):
    cfg = json.loads(json.dumps(cfg))
    cfg["optimizer"] = {
        "otype": "EMA", "decay": decay, "nested": cfg["optimizer"],
    }
    return cfg


def locked(cfg, G=1, **enc):
    cfg = json.loads(json.dumps(cfg))
    cfg["encoding"].update(
        {"phase_locked": True, "locked_phases": G, **enc}
    )
    return cfg


def main():
    print("backend:", jax.default_backend(), flush=True)
    fit("E locked-pair G=1 +EMA.99", with_ema(locked(DEFAULT_CONFIG)),
        locked_phases=1)
    fit("F locked-pair G=8 +EMA.99",
        with_ema(locked(DEFAULT_CONFIG, G=8)), locked_phases=8)
    fit("G locked-f32fixed G=1",
        locked(DEFAULT_CONFIG, locked_rounding="f32"), locked_phases=1)
    fit("H stratified +EMA.99 (control)", with_ema(DEFAULT_CONFIG))
    print("PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()

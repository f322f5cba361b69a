#!/usr/bin/env python
"""Attribute the phase-locked PSNR gap (44.2-45.0 dB vs the 47+ band).

G=8 phases recovered almost nothing (44.97 vs 44.22 dB at G=1), so
per-step jitter diversity is NOT the main quality cost. Remaining
suspects, each isolated by one 1000-step image fit on the bench
synthetic image (the golden protocol):

  A. snapped-unlocked — the locked mode's scale snapping (1384->1536 is
     +11%, and the 11->12 ratio drops to 1.33) WITHOUT locking: plain
     stratified batches, default scatter paths, snapped geometry.
     If A ~= 44-45 dB, snapping is the cause.
  B. locked-f32 — G=1 locking with locked_rounding="f32" (exact CSR
     accumulation). If B ~= 47 dB, the bf16 pair rounding interacts
     with phase-locked batches (structured, phase-correlated rounding
     error); if B ~= 44, rounding is innocent.
  C. locked-default re-run at G=1 for the same-session baseline.

Run ON TPU: python -u benchmarks/probe_quality_ab.py > _quality_ab.txt 2>&1
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import tcnn_tpu as tc  # noqa: E402
from tcnn_tpu.utils.sampling import stratified_uniform  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "samples"))
from mlp_learning_an_image import DEFAULT_CONFIG, synthetic_image  # noqa: E402

BATCH = 2**18
STEPS = 1000


def fit(name, config, locked_phases=0, post_create=None):
    import json

    config = json.loads(json.dumps(config))
    model = tc.create_from_config(2, 3, config)
    if post_create:
        post_create(model)
    trainer = model.trainer
    image = synthetic_image()
    h, w, _ = image.shape
    img = jnp.asarray(image)

    @jax.jit
    def step(state, key, img):
        xy = stratified_uniform(
            key, BATCH, 2, phase_locked=locked_phases or False
        )
        ij_y = jnp.clip((xy[:, 1] * h).astype(jnp.int32), 0, h - 1)
        ij_x = jnp.clip((xy[:, 0] * w).astype(jnp.int32), 0, w - 1)
        target = img.reshape(h * w, 3).at[ij_y * w + ij_x].get(
            mode="promise_in_bounds"
        )
        return trainer._step_impl(state, xy, target, None)

    key = jax.random.PRNGKey(1337)
    state = trainer.state
    t0 = time.time()
    for i in range(STEPS):
        key, sub = jax.random.split(key)
        state, loss = step(state, sub, img)
        if i == 0:
            _ = float(loss)
            t0 = time.time()
    _ = float(loss)
    ms = (time.time() - t0) / (STEPS - 1) * 1e3
    trainer.state = state

    pred = np.asarray(trainer.inference_raster((w, h))).reshape(h * w, 3)
    gt = image.reshape(h * w, 3)
    mse = float(np.mean((pred - gt) ** 2))
    psnr = -10.0 * np.log10(mse)
    print(f"{name}: {ms:.1f} ms/step, PSNR {psnr:.2f} dB", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    import json

    # A: snapped geometry, NO locking, plain stratified batches.
    def snap_only(model):
        enc = model.model.encoding
        enc._apply_phase_lock(512)
        enc.phase_locked = False  # geometry keeps the snap; no locked path

    fit("A snapped-unlocked", DEFAULT_CONFIG, post_create=snap_only)

    # B: locked G=1 with exact f32 CSR accumulation.
    cfg = json.loads(json.dumps(DEFAULT_CONFIG))
    cfg["encoding"].update(
        {"phase_locked": True, "locked_phases": 1, "locked_rounding": "f32"}
    )
    fit("B locked-f32 G=1", cfg, locked_phases=1)

    # C: locked default (pair) G=1 — same-session baseline.
    cfg2 = json.loads(json.dumps(DEFAULT_CONFIG))
    cfg2["encoding"].update({"phase_locked": True, "locked_phases": 1})
    fit("C locked-pair G=1", cfg2, locked_phases=1)

    # D: locked pair G=1 with snap tolerance 3.5% — level 11 keeps its
    # exact reference scale (1384.4; the +11% snap was the geometry
    # outlier) and runs factored; levels 12-15 lock.
    cfg3 = json.loads(json.dumps(DEFAULT_CONFIG))
    cfg3["encoding"].update(
        {"phase_locked": True, "locked_phases": 1, "locked_snap_tol": 0.035}
    )
    fit("D locked-tol3.5% G=1", cfg3, locked_phases=1)
    print("PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()

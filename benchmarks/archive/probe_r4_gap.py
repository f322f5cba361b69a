"""Round-4 bisect: WHERE does the bench-vs-probe step-time gap come from?

Round-3 numbers for the SAME nominal 3D config (16x2 @ 2^19 + FFMLP 64x2,
B=2^18, locked single, variants=2) disagree wildly by harness:

  probe_3d_variants (x precomputed, fixed targets, plain Adam) : 87.7 ms
  probe_3d_profile3 (same style)                               : 116.9 ms
  bench.py --protocol 3d (EMA 0.99 + in-graph batch gen + trig
  targets, state threaded step-to-step)                        : 169.3 ms
  bench.py + quad_build slice                                  : 130.5 ms

2D locked (pair): old bench claim 23.75 ms (02:20) vs today's captures
30.14 (view) / 25.44 (slice). The graded number is bench.py's, so the gap
must be attributed before it can be closed.

Ladder (each case jitted + timed identically; slice build everywhere):

3D (locked single):
  A  probe-style: step(state, x, tgt) with x/tgt precomputed device args
  B  A + EMA(0.99)-wrapped optimizer
  C  B + in-graph batch gen (x = stratified_uniform(key) INSIDE the jit)
  D  C + in-graph analytic trig targets  == bench.py's bench_step

2D (locked pair):
  A  probe-style (plain Adam, precomputed x/tgt)
  B  A + EMA
  C  B + in-graph gen + image-target gather, image as explicit jit ARG
     == bench.py's current bench_step
  D  like C but the image CLOSED OVER as a device constant
     == the OLD (round-3, 02:20) bench's program shape

Usage:
  python benchmarks/probe_r4_gap.py [2d|3d|both] > benchmarks/logs/_r4_gap.txt
"""

import os
import sys
import time
from pathlib import Path

import jax

if os.environ.get("TCNN_PROBE_CPU"):
    # CPU smoke mode: verify every case traces/executes (numbers
    # meaningless). sitecustomize pins the axon platform, so flip it here.
    jax.config.update("jax_platforms", "cpu")

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import tcnn_tpu as tc  # noqa: E402
from tcnn_tpu.utils.sampling import stratified_uniform  # noqa: E402

BATCH = 2**12 if os.environ.get("TCNN_PROBE_CPU") else 2**18


def config(n_dims, rounding, ema):
    adam = {
        "otype": "Adam", "learning_rate": 1e-2, "beta1": 0.9,
        "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6,
    }
    return {
        "loss": {"otype": "RelativeL2"},
        "optimizer": (
            {"otype": "EMA", "decay": 0.99, "nested": adam} if ema else adam
        ),
        "encoding": {
            "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
            "log2_hashmap_size": 15 if n_dims == 2 else 19,
            "base_resolution": 16, "per_level_scale": 1.5,
            "hash": "CoherentAdditive", "gather_strategy": "stratified",
            "phase_locked": True, "locked_phases": 1,
            "locked_rounding": rounding, "quad_build": "slice",
        },
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    }


def timed_steps(name, step_jit, state, args_fn, reps=20, blocks=2):
    """Times `reps` state-threaded steps per block (the bench's own
    dispatch pattern), twice, printing both blocks."""
    # warmup (compile + 3 steps)
    st = state
    for j in range(3):
        st, loss = step_jit(st, *args_fn(j))
    _ = float(loss)
    out = []
    for b in range(blocks):
        st = state
        t0 = time.perf_counter()
        for j in range(reps):
            st, loss = step_jit(st, *args_fn(j))
        _ = float(loss)
        out.append((time.perf_counter() - t0) / reps * 1e3)
    print(f"{name}: {out[0]:.2f} / {out[1]:.2f} ms/step", flush=True)
    return out


def run_3d():
    print("=== 3D (locked single, slice build) ===", flush=True)
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    x = stratified_uniform(jax.random.PRNGKey(0), BATCH, 3, phase_locked=1)
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, 3), jnp.float32)
    x, tgt = jax.device_put(x), jax.device_put(tgt)

    for name, ema in (("A  probe-style (Adam, x/tgt args)", False),
                      ("B  + EMA(0.99)", True)):
        model = tc.create_from_config(3, 3, config(3, "single", ema), seed=1)
        trainer = model.trainer
        step = jax.jit(
            lambda st, xx, tt, tr=trainer: tr._step_impl(st, xx, tt, None)
        )
        timed_steps(name, step, trainer.state, lambda j: (x, tgt))

    model = tc.create_from_config(3, 3, config(3, "single", True), seed=1)
    trainer = model.trainer

    def step_c(st, key, tt):
        xx = stratified_uniform(key, BATCH, 3, phase_locked=1)
        return trainer._step_impl(st, xx, tt, None)

    timed_steps("C  + in-graph batch gen", jax.jit(step_c), trainer.state,
                lambda j: (keys[j], tgt))

    def step_d(st, key):
        xx = stratified_uniform(key, BATCH, 3, phase_locked=1)
        tt = jnp.stack(
            [
                0.5 + 0.5 * jnp.sin(6 * jnp.pi * xx[:, 0])
                * jnp.cos(4 * jnp.pi * xx[:, 1]),
                0.5 + 0.5 * jnp.cos(5 * jnp.pi * (xx[:, 1] + xx[:, 2])),
                0.5 + 0.5 * jnp.sin(3 * jnp.pi * xx[:, 0] * xx[:, 2] * 2),
            ],
            axis=-1,
        )
        return trainer._step_impl(st, xx, tt, None)

    timed_steps("D  + trig targets (== bench)", jax.jit(step_d),
                trainer.state, lambda j: (keys[j],))


def run_2d():
    print("=== 2D (locked pair, slice build) ===", flush=True)
    res = 64 if os.environ.get("TCNN_PROBE_CPU") else 512  # strata==pixels
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    yy, xx_ = np.meshgrid(np.linspace(0, 1, res), np.linspace(0, 1, res),
                          indexing="ij")
    img_np = np.stack(
        [
            0.5 + 0.5 * np.sin(8 * np.pi * xx_) * np.cos(6 * np.pi * yy),
            0.5 + 0.5 * np.cos(4 * np.pi * (xx_ + yy)),
            0.5 + 0.5 * np.sin(2 * np.pi * xx_ * yy * 4),
        ],
        axis=-1,
    ).astype(np.float32)
    img = jax.device_put(jnp.asarray(img_np))
    x = stratified_uniform(jax.random.PRNGKey(0), BATCH, 2, phase_locked=1)
    tgt = img.reshape(res * res, 3)  # strata == pixels at B=2^18

    for name, ema in (("A  probe-style (Adam, x/tgt args)", False),
                      ("B  + EMA(0.99)", True)):
        model = tc.create_from_config(2, 3, config(2, "pair", ema), seed=1)
        trainer = model.trainer
        step = jax.jit(
            lambda st, xx, tt, tr=trainer: tr._step_impl(st, xx, tt, None)
        )
        timed_steps(name, step, trainer.state, lambda j: (x, tgt))

    model = tc.create_from_config(2, 3, config(2, "pair", True), seed=1)
    trainer = model.trainer

    def step_c(st, key, im):
        xy = stratified_uniform(key, BATCH, 2, phase_locked=1)
        return trainer._step_impl(st, xy, im.reshape(res * res, 3), None)

    timed_steps("C  + in-graph gen, img ARG (== bench)", jax.jit(step_c),
                trainer.state, lambda j: (keys[j], img))

    def step_d(st, key):
        xy = stratified_uniform(key, BATCH, 2, phase_locked=1)
        return trainer._step_impl(st, xy, img.reshape(res * res, 3), None)

    timed_steps("D  img CLOSED OVER (== old bench)", jax.jit(step_d),
                trainer.state, lambda j: (keys[j],))


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("2d", "both"):
        run_2d()
    if which in ("3d", "both"):
        run_3d()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

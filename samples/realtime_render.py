#!/usr/bin/env python
"""Real-time rendering demo: train an image field, then serve it at
interactive rates through a FrozenServer (prebuilt-table serving).

The Instant-NGP-class workflow the reference headlines (train in
seconds, render interactively): fit the synthetic 512x512 image for
``--steps`` training steps, freeze a server, and render a continuous
pan/zoom camera path as full rasters, reporting frames/second. Each
frame is ONE device dispatch (``server.raster``) for the static view,
or one ``server(x)`` batch for the moving-camera crops (arbitrary query
positions: pan offset + zoom scale applied to the tile-center raster).

Reference context: samples/mlp_learning_an_image.cu:116-124 renders
inference snapshots during training with the same kernels; the frozen
server is the TPU-native production analogue (prebuilt quad tables,
consume-only jitted programs — serving.py).

Usage:
  python samples/realtime_render.py [--steps 300] [--side 512]
                                    [--frames 120] [--out render.npy]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

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

from mlp_learning_an_image import DEFAULT_CONFIG, synthetic_image  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--side", type=int, default=512)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--batch", type=int, default=2**18)
    ap.add_argument("--out", default=None, help="save the last frame (npy)")
    args = ap.parse_args()

    model = tc.create_from_config(2, 3, DEFAULT_CONFIG)
    trainer = model.trainer
    image = synthetic_image()
    h, w, _ = image.shape
    img = jnp.asarray(image)

    @jax.jit
    def step(state, key, img):
        xy = stratified_uniform(key, args.batch, 2)
        ij_y = jnp.clip((xy[:, 1] * h).astype(jnp.int32), 0, h - 1)
        ij_x = jnp.clip((xy[:, 0] * w).astype(jnp.int32), 0, w - 1)
        target = img.reshape(h * w, 3).at[ij_y * w + ij_x].get(
            mode="promise_in_bounds"
        )
        return trainer._step_impl(state, xy, target, None)

    key = jax.random.PRNGKey(7)
    t0 = time.time()
    state = trainer.state
    for _i in range(args.steps):
        key, sub = jax.random.split(key)
        state, loss = step(state, sub, img)
    trainer.state = state
    print(f"trained {args.steps} steps in {time.time()-t0:.1f}s "
          f"(loss {float(loss):.3e})", flush=True)

    server = trainer.freeze_serving()
    side = args.side

    # Static-view path: full-raster frames, one dispatch each.
    frame = server.raster((side, side))
    _ = float(frame.ravel()[0])
    t0 = time.perf_counter()
    frames = [server.raster((side, side)) for _ in range(args.frames)]
    _ = float(frames[-1].ravel()[0])
    dt = time.perf_counter() - t0
    print(
        f"static view : {args.frames} frames of {side}^2 in {dt:.2f}s "
        f"-> {args.frames/dt:.1f} FPS "
        f"({side*side*args.frames/dt/1e6:.1f} M samples/s)",
        flush=True,
    )

    # Moving-camera path: per-frame pan/zoom -> arbitrary query batches.
    base = jnp.asarray(
        np.stack(
            np.meshgrid(
                (np.arange(side) + 0.5) / side,
                (np.arange(side) + 0.5) / side,
                indexing="ij",
            ),
            axis=-1,
        ).reshape(side * side, 2)[:, ::-1].copy()
    )

    def view(i):
        zoom = 0.6 + 0.4 * np.cos(2 * np.pi * i / args.frames)
        pan = 0.5 * (1 - zoom)
        ox = pan * (0.5 + 0.5 * np.sin(2 * np.pi * i / args.frames))
        oy = pan
        return base * zoom + jnp.asarray([ox, oy], jnp.float32)

    frame = server(view(0))
    _ = float(frame.ravel()[0])
    t0 = time.perf_counter()
    for i in range(args.frames):
        frame = server(view(i))
    _ = float(frame.ravel()[0])
    dt = time.perf_counter() - t0
    print(
        f"moving view : {args.frames} frames of {side}^2 in {dt:.2f}s "
        f"-> {args.frames/dt:.1f} FPS "
        f"({side*side*args.frames/dt/1e6:.1f} M samples/s)",
        flush=True,
    )

    if args.out:
        np.save(args.out, np.asarray(frame).reshape(side, side, 3))
        print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()

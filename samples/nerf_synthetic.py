#!/usr/bin/env python
"""NGP-style radiance-field training on a synthetic analytic scene.

The reference's flagship downstream use is Instant-NGP: a HashGrid +
tiny-MLP radiance field volume-rendered along camera rays (the manual
whole-kernel fusion example of reference README.md:103-144). This sample
reproduces that pipeline end-to-end on TPU with tcnn_tpu primitives:

  model: Composite[HashGrid(xyz) (+) SphericalHarmonics(dir)] -> FFMLP
         -> (rgb, sigma)                       (the classic NGP shape)
  render: N stratified depth samples per ray, softplus density, alpha
         compositing — all inside ONE jitted train step.
  data:  an analytic scene (three colored Gaussian blobs); ground-truth
         images come from volume-rendering the analytic field with the
         same quadrature, so the achievable PSNR is bounded only by model
         capacity.

Run: python samples/nerf_synthetic.py [n_steps] [rays_per_batch]
Prints training progress and the final validation-view PSNR.
Measured on 1x v5e: 600 steps x 8192 rays x 32 samples -> 50.7 dB
validation PSNR in ~27 s of train time.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CONFIG = {
    "loss": {"otype": "RelativeL2"},
    "optimizer": {
        "otype": "Adam",
        "learning_rate": 1e-2,
        "beta1": 0.9,
        "beta2": 0.99,
        "epsilon": 1e-15,
        "l2_reg": 1e-6,
    },
    "encoding": {
        "otype": "Composite",
        "nested": [
            {
                "otype": "HashGrid",
                "n_dims_to_encode": 3,
                "n_levels": 8,
                "n_features_per_level": 2,
                "log2_hashmap_size": 15,
                "base_resolution": 4,
                "per_level_scale": 1.6,
                "hash": "CoherentAdditive",
                "gather_strategy": "quad",
            },
            {"otype": "SphericalHarmonics", "degree": 3},
        ],
    },
    "network": {
        "otype": "FullyFusedMLP",
        "activation": "ReLU",
        "output_activation": "None",
        "n_neurons": 64,
        "n_hidden_layers": 2,
    },
}

N_SAMPLES = 32  # depth samples per ray
NEAR, FAR = 0.05, 1.6


def scene_sigma_rgb(x):
    """Analytic density/color field on [0,1]^3: three Gaussian blobs."""
    import jax.numpy as jnp

    blobs = jnp.asarray(
        [[0.35, 0.35, 0.45], [0.65, 0.55, 0.5], [0.5, 0.7, 0.6]]
    )
    radii = jnp.asarray([0.12, 0.10, 0.08])
    colors = jnp.asarray(
        [[0.9, 0.2, 0.15], [0.15, 0.7, 0.9], [0.95, 0.85, 0.2]]
    )
    d2 = jnp.sum((x[:, None, :] - blobs[None]) ** 2, -1)  # (B, 3)
    dens = 60.0 * jnp.exp(-d2 / (2 * radii[None] ** 2))  # (B, 3)
    sigma = jnp.sum(dens, -1)
    rgb = (dens @ colors) / (sigma[:, None] + 1e-6)
    return sigma, rgb


def make_rays(key, n, image_plane=None):
    """Rays from a fixed camera looking at the scene center."""
    import jax
    import jax.numpy as jnp

    cam = jnp.asarray([0.5, -0.9, 0.5])
    if image_plane is None:
        uv = jax.random.uniform(key, (n, 2))
    else:
        uv = image_plane
    # image plane spans x/z in [0.1, 0.9] at y = 0
    target = jnp.stack(
        [0.1 + 0.8 * uv[:, 0], jnp.zeros(uv.shape[0]), 0.1 + 0.8 * uv[:, 1]],
        axis=1,
    )
    d = target - cam
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    return jnp.broadcast_to(cam, d.shape), d


def render(sigma_rgb_fn, origins, dirs, key=None):
    """Volume rendering with N_SAMPLES stratified depth samples per ray."""
    import jax
    import jax.numpy as jnp

    n = origins.shape[0]
    t = jnp.linspace(NEAR, FAR, N_SAMPLES + 1)[:-1]
    dt = (FAR - NEAR) / N_SAMPLES
    if key is not None:
        t = t[None] + jax.random.uniform(key, (n, N_SAMPLES)) * dt
    else:
        t = jnp.broadcast_to(t[None] + 0.5 * dt, (n, N_SAMPLES))
    pts = origins[:, None, :] + dirs[:, None, :] * t[..., None]
    pts = pts.reshape(n * N_SAMPLES, 3)
    dcast = jnp.broadcast_to(dirs[:, None, :], (n, N_SAMPLES, 3)).reshape(
        -1, 3
    )
    sigma, rgb = sigma_rgb_fn(jnp.clip(pts, 0.0, 1.0), dcast)
    sigma = sigma.reshape(n, N_SAMPLES)
    rgb = rgb.reshape(n, N_SAMPLES, 3)
    alpha = 1.0 - jnp.exp(-sigma * dt)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=1)
    trans = jnp.concatenate([jnp.ones((n, 1)), trans[:, :-1]], axis=1)
    w = alpha * trans
    return jnp.sum(w[..., None] * rgb, axis=1)  # white-less background


def main():
    import jax
    import jax.numpy as jnp

    import tcnn_tpu as tc

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

    model = tc.create_from_config(6, 4, CONFIG)
    trainer = model.trainer

    def field(params, pts, dirs):
        # SH expects directions remapped to [0,1]^3 (reference quirk).
        out = model.model.apply(
            params, jnp.concatenate([pts, (dirs + 1.0) * 0.5], axis=1)
        ).astype(jnp.float32)
        sigma = jax.nn.softplus(out[:, 3] - 1.0)
        rgb = jax.nn.sigmoid(out[:, :3])
        return sigma, rgb

    def gt_field(pts, dirs):
        return scene_sigma_rgb(pts)

    @jax.jit
    def train_step(state, key):
        kr, kt = jax.random.split(key)
        origins, dirs = make_rays(kr, n_rays)
        target = render(gt_field, origins, dirs, key=kt)

        def loss_fn(params):
            pred = render(
                lambda p, d: field(params, p, d), origins, dirs, key=kt
            )
            diff = pred - target
            return jnp.mean(diff * diff / (pred * pred + 1e-2))

        # The volume renderer is the "app kernel" wrapping the model (the
        # reference's manual-fusion pattern, README.md:103-144): the model
        # is just a pure function inside this bigger jitted program, and
        # the optimizer consumes whatever gradients fall out (unscaled ->
        # loss_scale 1).
        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        opt_state, new_params = trainer.optimizer.step(
            state["opt"], state["params"], grads, 1.0
        )
        return {"params": new_params, "opt": opt_state}, loss

    state = trainer.state
    keys = jax.random.split(jax.random.PRNGKey(0), n_steps)
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, loss = train_step(state, keys[i])
        if i % 100 == 0 or i == n_steps - 1:
            print(
                f"step {i:5d}  loss {float(loss):.3e}  "
                f"[{time.perf_counter()-t0:.1f}s]",
                flush=True,
            )
    trainer.state = state

    # Validation: render a 128x128 view and compare against ground truth.
    res = 128
    vv, uu = np.meshgrid(
        (np.arange(res) + 0.5) / res, (np.arange(res) + 0.5) / res,
        indexing="ij",
    )
    uv = jnp.asarray(np.stack([uu.ravel(), vv.ravel()], 1).astype(np.float32))
    origins, dirs = make_rays(None, uv.shape[0], image_plane=uv)

    @jax.jit
    def render_pred(params):
        return render(lambda p, d: field(params, p, d), origins, dirs)

    @jax.jit
    def render_gt():
        return render(gt_field, origins, dirs)

    pred = np.asarray(render_pred(state["params"])).reshape(res, res, 3)
    gt = np.asarray(render_gt()).reshape(res, res, 3)
    mse = float(np.mean((pred - gt) ** 2))
    psnr = -10 * np.log10(mse) if mse > 0 else float("inf")
    print(f"validation view PSNR: {psnr:.2f} dB")

    # Real-time serving benchmark: the same frame through prebuilt grid
    # tables (GridEncoding.serving_tables — the FrozenServer split), so
    # per-frame work is field evals + volume rendering only. Each frame
    # is res^2 rays x N_SAMPLES field evaluations in one dispatch.
    enc = getattr(model.model, "encoding", None)
    if enc is not None and hasattr(enc, "serving_tables"):
        n_net = model.model.network.n_params
        tables = jax.jit(
            lambda p: enc.serving_tables(p[n_net:])
        )(state["params"])

        @jax.jit
        def render_served(params, tbl):
            def f(p, d):
                out = model.model.apply(
                    params,
                    jnp.concatenate([p, (d + 1.0) * 0.5], axis=1),
                    served_tables=tbl,
                ).astype(jnp.float32)
                return (
                    jax.nn.softplus(out[:, 3] - 1.0),
                    jax.nn.sigmoid(out[:, :3]),
                )

            return render(f, origins, dirs)

        frame = render_served(state["params"], tables)
        _ = float(frame.ravel()[0])
        n_frames = 30
        t0 = time.perf_counter()
        frames = [
            render_served(state["params"], tables) for _ in range(n_frames)
        ]
        _ = float(frames[-1].ravel()[0])
        dt = time.perf_counter() - t0
        evals = res * res * N_SAMPLES
        print(
            f"served render: {n_frames} frames of {res}^2 x {N_SAMPLES} "
            f"samples in {dt:.2f}s -> {n_frames/dt:.1f} FPS "
            f"({evals*n_frames/dt/1e6:.1f} M field evals/s)",
            flush=True,
        )
    if len(sys.argv) > 3:
        # Optional output dir (3rd arg); no artifacts are written otherwise
        # so test runs leave the working tree clean.
        out_dir = Path(sys.argv[3])
        out_dir.mkdir(parents=True, exist_ok=True)
        np.save(out_dir / "nerf_pred.npy", pred)
        np.save(out_dir / "nerf_gt.npy", gt)
        print(f"wrote {out_dir}/nerf_pred.npy / nerf_gt.npy")


if __name__ == "__main__":
    main()

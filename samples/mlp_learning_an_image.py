#!/usr/bin/env python
"""Image-fit sample — the TPU port of the reference's flagship demo.

(reference: samples/mlp_learning_an_image.cu and
samples/mlp_learning_an_image_pytorch.py). Learns (x, y) -> RGB from an
image with a trainable input encoding + tiny MLP, writing progressive PNGs.

Usage:
    python samples/mlp_learning_an_image.py [image.npy|image.png] \
        [config.json] [n_steps]

Without arguments a synthetic 512x512 test image is used (the repo carries
no binary assets). PNG loading/writing needs no external deps for .npy; for
.png it uses torch-vision-free pure-python fallback via matplotlib if
available, else .npy only.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_CONFIG = {
    # Mirrors the reference's data/config_hash.json protocol.
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
        "otype": "HashGrid",
        "n_levels": 16,
        "n_features_per_level": 2,
        "log2_hashmap_size": 15,
        "base_resolution": 16,
        "per_level_scale": 1.5,
        # TPU-native fast path (PLAN.md): additive hash, quad-row fine
        # levels, gather-free static coarse levels (stratified batches).
        "hash": "CoherentAdditive",
        "gather_strategy": "stratified",
    },
    "network": {
        "otype": "FullyFusedMLP",
        "activation": "ReLU",
        "output_activation": "None",
        "n_neurons": 64,
        "n_hidden_layers": 2,
    },
}


def synthetic_image(res: int = 512) -> np.ndarray:
    yy, xx = np.meshgrid(np.linspace(0, 1, res), np.linspace(0, 1, res),
                         indexing="ij")
    return np.stack(
        [
            0.5 + 0.5 * np.sin(8 * np.pi * xx) * np.cos(6 * np.pi * yy),
            0.5 + 0.5 * np.cos(4 * np.pi * (xx + yy)),
            0.5 + 0.5 * np.sin(2 * np.pi * (xx - yy) * 3),
        ],
        axis=-1,
    ).astype(np.float32)


def load_image(path: str) -> np.ndarray:
    p = Path(path)
    if p.suffix == ".npy":
        img = np.load(p)
    else:
        try:
            from matplotlib.image import imread  # noqa: PLC0415

            img = imread(str(p))
        except Exception as e:  # pragma: no cover
            raise RuntimeError(f"cannot load {p}: {e}; use .npy") from e
    img = np.asarray(img, np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    if img.ndim == 2:  # grayscale (e.g. the reference's albert.jpg)
        img = np.repeat(img[..., None], 3, axis=-1)
    return img[..., :3]


def main():
    import jax
    import jax.numpy as jnp

    import tcnn_tpu as tc

    args = sys.argv[1:]
    # --phase-locked[=G]: G shared jitter vectors per batch (tile j uses
    # phase j % G) + static-index fine grid levels (PLAN.md round 3).
    # Locked training pairs with an EMA-wrapped optimizer: the
    # constant-lr equilibrium dithers between phases (39-45 dB run
    # variance on this golden), and EMA(0.99) over the post-step weights
    # averages it out — locked G=1 + EMA measured 50.1 dB, above the
    # 47+ band. The flag wraps the default config's optimizer in EMA
    # automatically (explicit config files are left untouched).
    phase_locked = 0
    for a in args:
        if a == "--phase-locked":
            phase_locked = 1
        elif a.startswith("--phase-locked="):
            phase_locked = int(a.split("=", 1)[1])
    args = [a for a in args if not a.startswith("--phase-locked")]
    image = (
        load_image(args[0])
        if args and args[0] not in ("", "-")
        else synthetic_image()
    )
    config = (
        tc.loads_config(Path(args[1]).read_text())
        if len(args) > 1 and args[1] not in ("", "-")
        else DEFAULT_CONFIG
    )
    n_steps = int(args[2]) if len(args) > 2 else 1000
    batch = 2**18

    if phase_locked:
        is_default = config is DEFAULT_CONFIG
        config = json.loads(json.dumps(config))  # deep copy
        config["encoding"]["phase_locked"] = True
        config["encoding"]["locked_phases"] = phase_locked
        config["encoding"].setdefault("gather_strategy", "stratified")
        if is_default:
            config["optimizer"] = {
                "otype": "EMA", "decay": 0.99,
                "nested": config["optimizer"],
            }

    h, w, _ = image.shape
    print(f"Fitting a {w}x{h} image with "
          f"{config['encoding']['otype']} + {config['network']['otype']}"
          + (f" [phase-locked G={phase_locked}]" if phase_locked else ""))

    model = tc.create_from_config(2, 3, config)
    trainer = model.trainer
    image_dev = jnp.asarray(image)

    from tcnn_tpu.utils.sampling import stratified_uniform

    @jax.jit
    def step(state, key, img):
        # Stratified-jitter sampler (see utils/sampling.py): same uniform
        # marginals as the reference's curand loop, lower variance, and the
        # raster layout that unlocks the static coarse-level grid path.
        xy = stratified_uniform(key, batch, 2, phase_locked=phase_locked)
        ij_y = jnp.clip((xy[:, 1] * h).astype(jnp.int32), 0, h - 1)
        ij_x = jnp.clip((xy[:, 0] * w).astype(jnp.int32), 0, w - 1)
        # Flat promise_in_bounds lookup (default-mode 2D indexing hits
        # XLA's slow bounds-checked gather path on TPU).
        target = img.reshape(h * w, 3).at[ij_y * w + ij_x].get(
            mode="promise_in_bounds"
        )
        return trainer._step_impl(state, xy, target, None)

    keys = jax.random.split(jax.random.PRNGKey(42), n_steps)
    state = trainer.state
    loss_curve = []
    t0 = time.perf_counter()
    t_first = None
    for i in range(n_steps):
        state, loss = step(state, keys[i], image_dev)
        if i == 0:
            # Sync after step 0 so steady-state timing excludes the jit
            # compile (first-call cost is reported separately below).
            loss = float(loss)
            t_first = time.perf_counter()
        if i % 100 == 0 or i == n_steps - 1:
            loss = float(loss)
            loss_curve.append([i, loss])
            elapsed = time.perf_counter() - t0
            print(f"step {i:5d}  loss {loss:.3e}  "
                  f"[{elapsed:.2f}s, {batch*(i+1)/max(elapsed,1e-9):.3g} samples/s]")
    train_time = time.perf_counter() - t0
    steady_ms = (
        (time.perf_counter() - t_first) / max(n_steps - 1, 1) * 1e3
        if n_steps > 1
        else train_time * 1e3
    )
    print(f"steady-state {steady_ms:.1f} ms/step "
          f"({batch / steady_ms * 1e3:.3g} samples/s); "
          f"first step (incl. compile) {t_first - t0:.1f}s")
    trainer.state = state

    # Render the learned image and report PSNR — one rectangular-raster
    # serving call (separable static-lerp grid path; dim 0 = x fastest,
    # so the flat output reshapes to (h, w) directly).
    t_render = time.perf_counter()
    pred = np.asarray(trainer.inference_raster((w, h))).reshape(h, w, 3)
    print(f"render: {time.perf_counter() - t_render:.2f}s "
          f"({h * w} points, single raster dispatch)")
    mse = float(np.mean((pred - image) ** 2))
    psnr = -10 * np.log10(mse) if mse > 0 else float("inf")
    print(f"PSNR: {psnr:.2f} dB")

    if len(args) > 3:
        # Optional output dir: golden artifacts (fitted image + metrics
        # incl. the loss curve for convergence-parity comparisons).
        out_dir = Path(args[3])
        out_dir.mkdir(parents=True, exist_ok=True)
        np.save(out_dir / "fitted_image.npy", pred)
        (out_dir / "metrics.json").write_text(json.dumps({
            "image": args[0] if args else "synthetic",
            "steps": n_steps,
            "batch": batch,
            "train_seconds": round(train_time, 3),
            "ms_per_step": round(steady_ms, 3),
            "first_step_seconds": round(t_first - t0, 3),
            "psnr_db": round(psnr, 3),
            "mse": mse,
            "loss_curve": loss_curve,
        }, indent=1) + "\n")
        print(f"wrote {out_dir}/fitted_image.npy, metrics.json")


if __name__ == "__main__":
    main()

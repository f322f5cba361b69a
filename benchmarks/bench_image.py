#!/usr/bin/env python
"""Image-fit throughput benchmark over a batch-size sweep.

Port of the reference protocol (benchmarks/image/bench_ours.cu:188-223):
config_oneblob (OneBlob-64 + FFMLP 128x5, RelativeL2, Adam), batch sweep
2^14..2^21, reporting training and inference throughput. The
``--baseline`` flag swaps the Pallas FullyFusedMLP for the plain XLA MLP —
the role bench_tensorflow.py (TF+XLA) plays for the reference.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CONFIG_ONEBLOB = {
    "loss": {"otype": "RelativeL2"},
    "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
    # n_bins 64 for exact parity with the reference's config_oneblob.json.
    "encoding": {"otype": "OneBlob", "n_bins": 64},
    "network": {
        "otype": "FullyFusedMLP",
        "activation": "ReLU",
        "output_activation": "None",
        "n_neurons": 128,
        "n_hidden_layers": 5,
    },
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-pow", type=int, default=14)
    ap.add_argument("--max-pow", type=int, default=21)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--baseline", action="store_true",
                    help="use the XLA MLP instead of the Pallas FFMLP")
    ap.add_argument("--out", default="bench_image_result.json")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    import jax.numpy as jnp

    import tcnn_tpu as tc

    config = json.loads(json.dumps(CONFIG_ONEBLOB))
    if args.baseline:
        config["network"]["otype"] = "CutlassMLP"

    results = []
    for p in range(args.min_pow, args.max_pow + 1):
        batch = 1 << p
        model = tc.create_from_config(2, 3, config)
        trainer = model.trainer

        r = np.random.default_rng(0)
        xy_np = r.uniform(0, 1, (batch, 2)).astype(np.float32)
        xy = jnp.asarray(xy_np)
        # Real image content (the reference's bench trains against an
        # actual texture, bench_ours.cu:188-223): nearest-pixel samples
        # of the repo's deterministic 512^2 test image. Content doesn't
        # change the FLOPs, but it makes the reported final loss a
        # legitimate convergence signal instead of noise-fitting.
        from samples.mlp_learning_an_image import synthetic_image

        img = synthetic_image()
        px = np.minimum((xy_np * img.shape[0]).astype(np.int64),
                        img.shape[0] - 1)
        target = jnp.asarray(img[px[:, 1], px[:, 0]].astype(np.float32))

        step = jax.jit(trainer._train_step, donate_argnums=(0,))
        state = trainer.state
        state, loss = step(state, xy, target)
        _ = float(loss)  # scalar fetch: block_until_ready lies over the tunnel
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, loss = step(state, xy, target)
        _ = float(loss)
        train_tput = batch * args.iters / (time.perf_counter() - t0)

        infer = jax.jit(lambda p, x: model.model.apply(p, x))
        out = infer(state["params"], xy)
        _ = float(out[0, 0].astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = infer(state["params"], xy)
        _ = float(out[0, 0].astype(jnp.float32))
        infer_tput = batch * args.iters / (time.perf_counter() - t0)

        entry = {
            "batch": batch,
            "training_elements_per_second": round(train_tput, 1),
            "inference_elements_per_second": round(infer_tput, 1),
            "final_loss": float(loss),
            "method": "xla_mlp" if args.baseline else "pallas_ffmlp",
        }
        print(json.dumps(entry))
        results.append(entry)

    Path(args.out).write_text(json.dumps(results, indent=2))
    print(f"# wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()

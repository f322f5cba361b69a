"""FFMLP Pallas kernel tile sweep vs XLA chain."""

import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tcnn_tpu.common import Activation
from tcnn_tpu.ops import ffmlp
from tcnn_tpu.rng import make_rng
from tcnn_tpu.networks import MLP

BATCH = 2**20
WIDTH = 64

mlp = MLP(input_width=WIDTH, output_width=WIDTH, n_neurons=WIDTH,
          n_hidden_layers=3)
params = jnp.asarray(mlp.initialize_params(make_rng(1)))
ws = tuple(w.astype(jnp.bfloat16).T for w in mlp._weights(params))
x = jnp.asarray(np.random.default_rng(0).standard_normal((BATCH, WIDTH)),
                jnp.bfloat16)


def sync(o):
    return float(jnp.asarray(o).ravel()[0].astype(jnp.float32))


def bench(name, fn, *args, reps=20):
    c = jax.jit(fn).lower(*args).compile()
    out = c(*args)
    sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = c(*args)
    sync(out)
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1e3:.2f} ms -> {BATCH/dt/1e6:.0f} M elem/s", flush=True)


def mlp_apply(x, ws):
    h = x
    for i, w in enumerate(ws):
        h = jnp.dot(h, w, preferred_element_type=jnp.float32)
        if i < len(ws) - 1:
            h = jnp.maximum(h, 0)
        h = h.astype(jnp.bfloat16)
    return h


bench("xla chain", mlp_apply, x, ws)


for tile in (256, 512, 1024, 2048, 4096):
    bench(
        f"pallas tile={tile}",
        lambda x, ws, t=tile: ffmlp.mlp_forward_pallas(
            x, ws, Activation.ReLU, Activation.NONE, tile_b=t
        ),
        x, ws,
    )

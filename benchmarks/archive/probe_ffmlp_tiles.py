"""Probe: FFMLP Pallas kernel throughput vs batch tile size, against the
XLA matmul chain, forward (inference) and forward+backward (training).

Protocol shapes from the reference MLP benchmark (bench_mlp_ours.cu:64-137):
batch 2^20, in=out=width padded, 3-4 hidden layers, ReLU.
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tcnn_tpu.common import Activation
from tcnn_tpu.ops import ffmlp
from tcnn_tpu.ops.ffmlp import mlp_forward_pallas, ffmlp_apply

r = np.random.default_rng(0)
B = 2**20
width = int(sys.argv[1]) if len(sys.argv) > 1 else 128
n_hidden = 4

ws = [jnp.asarray(r.normal(0, 0.1, (width, width)).astype(np.float32), jnp.bfloat16)
      for _ in range(n_hidden + 1)]
x = jnp.asarray(r.normal(0, 1, (B, width)).astype(np.float32), jnp.bfloat16)

flops = 2 * B * (n_hidden + 1) * width * width


def timeit(name, fn, *args, reps=20):
    try:
        t0 = time.time()
        c = jax.jit(fn).lower(*args).compile()
        ct = time.time() - t0
        out = c(*args)
        _ = float(out)
        t0 = time.time()
        for _ in range(reps):
            out = c(*args)
        _ = float(out)
        ms = (time.time() - t0) / reps * 1e3
        print(f"{name}: {ms:7.2f} ms  {flops/ms*1e3/1e12:6.1f} TFLOP/s "
              f"{B/ms*1e3/1e9:5.2f} Gelem/s (compile {ct:.0f}s)", flush=True)
    except Exception as e:
        print(name, "FAILED:", type(e).__name__, str(e)[:100], flush=True)


def xla_chain(x, ws):
    h = x
    for w in ws:
        h = jnp.maximum(
            jnp.dot(h, w, preferred_element_type=jnp.float32), 0.0
        ).astype(jnp.bfloat16)
    return h.astype(jnp.float32).sum()


timeit(f"w{width} xla_chain fwd       ", xla_chain, x, ws)

for tile in (2048, 4096, 8192, 16384, 32768):
    timeit(
        f"w{width} pallas fwd tile={tile:5d}",
        lambda x, ws, tile=tile: mlp_forward_pallas(
            x, tuple(ws), Activation.ReLU, Activation.ReLU, tile_b=tile,
            layout="rm",  # historical rm-tile sweep; keep comparable
        ).astype(jnp.float32).sum(),
        x,
        ws,
    )


def train_pallas(x, ws):
    def f(ws):
        out = ffmlp_apply(x, tuple(ws), Activation.ReLU, Activation.ReLU, "rm")
        return (out.astype(jnp.float32) ** 2).sum()

    g = jax.grad(f)(list(ws))
    return sum(gg.astype(jnp.float32).sum() for gg in g)


def train_xla(x, ws):
    def f(ws):
        h = x
        for w in ws:
            h = jnp.maximum(
                jnp.dot(h, w, preferred_element_type=jnp.float32), 0.0
            ).astype(jnp.bfloat16)
        return (h.astype(jnp.float32) ** 2).sum()

    g = jax.grad(f)(list(ws))
    return sum(gg.astype(jnp.float32).sum() for gg in g)


timeit(f"w{width} xla    fwd+bwd      ", train_xla, x, ws)
timeit(f"w{width} pallas fwd+bwd      ", train_pallas, x, ws)

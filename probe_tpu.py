"""Probe: full flagship fwd + train step after the fused-gather refactor."""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import tcnn_tpu as tc
from __graft_entry__ import FLAGSHIP_CONFIG

model = tc.create_from_config(2, 3, FLAGSHIP_CONFIG)
trainer = model.trainer

r = np.random.default_rng(0)
batch = 2**18
xy = jnp.asarray(r.uniform(0, 1, (batch, 2)).astype(np.float32))
tgt = jnp.asarray(r.uniform(0, 1, (batch, 3)).astype(np.float32))

fwd = jax.jit(lambda p, x: model.model.apply(p, x))
t0 = time.time()
cf = fwd.lower(trainer.state["params"], xy).compile()
print("fwd compile", round(time.time() - t0, 1), flush=True)
out = cf(trainer.state["params"], xy)
out.block_until_ready()
t0 = time.time()
for _ in range(10):
    out = cf(trainer.state["params"], xy)
_ = float(out[0, 0])
print(f"fwd: {(time.time()-t0)/10*1e3:.2f} ms", flush=True)

step = jax.jit(trainer._train_step)
t0 = time.time()
compiled = step.lower(trainer.state, xy, tgt).compile()
print("step compile", round(time.time() - t0, 1), flush=True)

st = trainer.state
st, loss = compiled(st, xy, tgt)
_ = float(loss)
t0 = time.time()
n = 20
for _ in range(n):
    st, loss = compiled(st, xy, tgt)
v = float(loss)
dt = (time.time() - t0) / n
print(f"train step: {dt*1e3:.2f} ms -> {batch/dt:.4g} samples/s (loss {v:.3e})",
      flush=True)

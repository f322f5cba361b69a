"""3D hashgrid-quad step timing + eikonal (double-backward) smoke on TPU."""

import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import tcnn_tpu as tc

# 3D flagship: NeRF-scale grid.
CFG3D = {
    "loss": {"otype": "RelativeL2"},
    "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
    "encoding": {"otype": "HashGrid", "n_levels": 16,
                 "n_features_per_level": 2, "log2_hashmap_size": 19,
                 "base_resolution": 16, "per_level_scale": 1.5,
                 "hash": "CoherentAdditive", "gather_strategy": "quad"},
    "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                "n_hidden_layers": 2},
}

model = tc.create_from_config(3, 4, CFG3D)
trainer = model.trainer
r = np.random.default_rng(0)
batch = 2**18
x = jnp.asarray(r.uniform(0, 1, (batch, 3)).astype(np.float32))
t = jnp.asarray(r.uniform(0, 1, (batch, 4)).astype(np.float32))

step = jax.jit(trainer._train_step)
t0 = time.time()
c = step.lower(trainer.state, x, t).compile()
print("3D quad step compile", round(time.time() - t0, 1), flush=True)
st = trainer.state
st, loss = c(st, x, t)
_ = float(loss)
t0 = time.time()
for _ in range(15):
    st, loss = c(st, x, t)
v = float(loss)
dt = (time.time() - t0) / 15
print(f"3D quad train step: {dt*1e3:.1f} ms -> {batch/dt:.3g} samples/s "
      f"(loss {v:.3e})", flush=True)

# Eikonal double-backward: SDF-style loss ||grad_x f| - 1|^2 on a small
# grid+MLP, trained a few steps on device.
sdf_cfg = {
    "encoding": {"otype": "HashGrid", "n_levels": 6, "log2_hashmap_size": 13,
                 "base_resolution": 4, "per_level_scale": 1.6,
                 "interpolation": "Smoothstep"},
    "network": {"otype": "CutlassMLP", "n_neurons": 64, "n_hidden_layers": 2},
}
from tcnn_tpu import NetworkWithInputEncoding

sdf = NetworkWithInputEncoding(3, 1, sdf_cfg["encoding"], sdf_cfg["network"])
from tcnn_tpu.rng import make_rng

params = jnp.asarray(sdf.initialize_params(make_rng(2)))


def eikonal_loss(p, xs):
    def f(xx):
        return sdf.apply(p, xx).astype(jnp.float32)[:, 0].sum()

    g = jax.grad(f)(xs)  # (B, 3)
    norms = jnp.sqrt((g**2).sum(-1) + 1e-12)
    return ((norms - 1.0) ** 2).mean()


gfun = jax.jit(jax.value_and_grad(eikonal_loss))
xs = jnp.asarray(r.uniform(0.1, 0.9, (4096, 3)).astype(np.float32))
t0 = time.time()
val, grad = gfun(params, xs)
print("eikonal double-backward compile+run", round(time.time() - t0, 1),
      "loss", float(val), flush=True)
lr = 1e-2
losses = []
for i in range(10):
    val, grad = gfun(params, xs)
    params = params - lr * grad
    losses.append(float(val))
print("eikonal losses:", [round(l, 4) for l in losses], flush=True)
assert losses[-1] < losses[0], "eikonal training did not descend"
print("eikonal OK", flush=True)


# Stratified 3D variant: strata 64^3 batch; levels with scale <= 128 go
# static (see PLAN.md), the rest stay quad (+ factored scatter where the
# table fits the gate).
from tcnn_tpu.utils.sampling import stratified_uniform

CFG3D_STRAT = {
    **CFG3D,
    "encoding": {**CFG3D["encoding"], "gather_strategy": "stratified"},
}
model2 = tc.create_from_config(3, 4, CFG3D_STRAT)
trainer2 = model2.trainer
xs3 = stratified_uniform(jax.random.PRNGKey(7), batch, 3)
step2 = jax.jit(trainer2._train_step)
t0 = time.time()
c2 = step2.lower(trainer2.state, xs3, t).compile()
print("3D stratified step compile", round(time.time() - t0, 1), flush=True)
st2 = trainer2.state
st2, loss2 = c2(st2, xs3, t)
_ = float(loss2)
t0 = time.time()
for _ in range(15):
    st2, loss2 = c2(st2, xs3, t)
v2 = float(loss2)
dt2 = (time.time() - t0) / 15
print(f"3D stratified train step: {dt2*1e3:.1f} ms -> {batch/dt2:.3g} "
      f"samples/s (loss {v2:.3e})", flush=True)

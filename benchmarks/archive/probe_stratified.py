"""Probe: building blocks for the stratified-batch coarse-level fast path,
plus cheap scatter variants.

Measures, at flagship-relevant sizes (B=2^18, S=2^15):
  1. bf16 vs f32 XLA scatter-add rows (fine-level backward candidate).
  2. constant-index (static) gather vs dynamic gather.
  3. tile+slice unfold of (S,8) -> (res+1)^2 rows, res=410.
  4. pooling matmul (512, 411) @ dense-level tensor contraction chain.
  5. fine-only config cost: 7-level HashGrid base 615 (levels 9-15 of the
     flagship protocol) + FFMLP step — sizes the coarse-level prize.
"""

import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parent.parent))

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

B = 2**18
S = 2**15
r = np.random.default_rng(0)


def timeit(name, fn, *args, reps=10):
    try:
        t0 = time.time()
        c = jax.jit(fn).lower(*args).compile()
        ct = time.time() - t0
        out = c(*args)
        _ = float(jnp.sum(out)) if hasattr(out, "dtype") else float(out)
        t0 = time.time()
        for _ in range(reps):
            out = c(*args)
        _ = float(jnp.sum(out)) if hasattr(out, "dtype") else float(out)
        ms = (time.time() - t0) / reps * 1e3
        print(f"{name}: {ms:8.3f} ms   (compile {ct:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


idx = jnp.asarray(r.integers(0, S, B), jnp.int32)
rows32 = jnp.asarray(r.normal(size=(B, 8)), jnp.float32)
rows16 = rows32.astype(jnp.bfloat16)
table32 = jnp.asarray(r.normal(size=(S, 8)), jnp.float32)
table16 = table32.astype(jnp.bfloat16)

# 1. scatter dtype sweep
timeit("scatter f32 (B,8) S=2^15 ",
       lambda i, v: jnp.zeros((S, 8), jnp.float32).at[i].add(
           v, mode="promise_in_bounds").sum(), idx, rows32)
timeit("scatter bf16 (B,8) S=2^15",
       lambda i, v: jnp.zeros((S, 8), jnp.bfloat16).at[i].add(
           v, mode="promise_in_bounds").sum(), idx, rows16)
timeit("scatter f32 (B,4)        ",
       lambda i, v: jnp.zeros((S, 4), jnp.float32).at[i].add(
           v, mode="promise_in_bounds").sum(), idx, rows32[:, :4])
timeit("scatter f32 (B,16)       ",
       lambda i, v: jnp.zeros((S, 16), jnp.float32).at[i].add(
           v, mode="promise_in_bounds").sum(), idx,
       jnp.concatenate([rows32, rows32], 1))

# 2. gather: dynamic vs constant indices vs bf16
timeit("gather f32 dynamic       ",
       lambda t, i: t.at[i].get(mode="promise_in_bounds").sum(), table32, idx)
timeit("gather bf16 dynamic      ",
       lambda t, i: t.at[i].get(mode="promise_in_bounds").sum(), table16, idx)
const_idx = jnp.asarray(r.integers(0, S, B), jnp.int32)  # closed over
timeit("gather f32 CONST indices ",
       lambda t: t.at[const_idx].get(mode="promise_in_bounds").sum(), table32)

# 3. unfold (tile+slice) res=410: D = tile(T)[: (411*411)]
H = 411


def unfold(t):
    n = -(-(H * H) // S)
    return jnp.tile(t, (n, 1))[: H * H].sum()


timeit("unfold tile+slice res410 ", unfold, table32)

# 4. static pooling-matmul chain for one coarse level (res 410):
#    Mv (512, H) @ D (H, H*8) then (512, H*8)->reshape-> @ Mu^T per channel.
#    Implement as einsum('ph,hwc,qw->pqc') with one-hot float matrices.
c0 = np.floor(np.arange(512) / 512 * 410 + 0.5).astype(np.int64)
Mv = np.zeros((512, H), np.float32)
Mv[np.arange(512), np.clip(c0, 0, H - 1)] = 1.0
Mv = jnp.asarray(Mv)
D = jnp.asarray(r.normal(size=(H, H, 8)), jnp.float32)


def upsample(dd):
    return jnp.einsum("ph,hwc,qw->pqc", Mv, dd, Mv,
                      preferred_element_type=jnp.float32).sum()


timeit("upsample einsum res410   ", upsample, D)

sel = jnp.asarray(r.normal(size=(512, 512, 8)), jnp.float32)


def downsample(g):
    return jnp.einsum("hp,pqc,wq->hwc", Mv.T, g, Mv.T,
                      preferred_element_type=jnp.float32).sum()


timeit("downsample einsum res410 ", downsample, sel)

# also the 4-variant select cost
masks = jnp.asarray(r.normal(size=(4, 512 * 512, 1)), jnp.float32)
feats4 = jnp.asarray(r.normal(size=(4, 512 * 512, 8)), jnp.float32)
timeit("4-variant masked select  ",
       lambda m, f: (m * f).sum(0).sum(), masks, feats4)

# 5. fine-only flagship subset: 7 levels base 615 (= levels 9-15)
import tcnn_tpu as tc

cfg = {
    "loss": {"otype": "RelativeL2"},
    "optimizer": {"otype": "Adam", "learning_rate": 1e-2, "beta1": 0.9,
                  "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6},
    "encoding": {"otype": "HashGrid", "n_levels": 7,
                 "n_features_per_level": 2, "log2_hashmap_size": 15,
                 "base_resolution": 615, "per_level_scale": 1.5,
                 "hash": "CoherentAdditive", "gather_strategy": "quad"},
    "network": {"otype": "FullyFusedMLP", "activation": "ReLU",
                "output_activation": "None", "n_neurons": 64,
                "n_hidden_layers": 2},
}
model = tc.create_from_config(2, 3, cfg)
trainer = model.trainer
x = jnp.asarray(r.uniform(0, 1, (B, 2)).astype(np.float32))
y = jnp.asarray(r.uniform(0, 1, (B, 3)).astype(np.float32))
state = trainer.state


def step(s, xx, yy):
    return trainer._step_impl(s, xx, yy, None)


timeit("7-fine-level full step   ", step, state, x, y, reps=5)

# coarse-only: levels 0-8 (base 16, 9 levels)
cfg2 = dict(cfg)
cfg2["encoding"] = dict(cfg["encoding"], n_levels=9, base_resolution=16)
model2 = tc.create_from_config(2, 3, cfg2)
trainer2 = model2.trainer
state2 = trainer2.state


def step2(s, xx, yy):
    return trainer2._step_impl(s, xx, yy, None)


timeit("9-coarse-level full step ", step2, state2, x, y, reps=5)
print("done", flush=True)

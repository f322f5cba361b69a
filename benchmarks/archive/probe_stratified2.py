"""Probe 2: (a) coarse-vs-fine level cost split of the flagship step;
(b) composed stratified coarse-level prototype (9 levels fwd+bwd in ONE jit)
to measure the real fused cost of the einsum/select restructuring.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import tcnn_tpu as tc

B = 2**18
S = 2**15
r = np.random.default_rng(0)


def timeit(name, fn, *args, reps=10):
    try:
        t0 = time.time()
        c = jax.jit(fn).lower(*args).compile()
        ct = time.time() - t0
        out = c(*args)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        t0 = time.time()
        for _ in range(reps):
            out = c(*args)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        ms = (time.time() - t0) / reps * 1e3
        print(f"{name}: {ms:8.3f} ms   (compile {ct:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


x = jnp.asarray(r.uniform(0, 1, (B, 2)).astype(np.float32))
y = jnp.asarray(r.uniform(0, 1, (B, 3)).astype(np.float32))


def step_config(n_levels, base_res):
    cfg = {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2, "beta1": 0.9,
                      "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6},
        "encoding": {"otype": "HashGrid", "n_levels": n_levels,
                     "n_features_per_level": 2, "log2_hashmap_size": 15,
                     "base_resolution": base_res, "per_level_scale": 1.5,
                     "hash": "CoherentAdditive", "gather_strategy": "quad"},
        "network": {"otype": "FullyFusedMLP", "activation": "ReLU",
                    "output_activation": "None", "n_neurons": 64,
                    "n_hidden_layers": 2},
    }
    model = tc.create_from_config(2, 3, cfg)
    trainer = model.trainer
    state = trainer.state
    return trainer, state


tr7, st7 = step_config(7, 615)     # levels 9-15 of the flagship
timeit("fine-7 (base 615) step  ",
       lambda s, a, b: tr7._step_impl(s, a, b, None), st7, x, y, reps=5)
tr9, st9 = step_config(9, 16)      # levels 0-8
timeit("coarse-9 (base 16) step ",
       lambda s, a, b: tr9._step_impl(s, a, b, None), st9, x, y, reps=5)
tr16, st16 = step_config(16, 16)   # full flagship
timeit("full-16 step            ",
       lambda s, a, b: tr16._step_impl(s, a, b, None), st16, x, y, reps=5)

# ---------------------------------------------------------------------------
# (b) stratified coarse prototype: 9 levels (res of levels 0-8), fwd+bwd of
# sum(enc^2) wrt tables, composed in ONE jit. Exact quad-feature math is
# approximated structurally (unfold + 4-variant einsum upsample + select +
# weighted sum); enough to measure the op mix XLA will see.
# ---------------------------------------------------------------------------
GRID = 512
scales = [16 * 1.5**l - 1 for l in range(9)]
resolutions = [int(np.ceil(s)) + 1 for s in scales]
C = 8  # 4 corners x 2 features

tables = [
    jnp.asarray(r.normal(size=(min(S, ((res * res + 7) // 8) * 8), C)),
                jnp.float32)
    for res in resolutions
]

# static one-hot upsample matrices per level per shift
Ms = []
for res, s in zip(resolutions, scales):
    c0 = np.floor(np.arange(GRID) / GRID * s + 0.5).astype(np.int64)
    m = []
    for d in range(2):
        mm = np.zeros((GRID, res), np.float32)
        mm[np.arange(GRID), np.clip(c0 + d, 0, res - 1)] = 1.0
        m.append(jnp.asarray(mm))
    Ms.append(m)

jit_key = jax.random.PRNGKey(0)
ju = jax.random.uniform(jit_key, (GRID * GRID, 2))  # per-sample jitter


def coarse_fwd(tables, ju):
    cols = jnp.tile(jnp.arange(GRID, dtype=jnp.float32), GRID)
    rows = jnp.repeat(jnp.arange(GRID, dtype=jnp.float32), GRID)
    px = (cols + ju[:, 0]) / GRID
    py = (rows + ju[:, 1]) / GRID
    out = []
    for lvl, (tab, res, s) in enumerate(zip(tables, resolutions, scales)):
        posx = px * s + 0.5
        posy = py * s + 0.5
        bx = jnp.floor(posx)
        by = jnp.floor(posy)
        tx = posx - bx
        ty = posy - by
        c0x = jnp.floor(cols / GRID * s + 0.5)
        c0y = jnp.floor(rows / GRID * s + 0.5)
        bu = (bx - c0x)  # in {0,1}
        bv = (by - c0y)
        # unfold to dense (res, res, C)
        n = -(-(res * res) // tab.shape[0])
        D = jnp.tile(tab, (n, 1))[: res * res].reshape(res, res, C)
        # 4 upsampled variants (einsum on MXU)
        Mv0, Mv1 = Ms[lvl][0], Ms[lvl][1]
        U = []
        for dv in (Mv0, Mv1):
            for du in (Mv0, Mv1):
                U.append(jnp.einsum("ph,hwc,qw->pqc", dv, D, du,
                                    preferred_element_type=jnp.float32)
                         .reshape(GRID * GRID, C))
        fa = jnp.where(bu[:, None] > 0.5, U[1], U[0])
        fb = jnp.where(bu[:, None] > 0.5, U[3], U[2])
        feats = jnp.where(bv[:, None] > 0.5, fb, fa)  # (B, C)
        w00 = (1 - tx) * (1 - ty)
        w10 = tx * (1 - ty)
        w01 = (1 - tx) * ty
        w11 = tx * ty
        f = feats.reshape(-1, 4, 2)
        yl = (f[:, 0] * w00[:, None] + f[:, 1] * w10[:, None]
              + f[:, 2] * w01[:, None] + f[:, 3] * w11[:, None])
        out.append(yl)
    return jnp.concatenate(out, axis=1)


def coarse_loss(tables, ju):
    e = coarse_fwd(tables, ju)
    return jnp.sum(e * e)


grad_fn = jax.grad(coarse_loss)
timeit("strat coarse-9 fwd      ", coarse_fwd, tables, ju, reps=5)
timeit("strat coarse-9 fwd+bwd  ",
       lambda t, j: grad_fn(t, j)[0], tables, ju, reps=5)
print("done", flush=True)

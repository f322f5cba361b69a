"""Round-4 serving decomposition (VERDICT r3 next-6: serving >= 1e8
samples/s or a ceiling analysis at 3D rigor).

Decomposes the 1024^2 frozen-raster time (r3: 20.1 ms = 5.21e7 samples/s)
into its parts and A/Bs the prescribed fine-gather variants:

  A. full FrozenServer raster (baseline)
  B. encoding-only raster (same served tables) — isolates the MLP+pad
  C. coarse-separable-only (max_level masks the fine levels; the static
     where folds at trace time so the fine gathers are DCE'd)
  D. standalone fine-level lookup forms at the serving shape
     (B=2^20 static-ish indices, 5 x (2^15, 8) f32 prebuilt tables):
       D1 per-level loop of 5 gathers + interp (what serving does today)
       D2 ONE fused supertable gather (B, 5) rows + interp
       D3 packed (S/K, 128) tables: gather idx//K + slot one-hot select
  E. pipelining depth: 1 / 4 / 16 rasters per sync

Usage: python benchmarks/probe_r4_serving.py > benchmarks/logs/_r4_serving.txt
"""

import sys
import time
from pathlib import Path

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import tcnn_tpu as tc  # noqa: E402


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def timed(fn, *args, reps=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps * 1e3


def flagship_model():
    return tc.create_from_config(2, 3, {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2, "beta2": 0.99,
                      "epsilon": 1e-15, "l2_reg": 1e-6},
        "encoding": {
            "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
            "log2_hashmap_size": 15, "base_resolution": 16,
            "per_level_scale": 1.5, "hash": "CoherentAdditive",
            "gather_strategy": "stratified",
        },
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    })


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    model = flagship_model()
    trainer = model.trainer
    enc = model.model.encoding
    server = trainer.freeze_serving()
    side = (1024, 1024)

    # A. full raster
    ms_a = timed(lambda: server.raster(side))
    print(f"A  full raster 1024^2:          {ms_a:.3f} ms "
          f"({1024*1024/ms_a*1e3:.3e} samples/s)", flush=True)

    # B. encoding-only raster (same served tables, no MLP)
    tables = server._tables
    n_net = model.model.network.n_params
    params = server._params

    def enc_only(p, t):
        return enc.apply_raster(p[n_net:], side, served_tables=t)

    f_b = jax.jit(enc_only)
    ms_b = timed(f_b, params, tables)
    print(f"B  encoding-only raster:        {ms_b:.3f} ms", flush=True)

    # C. coarse-only (fine levels masked at trace time -> DCE'd)
    n_sep = sum(
        1 for lvl in range(enc.n_levels)
        if float(enc.scales[lvl]) <= enc.raster_max_scale
    )
    ml = (n_sep - 0.5) / enc.n_levels

    def coarse_only(p, t):
        return enc.apply_raster(p[n_net:], side, max_level=ml,
                                served_tables=t)

    f_c = jax.jit(coarse_only)
    ms_c = timed(f_c, params, tables)
    print(f"C  coarse-separable only ({n_sep} lv): {ms_c:.3f} ms "
          f"(=> fine share ~{ms_b - ms_c:.3f} ms)", flush=True)

    # D. standalone fine-level lookup forms
    S, F, C_corners = 2**15, 2, 4
    R = C_corners * F
    n_fine = enc.n_levels - n_sep
    B = 2**20
    rng = np.random.default_rng(0)
    tabs = [jnp.asarray(rng.normal(0, 1, (S, R)), jnp.float32)
            for _ in range(n_fine)]
    idxs = jnp.asarray(rng.integers(0, S, (B, n_fine)), jnp.int32)
    w = jnp.asarray(rng.uniform(0, 1, (B, n_fine, C_corners)), jnp.float32)

    def d1(tabs, idxs, w):
        outs = []
        for l in range(n_fine):
            feats = tabs[l].at[idxs[:, l]].get(mode="promise_in_bounds")
            feats = feats.reshape(B, C_corners, F)
            outs.append(jnp.sum(feats * w[:, l][..., None], axis=1))
        return jnp.stack(outs, 1)

    ms_d1 = timed(jax.jit(d1), tabs, idxs, w)
    print(f"D1 per-level 5 gathers+interp:  {ms_d1:.3f} ms "
          f"({ms_d1/n_fine*1e6/B:.2f} ns/row)", flush=True)

    supert = jnp.concatenate(tabs, 0)
    offs = jnp.asarray(
        np.arange(n_fine, dtype=np.int32) * S, jnp.int32
    )

    def d2(supert, idxs, w):
        gidx = idxs + offs[None, :]
        feats = supert.at[gidx].get(mode="promise_in_bounds")
        feats = feats.reshape(B, n_fine, C_corners, F)
        return jnp.sum(feats * w[..., None], axis=2)

    ms_d2 = timed(jax.jit(d2), supert, idxs, w)
    print(f"D2 ONE supertable gather:       {ms_d2:.3f} ms "
          f"({ms_d2/n_fine*1e6/B:.2f} ns/row)", flush=True)

    K = 128 // R
    packed = [
        t.reshape(S // K, K * R) for t in tabs
    ]  # cell-major packing is fine for a mechanism probe

    def d3(packed, idxs, w):
        outs = []
        for l in range(n_fine):
            rows = packed[l].at[idxs[:, l] // K].get(
                mode="promise_in_bounds"
            )  # (B, 128)
            rows = rows.reshape(B, K, C_corners, F)
            sel = jax.nn.one_hot(idxs[:, l] % K, K, dtype=rows.dtype)
            feats = jnp.sum(rows * sel[:, :, None, None], axis=1)
            outs.append(jnp.sum(feats * w[:, l][..., None], axis=1))
        return jnp.stack(outs, 1)

    ms_d3 = timed(jax.jit(d3), packed, idxs, w)
    print(f"D3 packed gather + slot select: {ms_d3:.3f} ms "
          f"({ms_d3/n_fine*1e6/B:.2f} ns/row)", flush=True)

    # E. pipelining depth
    for reps in (1, 4, 16):
        for _ in range(2):
            outs = [server.raster(side) for _ in range(reps)]
        sync(outs[-1])
        t0 = time.perf_counter()
        outs = [server.raster(side) for _ in range(reps)]
        sync(outs[-1])
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"E  pipeline x{reps:2d}:               {ms:.3f} ms/raster",
              flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()

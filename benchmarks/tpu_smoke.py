"""Broad on-device smoke matrix: every component family runs a few real
training steps on the TPU at small scale. Catches Mosaic/XLA lowering
issues that CPU tests can't."""

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

CASES = {
    "hashgrid_quad_adam": {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam"},
        "encoding": {"otype": "HashGrid", "n_levels": 4,
                     "log2_hashmap_size": 12, "base_resolution": 8,
                     "hash": "CoherentAdditive", "gather_strategy": "quad"},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    },
    "oneblob_sgd": {
        "loss": {"otype": "L2"},
        "optimizer": {"otype": "SGD", "learning_rate": 1e-2},
        "encoding": {"otype": "OneBlob", "n_bins": 16},
        "network": {"otype": "CutlassMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    },
    "frequency_novograd": {
        "loss": {"otype": "L1"},
        "optimizer": {"otype": "Novograd"},
        "encoding": {"otype": "Frequency", "n_frequencies": 8},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 32,
                    "n_hidden_layers": 1},
    },
    "identity_shampoo": {
        "loss": {"otype": "SMAPE"},
        "optimizer": {"otype": "Shampoo", "learning_rate": 5e-3},
        "encoding": {"otype": "Identity"},
        "network": {"otype": "CutlassMLP", "n_neurons": 16,
                    "n_hidden_layers": 1},
    },
    "nrc_ema_adam": {
        "loss": {"otype": "RelativeL2Luminance"},
        "optimizer": {"otype": "EMA", "decay": 0.95,
                      "nested": {"otype": "Adam"}},
        "encoding": {"otype": "NRC"},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    },
    "sh_lookahead": {
        "loss": {"otype": "Mape"},
        "optimizer": {"otype": "Lookahead",
                      "nested": {"otype": "Adam"}},
        "encoding": {"otype": "SphericalHarmonics", "degree": 4},
        "network": {"otype": "CutlassMLP", "n_neurons": 32,
                    "n_hidden_layers": 1},
    },
    "densegrid_batched": {
        "loss": {"otype": "RelativeL1"},
        "optimizer": {"otype": "Batched", "batch_size_multiplier": 2,
                      "nested": {"otype": "Adam"}},
        "encoding": {"otype": "DenseGrid", "n_levels": 4,
                     "base_resolution": 8, "gather_strategy": "quad"},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 16,
                    "n_hidden_layers": 1},
    },
    "stratified_factored_adam": {
        # The flagship fast paths at small scale: stratified static coarse
        # levels + factored MXU scatter (gates forced so the small smoke
        # batch exercises both).
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam"},
        "encoding": {"otype": "HashGrid", "n_levels": 6,
                     "log2_hashmap_size": 10, "base_resolution": 4,
                     "per_level_scale": 1.5, "hash": "CoherentAdditive",
                     "gather_strategy": "stratified", "strata": 32,
                     "scatter_strategy": "factored"},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    },
    "hashgrid_locked_gphase": {
        # Phase-locked G-phase mode (PLAN.md round 3): static-CSR fine
        # levels with 4 jitter phases; exercises the bucketed one-hot
        # scatter matmuls + per-phase roll epilogue on device.
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam"},
        "encoding": {"otype": "HashGrid", "n_levels": 6,
                     "log2_hashmap_size": 10, "base_resolution": 4,
                     "per_level_scale": 1.5, "hash": "CoherentAdditive",
                     "gather_strategy": "stratified", "strata": 32,
                     "phase_locked": True, "locked_phases": 4},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    },
    "smoothstep_3d_expdecay": {
        "loss": {"otype": "L2"},
        "optimizer": {"otype": "ExponentialDecay", "decay_start": 2,
                      "decay_interval": 2, "decay_base": 0.7,
                      "nested": {"otype": "Adam"}},
        "encoding": {"otype": "HashGrid", "n_levels": 4,
                     "log2_hashmap_size": 10, "base_resolution": 4,
                     "interpolation": "Smoothstep"},
        "network": {"otype": "CutlassMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    },
    "factored_kernel_adam": {
        # The fused Pallas factored-scatter kernel (strips in VMEM).
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam"},
        "encoding": {"otype": "HashGrid", "n_levels": 4,
                     "log2_hashmap_size": 12, "base_resolution": 8,
                     "hash": "CoherentAdditive", "gather_strategy": "quad",
                     "scatter_strategy": "factored_kernel"},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    },
    "cf_layout_kernel_sr": {
        # Channel-first (weights-stationary, sublane-packed) FFMLP kernel
        # + the in-kernel stochastic-rounding factored scatter.
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam"},
        "encoding": {"otype": "HashGrid", "n_levels": 4,
                     "log2_hashmap_size": 12, "base_resolution": 8,
                     "hash": "CoherentAdditive", "gather_strategy": "quad",
                     "scatter_strategy": "factored_kernel_sr"},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2, "layout": "cf"},
    },
    "cf_layout_width16": {
        # cfpack G=8: the deepest sublane stacking.
        "loss": {"otype": "L2"},
        "optimizer": {"otype": "SGD", "learning_rate": 1e-2},
        "encoding": {"otype": "OneBlob", "n_bins": 16},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 16,
                    "n_hidden_layers": 2, "layout": "cf",
                    "use_pallas": True},
    },
    "fused_pair_f16_table_adam": {
        # Round-2 knobs: single-matmul compensated pair scatter + fp16
        # forward tables (the reference's param-storage regime).
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam"},
        "encoding": {"otype": "HashGrid", "n_levels": 4,
                     "log2_hashmap_size": 12, "base_resolution": 8,
                     "hash": "CoherentAdditive", "gather_strategy": "quad",
                     "scatter_strategy": "factored_fused",
                     "table_dtype": "float16"},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    },
}


def _csr_precision_case():
    """On-device NUMERICAL check of scatter_packed_static_csr's rounding
    contract — rel error vs a numpy dense reduction. CPU parity tests
    cannot see the TPU MXU's default-precision f32->bf16 operand
    truncation (round-2 postmortem trap #2; it silently degraded the
    'f32' mode to uncompensated single truncation, 37.8 dB on the
    image-fit golden until the HIGHEST fix)."""
    import jax.numpy as jnp

    from tcnn_tpu.ops.scatter_rows import (
        build_static_csr,
        scatter_packed_static_csr,
    )

    rng = np.random.default_rng(7)
    B_, S, C, F = 4096, 2048, 4, 2
    K = 128 // (C * F)
    cells = rng.integers(0, S, B_)
    prow, slot = cells // K, cells % K
    order, lo, nb, M = build_static_csr(prow, S // K, 128)
    ss = np.full(order.shape, -1, np.int32)
    mask = order < B_
    ss[mask] = slot[order[mask]].astype(np.int32)
    rows = rng.normal(0, 1, (B_, C * F)).astype(np.float32)
    want = np.zeros((S // K, 128), np.float64)
    for j in range(B_):
        for c in range(C):
            for f in range(F):
                want[prow[j], c * K * F + slot[j] * F + f] += rows[j, c * F + f]
    scale = np.abs(want).max()
    for rounding, tol in (("f32", 1e-6), ("pair", 1e-4), ("single", 2e-2)):
        got = np.asarray(
            jax.jit(
                lambda r, rd=rounding: scatter_packed_static_csr(
                    r, order, lo, ss.reshape(nb, M), nb, M, K, F,
                    S // K, rd,
                )
            )(jnp.asarray(rows))
        )
        rel = np.abs(got - want).max() / scale
        assert rel < tol, f"csr {rounding}: rel {rel:.2e} >= {tol}"


def _packed_inference_case():
    """Packed-I/O FFMLP inference (round 5): the (B/G, 128) serving
    kernel matches the standard apply on-device (Mosaic-facing side of
    tests/test_ffmlp_packed)."""
    import numpy as np

    import jax.numpy as jnp
    from tcnn_tpu.networks import FullyFusedMLP
    from tcnn_tpu.rng import make_rng

    net = FullyFusedMLP(input_width=32, output_width=3, n_neurons=32,
                        n_hidden_layers=2)
    params = jnp.asarray(net.initialize_params(make_rng(7)))
    B, G = 2048, 4
    x = np.random.default_rng(0).uniform(-1, 1, (B, 32)).astype(np.float32)
    ref = np.asarray(jax.jit(net.apply)(params, jnp.asarray(x)),
                     np.float32)
    out = np.asarray(
        jax.jit(net.apply_packed)(
            params, jnp.asarray(x.reshape(B // G, 128))
        ),
        np.float32,
    ).reshape(B, net.padded_output_width)
    err = np.abs(out - ref).max()
    assert err < 5e-2, f"packed mismatch: {err}"


def _split_state_case():
    """Structured (split-grid) training state (round 5): two steps match
    the flat-state trainer bitwise on-device."""
    import numpy as np

    import jax.numpy as jnp

    cfg = {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "EMA", "decay": 0.95,
                      "nested": {"otype": "Adam"}},
        "encoding": {"otype": "HashGrid", "n_levels": 4,
                     "log2_hashmap_size": 10, "base_resolution": 4,
                     "hash": "CoherentAdditive",
                     "gather_strategy": "quad"},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 32,
                    "n_hidden_layers": 1},
    }
    flat = tc.create_from_config(2, 3, cfg, seed=3)
    split = tc.create_from_config(2, 3, cfg, seed=3,
                                  split_grid_state=True)
    r = np.random.default_rng(0)
    for _ in range(2):
        x = jnp.asarray(r.uniform(0, 1, (1024, 2)).astype(np.float32))
        t = jnp.asarray(r.uniform(0, 1, (1024, 3)).astype(np.float32))
        la = float(flat.trainer.training_step(x, t))
        lb = float(split.trainer.training_step(x, t))
        assert la == lb, f"split-state loss divergence: {la} vs {lb}"
    pa = np.asarray(flat.trainer.params)
    pb = np.asarray(split.trainer.params)
    assert np.array_equal(pa, pb), "split-state params diverged"


def _eikonal_case():
    """Second-order (grad∘grad) compiles and descends on-device through
    the fast paths — the Mosaic-facing side of tests/test_second_order."""
    import jax.numpy as jnp

    from tcnn_tpu.utils.sampling import stratified_uniform

    cfg = {
        "loss": {"otype": "L2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-3},
        "encoding": {"otype": "HashGrid", "n_levels": 4,
                     "log2_hashmap_size": 10, "base_resolution": 4,
                     "hash": "CoherentAdditive", "gather_strategy": "quad",
                     "scatter_strategy": "factored"},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 1},
    }
    model = tc.create_from_config(2, 1, cfg, seed=1)
    x = stratified_uniform(jax.random.PRNGKey(0), 1024, 2)

    def sdf_sum(p, xx):
        return model.model.apply(p, xx)[:, 0].astype(jnp.float32).sum()

    def eik(p):
        gx = jax.grad(sdf_sum, argnums=1)(p, x)
        norm = jnp.sqrt(jnp.sum(gx.astype(jnp.float32) ** 2, -1) + 1e-9)
        return jnp.mean((norm - 1.0) ** 2)

    g = jax.jit(jax.grad(eik))(model.trainer.params)
    assert bool(jnp.isfinite(g).all()), "non-finite eikonal gradient"


# Error-message markers of the remote-compile service's transient failures
# (HTTP 500 / tpu_compile_helper flake) — retried; a persistent failure
# dumps a minimal-repro IR for the service owners (VERDICT r2 #8).
_TRANSIENT_MARKERS = (
    "500", "INTERNAL", "UNAVAILABLE", "DEADLINE", "tpu_compile_helper",
    "Mosaic",
)
_N_ATTEMPTS = 3


def _run_case(name, cfg, n_in):
    """One training-smoke attempt; returns (ok, detail)."""
    t0 = time.time()
    model = tc.create_from_config(n_in, 3, cfg, seed=1)
    r = np.random.default_rng(0)
    losses = []
    stratified = cfg["encoding"].get("gather_strategy") == "stratified"
    if stratified:
        from tcnn_tpu.utils.sampling import stratified_uniform
    locked = cfg["encoding"].get("locked_phases", 0) if cfg[
        "encoding"
    ].get("phase_locked") else 0
    for i in range(8):
        if stratified:
            x = stratified_uniform(
                jax.random.PRNGKey(i), 1024, n_in,
                phase_locked=locked or False,
            )
        else:
            x = jnp.asarray(
                r.uniform(0, 1, (2048, n_in)).astype(np.float32)
            )
        t = jnp.asarray(
            r.uniform(0, 1, (x.shape[0], 3)).astype(np.float32)
        )
        losses.append(float(model.training_step(x, t)))
    out = np.asarray(model.inference(x))
    ok = (
        np.isfinite(losses).all()
        and np.isfinite(out).all()
        and losses[-1] < losses[0] * 1.5
    )
    return ok, (
        f"loss {losses[0]:.3e} -> {losses[-1]:.3e} ({time.time()-t0:.0f}s)"
    )


def _dump_repro_ir(name, cfg, n_in):
    """Lower (client-side; works even when the remote COMPILE fails) the
    failing case's train step and save the StableHLO as a minimal repro.
    Uses the SAME batch size/layout the case ran (stratified cases run
    batch 1024 — a perfect power — so the static/locked grid paths are
    actually in the dumped program; a non-power batch would silently
    lower the per-sample fallback instead)."""
    try:
        model = tc.create_from_config(n_in, 3, cfg, seed=1)
        batch = (
            1024
            if cfg["encoding"].get("gather_strategy") == "stratified"
            else 2048
        )
        x = jnp.zeros((batch, n_in), jnp.float32)
        t = jnp.zeros((batch, 3), jnp.float32)
        trainer = model.trainer
        ir = trainer._jit_train_step.lower(trainer.state, x, t).as_text()
        out = Path(__file__).resolve().parent / "mosaic_repro"
        out.mkdir(exist_ok=True)
        path = out / f"{name}.stablehlo.txt"
        path.write_text(ir)
        return str(path)
    except Exception as e:  # lowering itself failed — record why
        return f"lowering failed: {type(e).__name__}: {str(e)[:120]}"


def main():
    n_in_by_case = {"sh_lookahead": 3, "smoothstep_3d_expdecay": 3,
                    "nrc_ema_adam": 9}
    failures = []
    results = {}
    for name, cfg in CASES.items():
        n_in = n_in_by_case.get(name, 2)
        for attempt in range(_N_ATTEMPTS):
            try:
                ok, detail = _run_case(name, cfg, n_in)
                status = "OK " if ok else "BAD"
                retried = f" [attempt {attempt + 1}]" if attempt else ""
                print(f"{status} {name}: {detail}{retried}", flush=True)
                results[name] = ("ok" if ok else f"bad: {detail}") + (
                    f" (attempt {attempt + 1})" if attempt else ""
                )
                if not ok:
                    failures.append(name)
                break
            except Exception as e:
                msg = f"{type(e).__name__}: {str(e)[:200]}"
                transient = any(m in str(e) for m in _TRANSIENT_MARKERS)
                if transient and attempt + 1 < _N_ATTEMPTS:
                    print(f"RETRY {name} (attempt {attempt + 1}): {msg}",
                          flush=True)
                    time.sleep(5)
                    continue
                print(f"FAIL {name}: {msg}", flush=True)
                repro = _dump_repro_ir(name, cfg, n_in)
                print(f"     repro IR: {repro}", flush=True)
                results[name] = (
                    f"fail after {attempt + 1} attempts: {msg[:120]} "
                    f"(repro: {repro})"
                )
                failures.append(name)
                break

    for cname, fn in (
        ("eikonal_second_order", _eikonal_case),
        ("csr_precision", _csr_precision_case),
        ("packed_inference", _packed_inference_case),
        ("split_state", _split_state_case),
    ):
        try:
            t0 = time.time()
            fn()
            print(f"OK  {cname} ({time.time()-t0:.0f}s)", flush=True)
            results[cname] = "ok"
        except Exception as e:
            print(f"FAIL {cname}: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            results[cname] = f"fail: {type(e).__name__}"
            failures.append(cname)

    # Result file recorded in-repo — the driver/verify gate for Mosaic
    # regressions (VERDICT r1 #7).
    import json
    from datetime import datetime, timezone

    import jaxlib

    out_path = Path(__file__).resolve().parent / "tpu_smoke_result.json"
    out_path.write_text(json.dumps({
        "timestamp": datetime.now(timezone.utc).isoformat(),
        "backend": jax.default_backend(),
        # Per-version canary status: a Mosaic/service regression is only
        # actionable with the toolchain pinned (VERDICT r2 #8).
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "cases": results,
        "failures": failures,
    }, indent=1) + "\n")
    print(f"wrote {out_path}")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all smoke cases passed")


if __name__ == "__main__":
    main()

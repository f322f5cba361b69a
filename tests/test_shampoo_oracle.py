"""Shampoo composed-step golden-sequence parity vs a numpy oracle.

The oracle is an independent float64 transcription of the reference's
full step (reference: optimizers/shampoo.h:636-870): grafting-momentum
kernel (:167-192), debiased alpha/beta pairs (:312-322), L/R EMAs on the
momentum or raw gradient (:721-757, cg_on_momentum), end-of-step root
refresh rotating over shape batches (:832-856) with symmetrize +
identity blending (:195-222) and exact eigendecomposition inverse 4th
roots (the implementation's coupled-Newton iteration must converge to
the same matrix), previous-refresh roots in the update (:766-796),
Frobenius normalization (:798-801, :225-263), weight decay
(common_device.h:1045-1048) and the plain grafting update for remaining
params (:265-283, :858-869). Checked step-by-step for 26 steps covering
the first-step freeze and >=3 refresh boundaries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcnn_tpu.optimizers.shampoo import ShampooOptimizer

LAYERS = [(8, 16), (8, 16), (4, 8)]  # two shape batches: [(0,2), (2,3)]
N_MATRIX = sum(r * c for r, c in LAYERS)
N_REMAINING = 24
N_WEIGHTS = N_MATRIX + N_REMAINING
LOSS_SCALE = 128.0

HP = {
    "learning_rate": 3e-3,
    "beta1": 0.9,
    "beta2": 0.99,
    "beta3": 0.9,
    "beta_shampoo": 0.9,
    "epsilon": 1e-8,
    "identity": 0.01,
    "l2_reg": 1e-5,
    "relative_decay": 1e-3,
    "absolute_decay": 1e-5,
}


def _inv4th_eigh(a):
    """Exact A^{-1/4} of an SPD matrix via eigendecomposition (float64)."""
    vals, vecs = np.linalg.eigh(a)
    return (vecs * vals ** -0.25) @ vecs.T


class Oracle:
    """float64 numpy transcription of ShampooOptimizer<T>::step."""

    def __init__(self, layers, n_weights, cg_on_momentum, frobenius):
        self.layers = layers
        self.n = n_weights
        self.cg = cg_on_momentum
        self.frob = frobenius
        self.step_count = 0
        self.first = np.zeros(n_weights)
        self.second = np.zeros(n_weights)
        self.momentum = np.zeros(n_weights)
        self.sh_momentum = np.zeros(sum(r * c for r, c in layers))
        self.L = [np.zeros((r, r)) for r, c in layers]
        self.R = [np.zeros((c, c)) for r, c in layers]
        self.Lr = [np.eye(r) for r, c in layers]
        self.Rr = [np.eye(c) for r, c in layers]
        # consecutive same-shape runs (shampoo.h:371-396)
        self.batches = []
        cur, start = layers[0], 0
        for i, p in enumerate(layers):
            if p != cur:
                self.batches.append((start, i))
                start, cur = i, p
        self.batches.append((start, len(layers)))

    def _ab(self, decay):
        t = float(self.step_count)  # pre-increment (shampoo.h:636-641)
        debias = 1.0 - decay ** (t + 1.0)
        return (1.0 - decay) / debias, decay * (1.0 - decay**t) / debias

    def step(self, w, grads_scaled):
        hp = HP
        a1, b1 = self._ab(hp["beta1"])
        a2, b2 = self._ab(hp["beta2"])
        a3, b3 = self._ab(hp["beta3"])
        ash, bsh = self._ab(hp["beta_shampoo"])
        self.step_count += 1
        cur = self.step_count

        w = w.astype(np.float64)
        raw_g = grads_scaled.astype(np.float64) / LOSS_SCALE
        g = raw_g + hp["l2_reg"] * w
        self.first = b1 * self.first + a1 * g
        self.second = b2 * self.second + a2 * g * g
        self.momentum = self.first / (np.sqrt(self.second) + hp["epsilon"])

        src = self.momentum if self.cg else raw_g
        new_w = w.copy()
        off = 0
        for li, (M, N) in enumerate(self.layers):
            sz = M * N
            gm = self.momentum[off : off + sz].reshape(M, N)
            pm = src[off : off + sz].reshape(M, N)
            self.L[li] = b3 * self.L[li] + a3 * (pm @ pm.T)
            self.R[li] = b3 * self.R[li] + a3 * (pm.T @ pm)

            if cur - 1 > 0:  # shampoo.h:766-768
                upd = self.Lr[li] @ gm @ self.Rr[li]
                sh = bsh * self.sh_momentum[off : off + sz].reshape(M, N)
                sh = sh + ash * upd
                self.sh_momentum[off : off + sz] = sh.reshape(-1)
                lr = hp["learning_rate"]
                if self.frob:
                    lr = lr * np.sqrt(np.sum(gm * gm)) / np.sqrt(
                        np.sum(sh * sh)
                    )
                wm = w[off : off + sz]
                decayed = (1 - hp["relative_decay"] * lr) * wm - np.copysign(
                    hp["absolute_decay"] * lr, wm
                )
                new_w[off : off + sz] = decayed - lr * sh.reshape(-1)
            off += sz

        # end-of-step root refresh (shampoo.h:832-856)
        interval = 10 if cur < 100 else 200
        single = max(1, interval // len(self.batches))
        if cur == 1:
            to_update = list(range(len(self.batches)))
        elif cur % single == 0:
            to_update = [(cur // single) % len(self.batches)]
        else:
            to_update = []
        ident = HP["identity"]
        for bi in to_update:
            for li in range(*self.batches[bi]):
                M, N = self.layers[li]
                Ls = 0.5 * (self.L[li] + self.L[li].T) * (1 - ident) + (
                    ident * np.eye(M)
                )
                Rs = 0.5 * (self.R[li] + self.R[li].T) * (1 - ident) + (
                    ident * np.eye(N)
                )
                self.Lr[li] = _inv4th_eigh(Ls)
                self.Rr[li] = _inv4th_eigh(Rs)

        # remaining params: plain grafting update, every step
        lr = hp["learning_rate"]
        wr = w[N_MATRIX:]
        decayed = (1 - hp["relative_decay"] * lr) * wr - np.copysign(
            hp["absolute_decay"] * lr, wr
        )
        new_w[N_MATRIX:] = decayed - lr * self.momentum[N_MATRIX:]
        return new_w


@pytest.mark.parametrize(
    "cg,frob", [(True, True), (False, True), (True, False)]
)
def test_golden_sequence_vs_oracle(cg, frob):
    opt = ShampooOptimizer(
        {**HP, "cg_on_momentum": cg, "frobenius_normalization": frob}
    )
    opt.allocate(N_WEIGHTS, LAYERS)
    assert opt.matrix_batches == [(0, 2), (2, 3)]
    state = opt.init_state()
    step = jax.jit(
        lambda s, p, g: opt.step(s, p, g, LOSS_SCALE), donate_argnums=()
    )

    oracle = Oracle(LAYERS, N_WEIGHTS, cg, frob)
    rng = np.random.default_rng(42)
    w_np = rng.standard_normal(N_WEIGHTS) * 0.2
    w_jax = jnp.asarray(w_np, jnp.float32)

    # 26 steps: first-step freeze, refresh boundaries at steps 5,10,15,
    # 20,25 (interval 10 over 2 batches -> single=5, batch rotation).
    for i in range(26):
        grads = rng.standard_normal(N_WEIGHTS) * LOSS_SCALE * 0.1
        w_np = oracle.step(w_np, grads)
        state, w_jax = step(state, w_jax, jnp.asarray(grads, jnp.float32))

        # grafting chain is elementwise math: tight
        np.testing.assert_allclose(
            np.asarray(state["first_moments"]), oracle.first,
            rtol=2e-5, atol=1e-7, err_msg=f"first_moments step {i+1}",
        )
        # L/R EMAs: small matmuls, f32 vs f64
        for li in range(len(LAYERS)):
            np.testing.assert_allclose(
                np.asarray(state["L"][li]), oracle.L[li],
                rtol=5e-4, atol=1e-6, err_msg=f"L[{li}] step {i+1}",
            )
        # roots: Newton (f32) vs eigh (f64)
        for li in range(len(LAYERS)):
            np.testing.assert_allclose(
                np.asarray(state["L_root"][li]), oracle.Lr[li],
                rtol=0, atol=5e-3, err_msg=f"L_root[{li}] step {i+1}",
            )
            np.testing.assert_allclose(
                np.asarray(state["R_root"][li]), oracle.Rr[li],
                rtol=0, atol=5e-3, err_msg=f"R_root[{li}] step {i+1}",
            )
        # weights: full composed chain
        np.testing.assert_allclose(
            np.asarray(w_jax), w_np, rtol=2e-3, atol=2e-4,
            err_msg=f"weights step {i+1}",
        )

    # the sequence exercised >=3 refresh boundaries and both batches
    assert oracle.step_count == 26


def test_first_step_freezes_matrix_params_and_shampoo_momentum():
    opt = ShampooOptimizer(HP)
    opt.allocate(N_WEIGHTS, LAYERS)
    state = opt.init_state()
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal(N_WEIGHTS), jnp.float32)
    g = jnp.asarray(rng.standard_normal(N_WEIGHTS), jnp.float32)
    new_state, new_w = opt.step(state, w, g, 1.0)
    np.testing.assert_array_equal(
        np.asarray(new_w[:N_MATRIX]), np.asarray(w[:N_MATRIX])
    )
    assert float(jnp.abs(new_state["shampoo_momentum"]).max()) == 0.0
    # remaining params DO move on step 1 (shampoo_step_remaining)
    assert float(jnp.abs(new_w[N_MATRIX:] - w[N_MATRIX:]).max()) > 0.0
    # roots initialized at the end of step 1 (not identity any more)
    assert (
        float(
            jnp.abs(
                new_state["L_root"][0] - jnp.eye(LAYERS[0][0])
            ).max()
        )
        > 0.0
    )

"""Shampoo (2nd-order) optimizer with tiny-cuda-nn's exact semantics.

(reference: optimizers/shampoo.h). Per weight matrix G (M x N):

- elementwise (ALL params): debiased Adam-style moments produce a "grafting"
  momentum m1/(sqrt(m2)+eps) (shampoo.h:166-192);
- per-matrix preconditioners L (MxM), R (NxN) as debiased EMAs of G G^T and
  G^T G computed on the momentum (``cg_on_momentum``, shampoo.h:728-757);
- on a refresh schedule (interval 10 early / 200 late, rotated over runs of
  same-shape matrices — shampoo.h:832-842) the inverse 4th roots are
  recomputed AT THE END of the step from the symmetrized, identity-blended
  preconditioners via the coupled Newton iteration of Higham's
  inverse-pth-root method (shampoo.h:434-631); each step's update consumes
  the previous refresh's roots, and nothing matrix-shaped moves on step 1;
- update = EMA_{beta_shampoo}(L^{-1/4} G R^{-1/4}), optionally rescaled so its
  Frobenius norm matches the would-be-Adam update (shampoo.h:798-801);
- params not covered by weight matrices get the plain grafting update
  (``shampoo_step_remaining``, shampoo.h:265-283).

The reference needs cuBLAS strided-batched GEMMs on 3 CUDA streams per
matrix batch; here each step is one XLA program — the tiny GEMMs are batched
and scheduled by the compiler, and the Newton iteration is a
``lax.while_loop``.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..common import json_value
from .base import Optimizer


def _inverse_4th_root(a: jnp.ndarray, max_iters: int = 30) -> jnp.ndarray:
    """A^{-1/4} of an SPD matrix via the coupled Newton iteration
    (shampoo.h:434-631; scheme from Higham, MIMS EP 2005.9 §3.2):

        X_0 = (1/c) I,  M_0 = (1/c^4) A,   c = (rho/sqrt(2))^{1/4}
        T_k = (5 I - M_k) / 4
        X_{k+1} = X_k T_k,  M_{k+1} = T_k^4 M_k     ->  X -> A^{-1/4}

    rho is upper-bounded by ||A^4||_F^{1/4} (the reference's k=4 power trick).
    """
    m = a.shape[-1]
    eye = jnp.eye(m, dtype=a.dtype)
    mm = lambda p, q: jnp.matmul(p, q, precision=jax.lax.Precision.HIGHEST)

    a2 = mm(a, a)
    a4 = mm(a2, a2)
    norm_sq = jnp.sum(a4 * a4)  # ||A^4||_F^2
    rho = norm_sq ** (1.0 / 8.0)  # ||A^4||_F^{1/4} >= spectral radius
    inv_c4 = jnp.sqrt(2.0) / rho  # 1/c^4
    x0 = (inv_c4 ** 0.25) * eye
    m0 = inv_c4 * a

    def body(carry):
        i, x, mk, _ = carry
        t = (5.0 * eye - mk) * 0.25
        t2 = mm(t, t)
        t4 = mm(t2, t2)
        x_new = mm(x, t)
        m_new = mm(t4, mk)
        delta = jnp.sum((x_new - x) ** 2)
        return i + 1, x_new, m_new, delta

    def cond(carry):
        i, _, _, delta = carry
        return (i < max_iters) & (delta > 1e-12) & jnp.isfinite(delta)

    # One unconditional first iteration (mirrors shampoo.h:523-540), then
    # iterate to convergence.
    carry = body((0, x0, m0, jnp.float32(jnp.inf)))
    _, x, _, _ = jax.lax.while_loop(cond, body, carry)
    return x


class ShampooOptimizer(Optimizer):
    otype = "Shampoo"

    def __init__(self, params: Dict = None):
        super().__init__()
        self.base_learning_rate = 1e-3
        self.beta1 = 0.9
        self.beta2 = 0.99
        self.beta3 = 0.9
        self.beta_shampoo = 0.9
        self.epsilon = 1e-8
        self.identity_strength = 0.01
        self.l2_reg = 1e-5
        self.relative_weight_decay = 0.0
        self.absolute_weight_decay = 0.0
        self.cg_on_momentum = True
        self.frobenius_normalization = True
        self.update_hyperparams(params or {})

    def init_state(self):
        n = self.n_weights
        state = {
            "step": jnp.zeros((), jnp.int32),
            "first_moments": jnp.zeros((n,), jnp.float32),
            "second_moments": jnp.zeros((n,), jnp.float32),
            "shampoo_momentum": jnp.zeros(
                (self.n_matrix_weights,), jnp.float32
            ),
            "L": [
                jnp.zeros((rows, rows), jnp.float32)
                for rows, cols in self.layer_sizes
            ],
            "R": [
                jnp.zeros((cols, cols), jnp.float32)
                for rows, cols in self.layer_sizes
            ],
            "L_root": [
                jnp.eye(rows, dtype=jnp.float32)
                for rows, cols in self.layer_sizes
            ],
            "R_root": [
                jnp.eye(cols, dtype=jnp.float32)
                for rows, cols in self.layer_sizes
            ],
        }
        return state

    def _debiased_alpha_beta(self, decay: float, prev_step):
        """(shampoo.h:312-322); prev_step is the pre-increment step count."""
        t = prev_step.astype(jnp.float32)
        debias = 1.0 - decay ** (t + 1.0)
        alpha = (1.0 - decay) / debias
        beta = decay * (1.0 - decay**t) / debias
        return alpha, beta

    @property
    def matrix_batches(self):
        """Runs of consecutive same-shape matrices (shampoo.h:371-396).
        The refresh schedule rotates over BATCHES, not matrices."""
        batches = []
        if self.layer_sizes:
            cur = self.layer_sizes[0]
            start = 0
            for i, p in enumerate(self.layer_sizes):
                if p != cur:
                    batches.append((start, i))
                    start, cur = i, p
            batches.append((start, len(self.layer_sizes)))
        return batches

    def step(self, state, params, grads, loss_scale: float):
        prev = state["step"]
        current = prev + 1
        a1, b1 = self._debiased_alpha_beta(self.beta1, prev)
        a2, b2 = self._debiased_alpha_beta(self.beta2, prev)
        a3, b3 = self._debiased_alpha_beta(self.beta3, prev)
        a_sh, b_sh = self._debiased_alpha_beta(self.beta_shampoo, prev)

        w = params.astype(jnp.float32)
        raw_g = grads.astype(jnp.float32) / loss_scale
        g = raw_g + self.l2_reg * w
        first = b1 * state["first_moments"] + a1 * g
        second = b2 * state["second_moments"] + a2 * g * g
        momentum = first / (jnp.sqrt(second) + self.epsilon)

        n_mat = self.n_matrix_weights
        batches = self.matrix_batches
        n_batches = len(batches)

        new_L, new_R, new_Lr, new_Rr = [], [], [], []
        new_sh_momentum = []
        new_matrix_weights = []

        # Root refresh schedule (shampoo.h:832-842): interval 10 early /
        # 200 late, divided (integer div) over the shape batches. The
        # reference would divide by zero past 10/200 batches; guard at 1.
        single_interval_early = max(1, 10 // max(n_batches, 1))
        single_interval_late = max(1, 200 // max(n_batches, 1))
        single_interval = jnp.where(
            current < 100, single_interval_early, single_interval_late
        )

        # Preconditioner statistics source: the grafting momentum
        # (default) or the raw descaled gradient WITHOUT the l2 term —
        # the reference feeds the untouched gradient buffer to the L/R
        # GEMMs and folds 1/loss_scale^2 into alpha_3 (shampoo.h:638-641,
        # 721-726, cg_on_momentum).
        precond_src = momentum if self.cg_on_momentum else raw_g

        # Per-layer refresh flags (all matrices of a batch move together):
        # every batch on the first step, else batch (step/interval) mod
        # n_batches when step % interval == 0 (shampoo.h:836-842).
        layer_refresh = []
        for bi, (b_start, b_end) in enumerate(batches):
            flag = (prev == 0) | (
                (jnp.mod(current, single_interval) == 0)
                & (jnp.mod(current // single_interval, n_batches) == bi)
            )
            layer_refresh.extend([flag] * (b_end - b_start))

        offset = 0
        for li, (rows, cols) in enumerate(self.layer_sizes):
            size = rows * cols
            gm = momentum[offset : offset + size].reshape(rows, cols)
            pm = precond_src[offset : offset + size].reshape(rows, cols)

            L = b3 * state["L"][li] + a3 * (pm @ pm.T)
            R = b3 * state["R"][li] + a3 * (pm.T @ pm)
            new_L.append(L)
            new_R.append(R)

            # The update step consumes the roots of the PREVIOUS refresh
            # (the reference refreshes at the END of the step, visible
            # from the next step on — shampoo.h:766-830 vs 844-856).
            L_root = state["L_root"][li]
            R_root = state["R_root"][li]

            update = L_root @ gm @ R_root
            sh_prev = state["shampoo_momentum"][offset : offset + size].reshape(
                rows, cols
            )
            sh = b_sh * sh_prev + a_sh * update
            # Neither shampoo-momentum nor the matrix weights move on the
            # very first step: the whole update block is gated on
            # current_step-1 > 0 (shampoo.h:766-768) — the roots are only
            # initialized at the end of step 1.
            sh = jnp.where(prev == 0, sh_prev, sh)
            new_sh_momentum.append(sh.reshape(-1))

            lr = self.base_learning_rate
            if self.frobenius_normalization:
                adam_norm = jnp.sum(gm * gm)
                sh_norm = jnp.sum(sh * sh)
                lr = lr * jnp.sqrt(adam_norm) / jnp.sqrt(sh_norm + 1e-30)

            wm = w[offset : offset + size].reshape(rows, cols)
            decayed = (1 - self.relative_weight_decay * lr) * wm - jnp.sign(
                wm
            ) * (self.absolute_weight_decay * lr)
            updated = decayed - lr * sh
            updated = jnp.where(prev == 0, wm, updated)
            new_matrix_weights.append(updated.reshape(-1))

            def compute_roots(LR, rows=rows, cols=cols):
                Lm, Rm = LR
                Ls = 0.5 * (Lm + Lm.T) * (1 - self.identity_strength) + (
                    self.identity_strength * jnp.eye(rows, dtype=jnp.float32)
                )
                Rs = 0.5 * (Rm + Rm.T) * (1 - self.identity_strength) + (
                    self.identity_strength * jnp.eye(cols, dtype=jnp.float32)
                )
                return _inverse_4th_root(Ls), _inverse_4th_root(Rs)

            def keep_roots(LR, li=li):
                return state["L_root"][li], state["R_root"][li]

            L_root_new, R_root_new = jax.lax.cond(
                layer_refresh[li], compute_roots, keep_roots, (L, R)
            )
            new_Lr.append(L_root_new)
            new_Rr.append(R_root_new)
            offset += size

        # Remaining (non-matrix) params: grafting update (shampoo.h:265-283).
        parts = list(new_matrix_weights)
        if n_mat < self.n_weights:
            wr = w[n_mat:]
            lr = self.base_learning_rate
            decayed = (1 - self.relative_weight_decay * lr) * wr - jnp.sign(
                wr
            ) * (self.absolute_weight_decay * lr)
            parts.append(decayed - lr * momentum[n_mat:])

        new_params = jnp.concatenate(parts) if parts else w
        new_state = {
            "step": current,
            "first_moments": first,
            "second_moments": second,
            "shampoo_momentum": (
                jnp.concatenate(new_sh_momentum)
                if new_sh_momentum
                else state["shampoo_momentum"]
            ),
            "L": new_L,
            "R": new_R,
            "L_root": new_Lr,
            "R_root": new_Rr,
        }
        return new_state, new_params

    @property
    def learning_rate(self) -> float:
        return self.base_learning_rate

    @learning_rate.setter
    def learning_rate(self, value: float):
        self.base_learning_rate = float(value)

    def update_hyperparams(self, params: Dict):
        for key, attr in [
            ("beta1", "beta1"),
            ("beta2", "beta2"),
            ("beta3", "beta3"),
            ("beta_shampoo", "beta_shampoo"),
            ("epsilon", "epsilon"),
            ("identity_strength", "identity_strength"),
            ("learning_rate", "base_learning_rate"),
            ("l2_reg", "l2_reg"),
            ("relative_decay", "relative_weight_decay"),
            ("absolute_decay", "absolute_weight_decay"),
            ("cg_on_momentum", "cg_on_momentum"),
            ("frobenius_normalization", "frobenius_normalization"),
        ]:
            v = json_value(params, key, None)
            if v is not None:
                setattr(self, attr, v)

    def hyperparams(self) -> Dict:
        return {
            "otype": self.otype,
            "beta1": self.beta1,
            "beta2": self.beta2,
            "beta3": self.beta3,
            "beta_shampoo": self.beta_shampoo,
            "epsilon": self.epsilon,
            "identity_strength": self.identity_strength,
            "learning_rate": self.base_learning_rate,
            "l2_reg": self.l2_reg,
            "relative_decay": self.relative_weight_decay,
            "absolute_decay": self.absolute_weight_decay,
            "cg_on_momentum": self.cg_on_momentum,
            "frobenius_normalization": self.frobenius_normalization,
        }

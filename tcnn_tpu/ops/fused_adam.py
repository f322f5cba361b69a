"""Fused Adam step as ONE Pallas TPU kernel over the flat parameter vector.

The XLA expression of the tcnn Adam semantics (optimizers/adam.py) is a
chain of ~15 elementwise ops over nine (n,)-vectors; at flagship scale the
composed profile attributed ~1.5 ms/step to the resulting fusions/whiles —
~15x off HBM bandwidth for what the reference does in one fused CUDA kernel
(reference: optimizers/adam.h:47-127). This kernel reads params, gradients,
both moments and the per-param step counters once from HBM, applies the
exact adam.h update (loss-scale descale, matrix/non-matrix split,
skip-zero-grad, per-param step debias, AdaBound, weight decay/clip) in
VMEM, and writes the four outputs once: 9 vector streams total, nothing
else.

Semantics are bit-for-bit the optimizers/adam.py XLA path (shared test:
tests/test_fused_adam.py sweeps the knob matrix); hyperparameters are
static (baked into the kernel, like the jitted XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_utils import cdiv, interpret_mode

_LANES = 128
_ROWS = 512  # block = (512, 128) f32 = 256 KB per stream


def _adam_kernel(
    step_ref,  # SMEM (1, 1) i32 — global step count (AdaBound bounds)
    p_ref,
    g_ref,
    m_ref,
    v_ref,
    ps_ref,
    p_out,
    m_out,
    v_out,
    ps_out,
    *,
    rows: int,
    n_matrix: int,
    loss_scale: float,
    beta1: float,
    beta2: float,
    epsilon: float,
    base_lr: float,
    l2_reg: float,
    nm_lr_factor: float,
    nm_l2_reg: float,
    rel_decay: float,
    abs_decay: float,
    weight_clip: float,
    grad_clip: float,
    adabound: bool,
    opt_matrix: bool,
    opt_non_matrix: bool,
    skip_zero_grad: bool,
):
    base = pl.program_id(0) * (rows * _LANES)
    flat_idx = (
        base
        + jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0) * _LANES
        + jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    )
    is_matrix = flat_idx < n_matrix

    weight = p_ref[...]
    gradient = g_ref[...] / loss_scale

    # Active mask (adam.h:79-88): which params update this step. The
    # skip-zero test uses the descaled, pre-l2 gradient, like the XLA path.
    active = jnp.where(is_matrix, bool(opt_matrix), bool(opt_non_matrix))
    if skip_zero_grad:
        active = active & (is_matrix | (gradient != 0.0))

    gradient = gradient + jnp.where(is_matrix, l2_reg, nm_l2_reg) * weight
    if grad_clip != 0.0:
        gradient = jnp.clip(gradient, -grad_clip, grad_clip)

    first = beta1 * m_ref[...] + (1 - beta1) * gradient
    second = beta2 * v_ref[...] + (1 - beta2) * gradient * gradient

    lr = jnp.where(is_matrix, base_lr, base_lr * nm_lr_factor)

    # Per-param step counters for debiasing (adam.h:111-113).
    param_steps = ps_ref[...] + active.astype(jnp.int32)
    ps = jnp.maximum(param_steps, 1).astype(jnp.float32)
    lr = lr * jnp.sqrt(1 - jnp.float32(beta2) ** ps) / (
        1 - jnp.float32(beta1) ** ps
    )

    if adabound:
        t = step_ref[0, 0].astype(jnp.float32)
        lower = 0.1 - 0.1 / ((1 - beta2) * t + 1)
        upper = 0.1 + 0.1 / ((1 - beta2) * t)
    else:
        lower = 0.0
        upper = jnp.float32(np.finfo(np.float32).max)

    effective_lr = jnp.clip(lr / (jnp.sqrt(second) + epsilon), lower, upper)

    decayed = (1 - rel_decay * lr) * weight - jnp.sign(weight) * (
        abs_decay * lr
    )
    new_weight = decayed - effective_lr * first
    if weight_clip != 0.0:
        new_weight = jnp.clip(new_weight, -weight_clip, weight_clip)

    p_out[...] = jnp.where(active, new_weight, weight)
    m_out[...] = jnp.where(active, first, m_ref[...])
    v_out[...] = jnp.where(active, second, v_ref[...])
    ps_out[...] = param_steps


def adam_step_fused(
    params,
    grads,
    first_moments,
    second_moments,
    param_steps,
    current_step,
    *,
    n_matrix: int,
    loss_scale: float,
    hp,
    rows: int = _ROWS,
):
    """One fused Adam step; returns (params, first, second, param_steps).

    ``hp`` is the AdamOptimizer instance (static hyperparameter source);
    ``current_step`` the post-increment global step (traced scalar).
    """
    n = params.shape[0]
    block = rows * _LANES
    n_pad = cdiv(n, block) * block
    pad = n_pad - n

    def shape2(x, dtype):
        x = x.astype(dtype)
        if pad:
            # Padded tail: index >= n >= n_matrix -> non-matrix lane with
            # zero gradient; sliced off below before anyone observes it.
            x = jnp.concatenate([x, jnp.zeros((pad,), dtype)])
        return x.reshape(n_pad // _LANES, _LANES)

    inputs = (
        current_step.astype(jnp.int32).reshape(1, 1),
        shape2(params, jnp.float32),
        shape2(grads, jnp.float32),
        shape2(first_moments, jnp.float32),
        shape2(second_moments, jnp.float32),
        shape2(param_steps, jnp.int32),
    )
    vec_spec = pl.BlockSpec(
        (rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out2 = jax.ShapeDtypeStruct((n_pad // _LANES, _LANES), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(
            _adam_kernel,
            rows=rows,
            n_matrix=int(n_matrix),
            loss_scale=float(loss_scale),
            beta1=float(hp.beta1),
            beta2=float(hp.beta2),
            epsilon=float(hp.epsilon),
            base_lr=float(hp.base_learning_rate),
            l2_reg=float(hp.l2_reg),
            nm_lr_factor=float(hp.non_matrix_learning_rate_factor),
            nm_l2_reg=float(hp.non_matrix_l2_reg),
            rel_decay=float(hp.relative_weight_decay),
            abs_decay=float(hp.absolute_weight_decay),
            weight_clip=float(hp.weight_clipping_magnitude),
            grad_clip=float(hp.gradient_clipping_magnitude),
            adabound=bool(hp.adabound),
            opt_matrix=bool(hp.optimize_matrix_params),
            opt_non_matrix=bool(hp.optimize_non_matrix_params),
            skip_zero_grad=bool(hp.skip_zero_grad_non_matrix_params),
        ),
        grid=(n_pad // block,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            vec_spec,
            vec_spec,
            vec_spec,
            vec_spec,
            vec_spec,
        ],
        out_specs=(vec_spec,) * 4,
        out_shape=(
            out2,
            out2,
            out2,
            jax.ShapeDtypeStruct((n_pad // _LANES, _LANES), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=25 * n_pad,
            bytes_accessed=9 * n_pad * 4,
            transcendentals=2 * n_pad,
        ),
        interpret=interpret_mode(),
    )(*inputs)
    return tuple(o.reshape(-1)[:n] for o in outs)

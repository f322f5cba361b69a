"""Activation functions.

Forward formulas match the reference exactly
(reference: common_device.h:110-230, K_ACT=10 at :108); backward comes from
JAX autodiff (the reference hand-writes warp_activation_backward).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..common import Activation, K_ACT


def activation_fn(x, activation: Activation):
    if activation == Activation.NONE:
        return x
    if activation == Activation.ReLU:
        return jnp.maximum(x, 0)
    if activation == Activation.LeakyReLU:
        return x * jnp.where(x > 0, 1.0, 0.01).astype(x.dtype)
    if activation == Activation.SiLU:
        return x * jax_sigmoid(x)
    if activation == Activation.Exponential:
        return jnp.exp(x)
    if activation == Activation.Sine:
        return jnp.sin(x)
    if activation == Activation.Sigmoid:
        return jax_sigmoid(x)
    if activation == Activation.Squareplus:
        xk = x * K_ACT
        return (0.5 * (xk + jnp.sqrt(xk * xk + 4.0)) / K_ACT).astype(x.dtype)
    if activation == Activation.Softplus:
        # log(exp(x*K)+1)/K, computed stably.
        xk = x.astype(jnp.float32) * K_ACT
        return (jnp.logaddexp(xk, 0.0) / K_ACT).astype(x.dtype)
    if activation == Activation.Tanh:
        return jnp.tanh(x)
    raise ValueError(f"Unsupported activation: {activation}")


def jax_sigmoid(x):
    import jax

    return jax.nn.sigmoid(x)

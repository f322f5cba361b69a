"""Second-order autograd through the torch bindings.

Ports the reference's gradcheck/gradgradcheck protocol
(reference: scripts/test_grid_bwdbwd.py:119-133 — gradcheck and
gradgradcheck of the hash-grid encoding through the torch autograd
bridge) and adds exactness tests against jax.grad-of-grad, which the
reference cannot do (its double-backward omits several terms,
test_grid_bwdbwd.py:168-193; ours is the exact vjp-of-the-vjp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import autograd

import tcnn_tpu.modules as jm
import tcnn_tpu.torch_modules as tm

# Smoothstep interpolation: C1 forward, so finite-difference checks of
# the backward are well-posed (the reference's bwdbwd script also uses
# smoothstep=True for its gradcheck model).
ENC = {
    "otype": "HashGrid", "n_levels": 3, "n_features_per_level": 2,
    "log2_hashmap_size": 8, "base_resolution": 4, "per_level_scale": 1.6,
    "interpolation": "Smoothstep",
}

# Interior points away from cell boundaries (the reference pins
# [[0.17, 0.55, 0.79]] for the same reason).
X0 = np.array([[0.17, 0.55], [0.63, 0.29], [0.41, 0.87]], np.float32)


@pytest.fixture(scope="module")
def enc():
    return tm.Encoding(2, ENC, seed=11)


def test_gradcheck_wrt_input(enc):
    x = torch.from_numpy(X0.copy()).requires_grad_(True)
    assert autograd.gradcheck(
        lambda xx: enc(xx), (x,), eps=1e-3, atol=1e-2, rtol=1e-2
    )


def test_gradgradcheck_wrt_input(enc):
    x = torch.from_numpy(X0.copy()).requires_grad_(True)
    assert autograd.gradgradcheck(
        lambda xx: enc(xx), (x,), eps=1e-3, atol=1e-2, rtol=1e-2
    )


def test_second_order_exact_vs_jax(enc):
    """Eikonal-style composition: d/dparams of sum((dy/dx * v)^2) —
    exercises ddLdx_dgrid and the full mixed second-order chain, checked
    EXACTLY against jax.grad∘jax.grad (same f32 compute path)."""
    j = jm.Encoding(2, ENC, seed=11)
    n_out = enc.n_output_dims
    rng = np.random.default_rng(3)
    w = rng.standard_normal((X0.shape[0], n_out)).astype(np.float32)

    # torch side
    x = torch.from_numpy(X0.copy()).requires_grad_(True)
    y = enc(x)
    (gx,) = autograd.grad(
        (y * torch.from_numpy(w)).sum(), x, create_graph=True
    )
    loss2 = (gx * gx).sum()
    loss2.backward()
    gp_torch = enc.params.grad.numpy()
    gx2_torch = x.grad.numpy()

    # jax side
    def first(p, xx):
        out = j.apply(p, xx)[:, :n_out].astype(jnp.float32)
        return jnp.sum(out * w)

    def second(p, xx):
        gxx = jax.grad(first, argnums=1)(p, xx)
        return jnp.sum(gxx * gxx)

    gp_jax, gx2_jax = jax.grad(second, argnums=(0, 1))(
        j.params, jnp.asarray(X0)
    )
    np.testing.assert_allclose(
        gp_torch, np.asarray(gp_jax), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        gx2_torch, np.asarray(gx2_jax), rtol=1e-5, atol=1e-6
    )


def test_second_order_params_only(enc):
    """grad wrt params of sum(dL_dx^2) with params in the graph —
    the ddLdx_dgrid term the reference also supports; exact vs JAX."""
    j = jm.Encoding(2, ENC, seed=11)
    n_out = enc.n_output_dims

    x = torch.from_numpy(X0.copy()).requires_grad_(True)
    y = enc(x)
    (gx,) = autograd.grad(y.sum(), x, create_graph=True)
    (gp,) = autograd.grad(gx.sum(), enc.params)

    def first(p, xx):
        return jnp.sum(j.apply(p, xx)[:, :n_out].astype(jnp.float32))

    gp_jax = jax.grad(
        lambda p: jnp.sum(jax.grad(first, argnums=1)(p, jnp.asarray(X0)))
    )(j.params)
    np.testing.assert_allclose(
        gp.numpy(), np.asarray(gp_jax), rtol=1e-5, atol=1e-6
    )


def test_third_order_raises(enc):
    """One order past the reference is a clear error, not silence."""
    x = torch.from_numpy(X0.copy()).requires_grad_(True)
    y = enc(x)
    (gx,) = autograd.grad(y.sum(), x, create_graph=True)
    (gx2,) = autograd.grad((gx * gx).sum(), x, create_graph=True)
    with pytest.raises(RuntimeError):
        autograd.grad(gx2.sum(), x)


def test_outputs_own_their_memory(enc):
    """Module outputs and .grad buffers must be writable owned tensors
    (in-place ops and grad accumulation are UB on aliased JAX views)."""
    x = torch.from_numpy(X0.copy()).requires_grad_(True)
    y = enc(x)
    y.detach().add_(1.0)  # in-place on the output buffer
    enc.params.grad = None
    # two backwards accumulate into .grad in place
    for _ in range(2):
        enc(x).sum().backward()
    assert enc.params.grad is not None


def test_gradient_accumulation_matches_sum(enc):
    """param.grad after two backward() calls == 2x a single call
    (fails if backward grads alias read-only JAX buffers)."""
    x = torch.from_numpy(X0.copy())
    enc.params.grad = None
    enc(x).sum().backward()
    once = enc.params.grad.clone()
    enc(x).sum().backward()
    np.testing.assert_allclose(
        enc.params.grad.numpy(), (2 * once).numpy(), rtol=1e-6, atol=0
    )


def test_dtype_parity_arg_warns():
    with pytest.warns(UserWarning, match="ignores dtype"):
        tm.Encoding(2, ENC, seed=1, dtype=torch.half)


def test_program_cache_bounded():
    m = tm.Encoding(2, ENC, seed=2)
    cap = tm._TorchModule._CACHE_MAX
    for i in range(cap + 4):
        m(torch.rand(256 * (i + 1), 2))
    assert len(m._jits) <= cap

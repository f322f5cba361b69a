"""PyTorch binding bridge (tcnn_tpu/torch_modules.py).

Pins: forward parity with the JAX modules, exactness of the autograd
bridge's params/input gradients against jax.grad, batch-granularity
padding, and end-to-end training with a torch optimizer. Reference
surface being mirrored: bindings/torch/tinycudann/modules.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import tcnn_tpu.modules as jm
import tcnn_tpu.torch_modules as tm

ENC = {
    "otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
    "log2_hashmap_size": 9, "base_resolution": 4, "per_level_scale": 1.5,
}
NET = {"otype": "CutlassMLP", "n_neurons": 32, "n_hidden_layers": 1,
       "activation": "ReLU", "output_activation": "None"}


def make_pair(seed=7):
    t = tm.NetworkWithInputEncoding(2, 3, ENC, NET, seed=seed)
    j = jm.NetworkWithInputEncoding(2, 3, ENC, NET, seed=seed)
    return t, j


def test_forward_parity():
    t, j = make_pair()
    np.testing.assert_array_equal(
        t.params.detach().numpy(), np.asarray(j.params)
    )
    x = np.random.default_rng(0).uniform(0, 1, (256, 2)).astype(np.float32)
    y_t = t(torch.from_numpy(x)).detach().numpy()
    y_j = np.asarray(j(jnp.asarray(x)))[:, :3]
    np.testing.assert_allclose(y_t, y_j, rtol=0, atol=1e-6)


@pytest.mark.parametrize("batch", [256, 250])  # incl. non-granular batch
def test_gradients_exact(batch):
    t, j = make_pair()
    x_np = np.random.default_rng(1).uniform(0, 1, (batch, 2)).astype(
        np.float32
    )
    w_np = np.random.default_rng(2).standard_normal((batch, 3)).astype(
        np.float32
    )

    x_t = torch.from_numpy(x_np.copy()).requires_grad_(True)
    y = t(x_t)
    loss = (y * torch.from_numpy(w_np)).sum()
    loss.backward()

    def jax_loss(p, xx):
        out = j.apply(p, xx)[:, :3]
        return jnp.sum(out * jnp.asarray(w_np))

    gp_j, gx_j = jax.grad(jax_loss, argnums=(0, 1))(
        j.params, jnp.asarray(x_np)
    )
    np.testing.assert_allclose(
        t.params.grad.numpy(), np.asarray(gp_j), rtol=0, atol=1e-5
    )
    np.testing.assert_allclose(
        x_t.grad.numpy(), np.asarray(gx_j), rtol=0, atol=1e-5
    )


def test_torch_optimizer_trains():
    t, _ = make_pair(seed=3)
    opt = torch.optim.Adam(t.parameters(), lr=1e-2)
    r = np.random.default_rng(4)
    x_np = r.uniform(0, 1, (512, 2)).astype(np.float32)
    x = torch.from_numpy(x_np)
    target = torch.from_numpy(
        np.stack(
            [x_np[:, 0], x_np[:, 1], (x_np[:, 0] + x_np[:, 1]) / 2], axis=1
        )
    )
    losses = []
    for _ in range(40):
        opt.zero_grad()
        loss = torch.nn.functional.mse_loss(t(x), target)
        loss.backward()
        opt.step()
        losses.append(float(loss))
    assert losses[-1] < 0.3 * losses[0], losses[:: len(losses) - 1]


def test_encoding_module():
    enc_t = tm.Encoding(2, ENC, seed=5)
    enc_j = jm.Encoding(2, ENC, seed=5)
    assert enc_t.n_output_dims == enc_j.n_output_dims
    x = np.random.default_rng(6).uniform(0, 1, (128, 2)).astype(np.float32)
    np.testing.assert_allclose(
        enc_t(torch.from_numpy(x)).detach().numpy(),
        np.asarray(enc_j(jnp.asarray(x)))[:, : enc_t.n_output_dims],
        rtol=0, atol=1e-6,
    )
    # gradient flows to the (grid) params through the bridge
    y = enc_t(torch.from_numpy(x))
    y.sum().backward()
    assert enc_t.params.grad is not None
    assert float(enc_t.params.grad.abs().sum()) > 0


def test_network_module_and_repr():
    net = tm.Network(8, 3, NET, seed=9)
    x = torch.rand(64, 8)
    y = net(x)
    assert y.shape == (64, 3) and torch.isfinite(y).all()
    assert "n_params" in repr(net)
    with pytest.raises(ValueError, match="dims"):
        net(torch.rand(4, 7))

"""Probe: where do the 700ms of backward go?"""

import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parent.parent))

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import tcnn_tpu as tc
from __graft_entry__ import FLAGSHIP_CONFIG

model = tc.create_from_config(2, 3, FLAGSHIP_CONFIG)
trainer = model.trainer
enc = model.model.encoding
net = model.model.network
n_net = net.n_params

r = np.random.default_rng(0)
batch = 2**18
xy = jnp.asarray(r.uniform(0, 1, (batch, 2)).astype(np.float32))
tgt = jnp.asarray(r.uniform(0, 1, (batch, 3)).astype(np.float32))


def run(name, fn, *args, reps=10):
    t0 = time.time()
    c = jax.jit(fn).lower(*args).compile()
    print(f"{name}: compile {time.time()-t0:.0f}s", flush=True)
    out = c(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _i in range(reps):
        out = c(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    print(f"{name}: {(time.time()-t0)/reps*1e3:.1f} ms", flush=True)


# (a) encoding-only backward: grad of sum(enc(x)^2) wrt grid params.
def enc_only_bwd(params, inputs):
    p_enc = params[n_net:]
    g = jax.grad(
        lambda pe: (enc.apply(pe, inputs).astype(jnp.float32) ** 2).sum()
    )(p_enc)
    return g.sum()


run("enc-only backward", enc_only_bwd, trainer.state["params"], xy)


# (b) MLP-only backward: encoding output detached.
def mlp_only_bwd(params, inputs, targets):
    encoded = jax.lax.stop_gradient(
        enc.apply(params[n_net:], inputs)
    )

    def f(pn):
        out = net.apply(pn, encoded)
        values, _ = model.loss.evaluate(trainer.loss_scale, out, targets)
        return jnp.sum(values)

    g = jax.grad(f)(params[:n_net])
    return g.sum()


run("mlp-only backward", mlp_only_bwd, trainer.state["params"], xy, tgt)


# (c) encoding backward wrt INPUTS only (dy/dx path).
def enc_dx_bwd(params, inputs):
    p_enc = jax.lax.stop_gradient(params[n_net:])
    g = jax.grad(
        lambda xx: (enc.apply(p_enc, xx).astype(jnp.float32) ** 2).sum()
    )(inputs)
    return g.sum()


run("enc-dx backward", enc_dx_bwd, trainer.state["params"], xy)

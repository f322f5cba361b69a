"""Quad-strategy variant sweep (fast: quad graphs compile in ~10-30 s)."""

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
from __graft_entry__ import FLAGSHIP_CONFIG

model = tc.create_from_config(2, 3, FLAGSHIP_CONFIG)
trainer = model.trainer
enc = model.model.encoding
n_net = model.model.network.n_params

r = np.random.default_rng(0)
batch = 2**18
xy = jnp.asarray(r.uniform(0, 1, (batch, 2)).astype(np.float32))
tgt = jnp.asarray(r.uniform(0, 1, (batch, 3)).astype(np.float32))


def run(name, fn, *args, reps=20):
    t0 = time.time()
    c = jax.jit(fn).lower(*args).compile()
    tc_ = time.time() - t0
    out = c(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _i in range(reps):
        out = c(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    print(f"{name}: compile {tc_:.0f}s, {(time.time()-t0)/reps*1e3:.1f} ms",
          flush=True)


run("quad full step", trainer._train_step, trainer.state, xy, tgt)


def fwd_loss(state, inputs, targets):
    out = model.model.apply(state["params"], inputs)
    values, _ = model.loss.evaluate(trainer.loss_scale, out, targets)
    return jnp.sum(values)


run("quad fwd+loss", fwd_loss, trainer.state, xy, tgt)


def enc_bwd(params, inputs):
    p_enc = params[n_net:]
    g = jax.grad(
        lambda pe: (enc.apply(pe, inputs).astype(jnp.float32) ** 2).sum()
    )(p_enc)
    return g.sum()


run("quad enc-only backward", enc_bwd, trainer.state["params"], xy)

enc.index_mode = "promise_in_bounds"
run("quad step promise-mode", trainer._train_step, trainer.state, xy, tgt)
run("quad enc-bwd promise-mode", enc_bwd, trainer.state["params"], xy)
enc.index_mode = None

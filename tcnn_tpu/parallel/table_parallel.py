"""Table-(model-)parallel grid encoding over a mesh axis.

The reference is single-GPU: its scaling ceiling is the hash table
fitting one device (``log2_hashmap_size`` ~24 on a 24 GB card,
reference: encodings/grid.h:428-436 table allocation). This module
row-shards EVERY level's table across a mesh axis so grids larger than
one chip's HBM train and serve across ICI — the TPU-native answer to
that ceiling (there is no reference analogue to port).

Design (TPU-first):

- Each device owns a contiguous ``ceil(S_l / n)``-row block of every
  level. The forward is index arithmetic (replicated work) + ONE local
  gather with an ownership mask; a single ``psum`` over the axis
  assembles the per-sample features.
- Communication is O(batch * L * F) per apply — independent of table
  size. The table GRADIENT needs no communication at all: autodiff
  turns mask+psum into a broadcast + locally-masked scatter, so each
  device scatter-adds only into its own rows.
- Model parallelism here trades ``n``x replicated index compute for
  ``n``x memory capacity — the right trade exactly when the table
  cannot fit one chip. For tables that fit, use
  :class:`~tcnn_tpu.parallel.DataParallelTrainer` (replicated params).
- Composes with data parallelism on an orthogonal mesh axis: pass
  ``data_axis`` and shard the batch there; the feature psum stays on
  the model axis only.

Scope: the ``per_level`` vertex-gather execution path (any hash type,
Nearest/Linear/Smoothstep) — the giant-table regime this exists for.
The quad/stratified fast paths assume device-local tables and stay
single-device."""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..common import InterpolationType
from ..encodings.grid import GridEncoding, _grid_hash


class TableParallelGrid:
    """Row-shards a :class:`GridEncoding`'s tables over ``mesh[axis]``.

    ``shard_params(params)`` relays the flat parameter vector into an
    ``(n * local_n_params,)`` stack (device ``d``'s block at
    ``[d * local_n_params, (d+1) * local_n_params)``); ``apply`` runs the
    sharded lookup under ``shard_map`` and returns features identical to
    ``encoding.apply`` (per_level strategy) on the unsharded params.
    """

    def __init__(
        self,
        encoding: GridEncoding,
        mesh: Mesh,
        axis: str = "model",
        data_axis: Optional[str] = None,
    ):
        if encoding.stochastic_interpolation:
            raise NotImplementedError(
                "table-parallel grid: stochastic interpolation is "
                "single-device only"
            )
        self.encoding = encoding
        self.mesh = mesh
        self.axis = axis
        self.data_axis = data_axis
        self.n_shards = int(mesh.shape[axis])

        F = encoding.n_features_per_level
        off = encoding.offset_table
        self.level_sizes = [
            int(off[l + 1] - off[l]) for l in range(encoding.n_levels)
        ]
        # Per-device rows per level (8-row aligned like the global layout).
        self.local_rows = [
            -(-s // self.n_shards) for s in self.level_sizes
        ]
        self.local_offsets = np.concatenate(
            [[0], np.cumsum(self.local_rows)]
        ).astype(np.int64)
        self.local_n_params = int(self.local_offsets[-1]) * F

    # -- parameter relayout --------------------------------------------------
    def shard_params(self, params) -> np.ndarray:
        """Flat (n_params,) -> (n_shards * local_n_params,) block stack
        (host-side numpy; do once, then ``jax.device_put`` with
        ``PartitionSpec(axis)``)."""
        e = self.encoding
        F = e.n_features_per_level
        table = np.asarray(params, np.float32).reshape(-1, F)
        out = np.zeros((self.n_shards, self.local_n_params // F, F), np.float32)
        for lvl, (size, rows) in enumerate(
            zip(self.level_sizes, self.local_rows)
        ):
            goff = int(e.offset_table[lvl])
            loff = int(self.local_offsets[lvl])
            for d in range(self.n_shards):
                lo = d * rows
                hi = min(lo + rows, size)
                if hi > lo:
                    out[d, loff : loff + (hi - lo)] = table[
                        goff + lo : goff + hi
                    ]
        return out.reshape(-1)

    def unshard_params(self, stacked) -> np.ndarray:
        """Inverse of :meth:`shard_params` (for checkpointing in the
        reference-compatible flat layout)."""
        e = self.encoding
        F = e.n_features_per_level
        blocks = np.asarray(stacked, np.float32).reshape(
            self.n_shards, self.local_n_params // F, F
        )
        table = np.zeros((int(e.offset_table[-1]), F), np.float32)
        for lvl, (size, rows) in enumerate(
            zip(self.level_sizes, self.local_rows)
        ):
            goff = int(e.offset_table[lvl])
            loff = int(self.local_offsets[lvl])
            for d in range(self.n_shards):
                lo = d * rows
                hi = min(lo + rows, size)
                if hi > lo:
                    table[goff + lo : goff + hi] = blocks[
                        d, loff : loff + (hi - lo)
                    ]
        return table.reshape(-1)

    # -- sharded lookup --------------------------------------------------------
    def _local_apply(self, local_params, x):
        """Per-device body (inside shard_map): local gather + mask; the
        caller psums over the model axis. Index math mirrors
        ``GridEncoding.apply``'s per_level path (grid.h:49-212)."""
        e = self.encoding
        d = e.n_dims_to_encode
        F = e.n_features_per_level
        L = e.n_levels
        batch = x.shape[0]
        x = x.astype(jnp.float32)
        table_local = local_params.reshape(-1, F)
        dev = jax.lax.axis_index(self.axis)
        nearest = e.interpolation_type == InterpolationType.Nearest
        outs = []
        for lvl in range(L):
            scale = float(e.scales[lvl])
            size = self.level_sizes[lvl]
            rows = self.local_rows[lvl]
            loff = int(self.local_offsets[lvl])

            pos = x * scale + 0.5
            pos_floor = jnp.floor(pos)
            pos_grid = pos_floor.astype(jnp.int32)
            t = pos - pos_floor
            if e.interpolation_type == InterpolationType.Smoothstep:
                t = t * t * (3.0 - 2.0 * t)
            if nearest:
                corner = pos_grid.astype(jnp.uint32)[:, None, :]
                weights = jnp.ones((batch, 1), jnp.float32)
            else:
                corners = jnp.asarray(e._corners, jnp.int32)
                corner = (
                    pos_grid[:, None, :] + corners[None, :, :]
                ).astype(jnp.uint32)
                bits = corners[None, :, :].astype(jnp.float32)
                weights = jnp.prod(
                    bits * t[:, None, :] + (1.0 - bits) * (1.0 - t[:, None, :]),
                    axis=-1,
                )

            strides = e._level_strides(lvl)
            if strides is not None:
                idx = jnp.zeros(corner.shape[:-1], jnp.uint32)
                for dim in range(d):
                    idx = idx + corner[..., dim] * jnp.uint32(
                        strides[dim] & 0xFFFFFFFF
                    )
            else:
                idx = _grid_hash(corner, e.hash_type)
            idx = (idx % jnp.uint32(size)).astype(jnp.int32)

            loc = idx - dev.astype(jnp.int32) * rows
            valid = (loc >= 0) & (loc < rows)
            safe = jnp.clip(loc, 0, rows - 1) + loff
            f = table_local.at[safe].get(mode="promise_in_bounds")
            f = jnp.where(valid[..., None], f, 0.0)
            outs.append(jnp.sum(f * weights[..., None], axis=1))
        y = jnp.stack(outs, axis=1).reshape(batch, L * F)
        return jax.lax.psum(y, self.axis)

    def apply(self, stacked_params, x):
        """Sharded lookup: ``stacked_params`` is the shard_params stack
        ((n_shards * local_n_params,)), ``x`` the (possibly data-sharded)
        batch. Returns (B, L*F) features, replicated over the model axis.
        Differentiable — table gradients flow to each device's own rows
        with no cross-device traffic."""
        xspec = P(self.data_axis) if self.data_axis else P()
        return shard_map(
            self._local_apply,
            mesh=self.mesh,
            in_specs=(P(self.axis), xspec),
            out_specs=xspec,
        )(stacked_params, x)

    def padded_apply(self, stacked_params, x):
        """Like :meth:`apply` but with the encoding's output padding /
        dtype (drop-in for ``encoding.apply`` in a composed model)."""
        return self.encoding._pad(self.apply(stacked_params, x))


class TableParallelTrainer:
    """Trains a configured model (grid encoding + network + loss +
    optimizer, i.e. ``create_from_config`` output) with every grid
    level's table row-sharded over a ``model`` mesh axis, composed with
    batch data parallelism on an orthogonal ``data`` axis.

    This is the integration layer the sharded lookup alone lacks: the
    same :class:`~tcnn_tpu.trainer.Trainer` step semantics (loss-scale
    plumbing, ``evaluate_sum_and_gradient`` fast path, tcnn-exact
    optimizer update) over a 2-D mesh. The optimizer is split at the
    ``[network | encoding]`` parameter boundary into two instances of
    the configured type — exact, because every supported optimizer is
    elementwise per-parameter with behavior keyed only on the
    matrix/non-matrix boundary, and encoding params are non-matrix in
    both framings (adam.h:78-95). The encoding optimizer's moment
    arrays shard with the table rows, so optimizer memory scales down
    with the tables — the point of model parallelism.

    Checkpoint compatibility: :attr:`params` reassembles the reference
    flat layout (host-side), so interchange snapshots stay byte-stable.

    Scope: the grid's ``per_level`` execution path (the giant-table
    regime this exists for); optimizer wrappers with custom inference
    weights (EMA etc.) train correctly but :meth:`inference` serves the
    live training params.
    """

    def __init__(
        self,
        trainer,
        mesh: Mesh,
        model_axis: str = "model",
        data_axis: str = "data",
    ):
        from jax.sharding import NamedSharding

        model = trainer.model
        encoding = getattr(model, "encoding", None)
        if not isinstance(encoding, GridEncoding):
            raise TypeError(
                "TableParallelTrainer requires a NetworkWithInputEncoding "
                "with a grid encoding (got "
                f"{type(encoding).__name__ if encoding else type(model).__name__})"
            )
        self.trainer = trainer
        self.model = model
        self.loss = trainer.loss
        self.loss_scale = trainer.loss_scale
        self.mesh = mesh
        self.model_axis = model_axis
        self.data_axis = data_axis
        self.tpg = TableParallelGrid(
            encoding, mesh, axis=model_axis, data_axis=data_axis
        )

        from ..optimizers import create_optimizer

        n_net = model.network.n_params
        self._n_net = n_net
        hp = trainer.optimizer.hyperparams()
        self.opt_net = create_optimizer(hp)
        self.opt_net.allocate(n_net, model.layer_sizes())
        n_stacked = self.tpg.n_shards * self.tpg.local_n_params
        self._n_stacked = n_stacked
        self.opt_enc = create_optimizer(hp)
        self.opt_enc.allocate(n_stacked, [])

        self._repl = NamedSharding(mesh, P())
        self._mshard = NamedSharding(mesh, P(model_axis))
        self._dshard = NamedSharding(mesh, P(data_axis, None))

        flat = np.asarray(trainer.params, np.float32)
        enc_stacked = self.tpg.shard_params(flat[n_net:])

        def _enc_state_sharding(leaf):
            # moment/momentum arrays mirror the stacked param vector and
            # shard with it; scalars (step counters) replicate.
            if getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] == n_stacked:
                return self._mshard
            return self._repl

        opt_enc_state = self.opt_enc.init_state()
        self._state_sharding = {
            "net": self._repl,
            "enc": self._mshard,
            "opt_net": jax.tree_util.tree_map(
                lambda _: self._repl, self.opt_net.init_state()
            ),
            "opt_enc": jax.tree_util.tree_map(
                _enc_state_sharding, opt_enc_state
            ),
        }
        self.state = {
            "net": jax.device_put(jnp.asarray(flat[:n_net]), self._repl),
            "enc": jax.device_put(jnp.asarray(enc_stacked), self._mshard),
            "opt_net": jax.device_put(self.opt_net.init_state(), self._repl),
            "opt_enc": jax.tree_util.tree_map(
                lambda leaf: jax.device_put(leaf, _enc_state_sharding(leaf)),
                opt_enc_state,
            ),
        }
        self._jit_step = jax.jit(
            self._step_impl,
            in_shardings=(
                self._state_sharding,
                self._dshard,
                self._dshard,
            ),
            out_shardings=(self._state_sharding, self._repl),
            donate_argnums=(0,),
        )
        self._jit_infer = None

    # -- pure step ------------------------------------------------------------
    def _forward(self, net_p, enc_stacked, x):
        feats = self.tpg.padded_apply(enc_stacked, x)
        return self.model.network.apply(net_p, feats)

    def _step_impl(self, state, inputs, targets):
        output, vjp = jax.vjp(
            lambda net_p, enc_s: self._forward(net_p, enc_s, inputs),
            state["net"],
            state["enc"],
        )
        loss_sum, dL_dy = self.loss.evaluate_sum_and_gradient(
            self.loss_scale, output, targets, None
        )
        g_net, g_enc = vjp(dL_dy)
        opt_net_state, new_net = self.opt_net.step(
            state["opt_net"], state["net"], g_net, self.loss_scale
        )
        opt_enc_state, new_enc = self.opt_enc.step(
            state["opt_enc"], state["enc"], g_enc, self.loss_scale
        )
        return (
            {
                "net": new_net,
                "enc": new_enc,
                "opt_net": opt_net_state,
                "opt_enc": opt_enc_state,
            },
            loss_sum,
        )

    # -- public API -------------------------------------------------------------
    def training_step(self, inputs, targets) -> jnp.ndarray:
        if inputs.shape[0] % int(self.mesh.shape[self.data_axis]) != 0:
            raise ValueError(
                f"batch {inputs.shape[0]} not divisible by data-parallel "
                f"degree {self.mesh.shape[self.data_axis]}"
            )
        inputs = jax.device_put(inputs, self._dshard)
        targets = jax.device_put(targets, self._dshard)
        self.state, loss_value = self._jit_step(self.state, inputs, targets)
        return loss_value

    def inference(self, inputs) -> jnp.ndarray:
        if self._jit_infer is None:
            n_out = self.model.n_output_dims

            def _infer(net_p, enc_s, x):
                out = self._forward(net_p, enc_s, x)
                return out[:, :n_out].astype(jnp.float32)

            self._jit_infer = jax.jit(
                _infer,
                in_shardings=(self._repl, self._mshard, self._dshard),
                out_shardings=self._dshard,
            )
        inputs = jax.device_put(inputs, self._dshard)
        return self._jit_infer(self.state["net"], self.state["enc"], inputs)

    @property
    def params(self) -> np.ndarray:
        """Reference flat layout ``[network | encoding]`` (host-side
        assembly for checkpoints — object.h:74-80 offset contract)."""
        return np.concatenate(
            [
                np.asarray(self.state["net"], np.float32),
                self.tpg.unshard_params(np.asarray(self.state["enc"])),
            ]
        )

    def sync_to_trainer(self):
        """Write the sharded state — params AND optimizer state — back
        into the wrapped single-device Trainer (checkpoint/serving
        handoff). Without the optimizer sync, an EMA/Average-wrapped
        optimizer's inference weights would serialize from the wrapped
        trainer's untouched INIT state (zeros)."""
        self.trainer.params = jnp.asarray(self.params)
        n_net = self._n_net
        n_stacked = self._n_stacked

        def join(net_leaf, enc_leaf):
            a = np.asarray(net_leaf)
            b = np.asarray(enc_leaf)
            if (
                a.ndim >= 1 and a.shape[-1] == n_net
                and b.ndim == a.ndim and b.shape[-1] == n_stacked
            ):
                # Per-weight arrays: [network part | unsharded encoding
                # part] in the flat layout (unshard per leading row;
                # integer counters round-trip f32 exactly).
                if a.ndim == 1:
                    enc_flat = self.tpg.unshard_params(b).astype(b.dtype)
                    return jnp.asarray(np.concatenate([a, enc_flat]))
                rows = np.stack(
                    [
                        self.tpg.unshard_params(b[i]).astype(b.dtype)
                        for i in range(b.shape[0])
                    ]
                )
                return jnp.asarray(np.concatenate([a, rows], axis=-1))
            return jnp.asarray(a)  # scalars (lockstep counters)

        self.trainer.state["opt"] = jax.tree_util.tree_map(
            join, self.state["opt_net"], self.state["opt_enc"]
        )
        return self.trainer

    # -- hyperparams ----------------------------------------------------------
    def _rejit(self):
        self._jit_step = jax.jit(
            self._step_impl,
            in_shardings=(
                self._state_sharding, self._dshard, self._dshard,
            ),
            out_shardings=(self._state_sharding, self._repl),
            donate_argnums=(0,),
        )
        self._jit_infer = None

    @property
    def learning_rate(self) -> float:
        return self.opt_net.learning_rate

    @learning_rate.setter
    def learning_rate(self, value: float):
        # Keep the wrapped trainer AND the sharded per-part optimizers in
        # sync (the jitted step bakes hyperparams in; re-trace).
        self.trainer.learning_rate = value
        self.opt_net.learning_rate = value
        self.opt_enc.learning_rate = value
        self._rejit()

    def update_hyperparams(self, params):
        self.trainer.update_hyperparams(params)
        opt_hp = params.get("optimizer", {})
        if opt_hp:
            self.opt_net.update_hyperparams(opt_hp)
            self.opt_enc.update_hyperparams(opt_hp)
        self._rejit()

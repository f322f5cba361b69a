"""Production serving: frozen-parameter inference with prebuilt tables.

``FrozenServer`` snapshots a trainer's inference parameters and hoists
every loop-invariant table build out of the per-call jitted program:

- the grid encoding's per-level quad tables (per-corner rolls + lane
  concat of each level's parameter slice) are built ONCE under jit and
  kept device-resident (``GridEncoding.serving_tables``); per-call work
  is gathers + interpolation + MLP only;
- programs are traced under ``ffmlp_inference_mode`` (serving-optimal
  network routing) and cached per input shape / raster side;
- parameters are a snapshot: training further does not change a server
  (rebuild one to pick up new weights) — the TPU-native equivalent of
  the reference's resident inference params (trainer.h:171-186), whose
  inference path re-runs the training kernels on a separate stream
  (reference: benchmarks/mlp/bench_mlp_ours.cu:64-137).

Scale-out: pass a ``jax.sharding.Mesh`` to serve over multiple chips —
params and prebuilt tables are **replicated**, batches and rasters are
**sharded** on the batch axis (the same replicate-weights/shard-batch
design as ``parallel.data_parallel``; weights are a few MB, so
replication is free and no collective runs at serve time — per-sample
inference is embarrassingly parallel). The reference has no multi-GPU
inference path at all; on TPU the mesh IS the serving fleet.

Usage::

    server = trainer.freeze_serving()
    y = server(x)                  # arbitrary (B, d) batches
    img = server.raster((w, h))    # full-raster evaluation (fastest)

    server = trainer.freeze_serving(mesh=Mesh(jax.devices(), ("data",)))
    y = server(x)                  # B sharded over the mesh
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class FrozenServer:
    def __init__(self, trainer, mesh: Optional[Mesh] = None,
                 axis_name: str = "data",
                 table_dtype: Optional[str] = None):
        """``table_dtype`` (serve-time only): store the PREBUILT quad
        tables in this dtype (e.g. ``"bfloat16"``) instead of the
        encoding's training ``table_dtype``. A pure serving precision
        trade — training state, live inference, and checkpoints are
        untouched; the served features round once at table build. The
        TPU gather emitter charges per ROW, not per byte, so the win is
        small but real (bf16 measured -7% on the fine-gather block,
        probe_r4_lane_gather); quality cost is bf16 storage rounding
        (~0.4% rel) on the table reads only."""
        self.model = trainer.model
        self.n_output_dims = int(self.model.n_output_dims)
        self._mesh = mesh
        if mesh is not None:
            self._replicated = NamedSharding(mesh, P())
            self._batch_sharded = NamedSharding(mesh, P(axis_name, None))
        # Device-side COPY: the trainer's jitted step donates its state
        # buffers, so holding a reference to the live params would be
        # invalidated by the next training step.
        self._params = jax.jit(jnp.copy)(trainer.inference_params())
        if mesh is not None:
            self._params = jax.device_put(self._params, self._replicated)
        self._tables: Optional[Dict] = None
        enc = getattr(self.model, "encoding", None)
        net = getattr(self.model, "network", None)
        if (
            enc is not None
            and net is not None
            and hasattr(enc, "serving_tables")
        ):
            n_net = net.n_params

            def _build(p):
                return enc.serving_tables(p[n_net:])

            tables = jax.jit(_build)(self._params)
            if tables:
                if table_dtype is not None:
                    dt = jnp.dtype(table_dtype)
                    tables = jax.jit(
                        lambda t: jax.tree_util.tree_map(
                            lambda a: a.astype(dt), t
                        )
                    )(tables)
                if mesh is not None:
                    tables = jax.device_put(tables, self._replicated)
                self._tables = tables
        self._batch_jits: Dict = {}
        self._raster_jits: Dict = {}

    def _check_shard(self, batch: int, what: str):
        if self._mesh is not None and batch % self._mesh.size != 0:
            raise ValueError(
                f"{what} size {batch} must be divisible by the serving "
                f"mesh size {self._mesh.size}"
            )

    # -- entry points -----------------------------------------------------------
    # A server is meant for a small fixed set of serving shapes; bound the
    # per-shape program caches so a caller streaming many distinct shapes
    # (or alternating dtypes) can't grow them without limit.
    _CACHE_MAX = 32

    def __call__(self, x) -> jnp.ndarray:
        """Serve an arbitrary (B, d) batch; returns (B, n_output_dims)
        float32. Jitted and cached per input shape+dtype."""
        self._check_shard(int(np.shape(x)[0]), "batch")
        key = (tuple(x.shape), jnp.asarray(x).dtype.name)
        fn = self._batch_jits.get(key)
        if fn is None:
            if len(self._batch_jits) >= self._CACHE_MAX:
                self._batch_jits.pop(next(iter(self._batch_jits)))
            enc = getattr(self.model, "encoding", None)
            # Arbitrary serving batches use the per-sample fallback (the
            # stratified static path would NaN-poison non-raster layouts).
            static_kw = (
                {"stratified": False}
                if getattr(enc, "gather_strategy", None) == "stratified"
                else {}
            )
            pass_tables = self._tables is not None

            def _infer(params, tables, xx):
                kw = dict(static_kw)
                if pass_tables:
                    kw["served_tables"] = tables
                out = self.model.apply(params, xx, **kw)
                return out[:, : self.n_output_dims].astype(jnp.float32)

            jit_kw = (
                {"out_shardings": self._batch_sharded}
                if self._mesh is not None
                else {}
            )
            fn = self._batch_jits[key] = jax.jit(_infer, **jit_kw)
        from .networks.fully_fused import ffmlp_inference_mode

        if self._mesh is not None and not (
            isinstance(x, jax.Array)
            and getattr(x, "committed", False)
            and x.sharding == self._batch_sharded
        ):
            # Shard the batch; params/tables are committed replicated, so
            # the per-sample program partitions with NO collectives.
            # Already-sharded device arrays pass through untouched (no
            # per-call transfer for streaming callers; see CLAUDE.md on
            # host<->device stalls).
            x = jax.device_put(x, self._batch_sharded)
        with ffmlp_inference_mode():
            return fn(self._params, self._tables, x)

    def raster(self, side: Union[int, Tuple[int, ...]]) -> jnp.ndarray:
        """Serve the full tile-center raster (``utils.sampling
        .raster_centers`` layout); returns (prod(sides), n_output_dims)
        float32. The fastest serving form: static-index coarse levels +
        prebuilt-table fine gathers."""
        side = (
            int(side) if np.isscalar(side) else tuple(int(s) for s in side)
        )
        n_pts = int(
            side ** self.model.n_input_dims
            if isinstance(side, int)
            else np.prod(side)
        )
        self._check_shard(n_pts, "raster")
        fn = self._raster_jits.get(side)
        if fn is None:
            if len(self._raster_jits) >= self._CACHE_MAX:
                self._raster_jits.pop(next(iter(self._raster_jits)))
            if hasattr(self.model, "apply_raster"):

                def _infer(params, tables):
                    kw = {"served_tables": tables} if tables is not None else {}
                    out = self.model.apply_raster(params, side, **kw)
                    return out[:, : self.n_output_dims].astype(jnp.float32)

            else:
                from .utils.sampling import raster_centers

                x = raster_centers(side, self.model.n_input_dims)

                def _infer(params, tables):
                    kw = (
                        {"served_tables": tables}
                        if tables is not None
                        else {}
                    )
                    out = self.model.apply(params, x, **kw)
                    return out[:, : self.n_output_dims].astype(jnp.float32)

            jit_kw = (
                # The raster is generated INSIDE the program (no host
                # batch to place); the sharded output alone makes XLA's
                # SPMD partitioner shard the whole per-sample pipeline —
                # raster generation included — across the mesh.
                {"out_shardings": self._batch_sharded}
                if self._mesh is not None
                else {}
            )
            fn = self._raster_jits[side] = jax.jit(_infer, **jit_kw)
        from .networks.fully_fused import ffmlp_inference_mode

        with ffmlp_inference_mode():
            return fn(self._params, self._tables)

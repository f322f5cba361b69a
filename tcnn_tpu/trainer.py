"""Trainer: couples model + optimizer + loss into one jitted training step.

(reference: trainer.h). The reference captures forward+loss+backward in a
CUDA graph and then launches a separate fused optimizer kernel; here the
*entire* step — encode, network, loss, backward, optimizer — is a single
``jax.jit`` program, traced once and replayed (jit is the TPU's CUDA graph,
XLA whole-graph fusion is its RTC JIT, cf. trainer.h:163-252, 344-354).

Gradient plumbing parity: the loss produces explicit ``dL_doutput`` scaled by
``loss_scale`` (trainer.h:137); the model's parameter/input gradients come
from ``jax.vjp`` seeded with it; the optimizer divides the scale back out.
Because our flat params are fp32 masters and the cast to the bf16 compute
copy happens inside ``apply``, gradients accumulate in fp32 (better than the
reference's half-precision gradient buffer).
"""

from __future__ import annotations

import base64
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .common import default_loss_scale
from .losses import Loss
from .optimizers import Optimizer
from .rng import make_rng


class Trainer:
    def __init__(
        self,
        model,
        optimizer: Optimizer,
        loss: Loss,
        seed: int = 1337,
        loss_scale: Optional[float] = None,
        perturbation_sigma: Optional[float] = None,
        split_grid_state: bool = False,
    ):
        self.model = model
        self.optimizer = optimizer
        self.loss = loss
        self.loss_scale = (
            float(loss_scale)
            if loss_scale is not None
            else default_loss_scale(model.compute_dtype)
        )
        # Optional logistic output perturbation (reference: trainer.h:114-123).
        self.perturbation_sigma = perturbation_sigma

        self.optimizer.allocate(model.n_params, model.layer_sizes())
        # Structured training state (VERDICT r4 item 3): carry the grid's
        # per-level tables as separate state buffers — each level's
        # forward reads its own program input and its adjoint lands in
        # its own buffer; no global (N, F) params view, no slice/concat
        # in the step. Flat params materialize only at API/checkpoint
        # boundaries (``.params``, serialize), which stay byte-identical.
        # Measured (probe_r5_state_split, v5e): 3D flagship 65.4 vs 67.3
        # ms/step; 2D neutral. Opt-in; bit-identical results either way.
        self.split_grid_state = bool(split_grid_state)
        if self.split_grid_state:
            self._init_split_grid_state()
        self.state: Dict[str, Any] = {}
        self.initialize_params(seed)

        self._jit_train_step = jax.jit(self._train_step, donate_argnums=(0,))
        self._jit_train_step_pdf = jax.jit(
            functools.partial(self._train_step_with_pdf), donate_argnums=(0,)
        )

    # -- split-grid-state plumbing ------------------------------------------
    _SPLIT_BASE_OTYPES = ("Adam", "SGD")
    _SPLIT_WRAPPER_OTYPES = (
        "EMA", "Average", "Batched", "Lookahead", "ExponentialDecay",
    )

    def _init_split_grid_state(self):
        """Validate the model/optimizer combination and build the per-leaf
        optimizer instances (one for the network's flat prefix, one per
        grid level). Exact: every supported optimizer is elementwise with
        behavior keyed only on the matrix/non-matrix index boundary — the
        network leaf keeps ``layer_sizes`` (matrix behavior unchanged),
        grid leaves are pure non-matrix, same as in the flat vector."""
        from .optimizers import create_optimizer

        enc = getattr(self.model, "encoding", None)
        net = getattr(self.model, "network", None)
        if enc is None or net is None or not hasattr(enc, "split_params"):
            raise ValueError(
                "split_grid_state requires a NetworkWithInputEncoding "
                "whose encoding supports per-level params (GridEncoding)"
            )
        if getattr(enc, "gather_strategy", "per_level") in (
            "fused", "quad_fused",
        ):
            raise ValueError(
                "split_grid_state requires a per-level gather strategy "
                f"(got {enc.gather_strategy!r})"
            )
        # Walk the optimizer's otype chain: wrappers pass through to a
        # supported elementwise base.
        opt = self.optimizer
        while opt.otype in self._SPLIT_WRAPPER_OTYPES:
            opt = opt.nested(0)
        if opt.otype not in self._SPLIT_BASE_OTYPES:
            raise ValueError(
                f"split_grid_state does not support optimizer "
                f"{self.optimizer.otype!r} (needs an elementwise "
                f"optimizer: {self._SPLIT_BASE_OTYPES} possibly wrapped "
                f"in {self._SPLIT_WRAPPER_OTYPES})"
            )

        cfg = self.optimizer.hyperparams()
        n_net = net.n_params
        F = enc.n_features_per_level
        off = enc.offset_table
        self._opt_net = create_optimizer(cfg)
        self._opt_net.allocate(n_net, self.model.layer_sizes())
        self._opt_levels = []
        for lvl in range(enc.n_levels):
            size = F * int(off[lvl + 1] - off[lvl])
            o = create_optimizer(cfg)
            o.allocate(size, [])
            self._opt_levels.append(o)

    def _split_state_from_flat(self, params):
        """Flat (n,) fp32 vector -> structured state pytree."""
        enc = self.model.encoding
        n_net = self.model.network.n_params
        flat = np.asarray(params, np.float32)
        return {
            "net": jnp.asarray(flat[:n_net]),
            "levels": tuple(
                jnp.asarray(a) for a in enc.split_params(flat[n_net:])
            ),
        }

    def _join_params(self, p) -> jnp.ndarray:
        if not isinstance(p, dict):
            return p
        return jnp.concatenate([p["net"], *[a.reshape(-1) for a in p["levels"]]])

    # -- params -----------------------------------------------------------
    def initialize_params(self, seed: int = 1337):
        """(reference: trainer.h:69-87)"""
        rng = make_rng(seed)
        params = self.model.initialize_params(rng)
        assert params.shape == (self.model.n_params,)
        if self.split_grid_state:
            self.state = {
                "params": self._split_state_from_flat(params),
                # tree_map-copy: identical zeros constants across leaf
                # states dedupe to ONE device buffer, which the donating
                # jit would then donate twice — force distinct buffers.
                "opt": jax.tree_util.tree_map(
                    jnp.copy,
                    {
                        "net": self._opt_net.init_state(),
                        "levels": [
                            o.init_state() for o in self._opt_levels
                        ],
                    },
                ),
            }
        else:
            self.state = {
                "params": jnp.asarray(params, jnp.float32),
                "opt": self.optimizer.init_state(),
            }
        if self.perturbation_sigma is not None:
            self.state["rng"] = jax.random.PRNGKey(seed)

    @property
    def params(self) -> jnp.ndarray:
        return self._join_params(self.state["params"])

    @params.setter
    def params(self, value):
        if self.split_grid_state:
            self.state["params"] = self._split_state_from_flat(value)
        else:
            self.state["params"] = jnp.asarray(value, jnp.float32)

    @property
    def n_params(self) -> int:
        return self.model.n_params

    def inference_params(self) -> jnp.ndarray:
        """Custom (EMA/averaged) weights if the optimizer keeps them,
        else the training params (reference: trainer.h:496-500)."""
        if self.split_grid_state:
            opt = self.state["opt"]
            cw_net = self._opt_net.custom_weights(opt["net"])
            if cw_net is None:
                return self.params
            cw_lvls = [
                o.custom_weights(s)
                for o, s in zip(self._opt_levels, opt["levels"])
            ]
            return jnp.concatenate(
                [cw_net, *[a.reshape(-1) for a in cw_lvls]]
            )
        cw = self.optimizer.custom_weights(self.state["opt"])
        if cw is None:
            return self.state["params"]
        if callable(cw):  # CompositeOptimizer stitches with live params
            return cw(self.state["params"])
        return cw

    # -- pure step -----------------------------------------------------------
    def _forward_backward(self, params, inputs, targets, data_pdf, noise=None):
        def fwd(p):
            return self.model.apply(p, inputs)

        output, vjp = jax.vjp(fwd, params)
        if noise is not None:
            # Additive output perturbation: the loss sees output+noise; its
            # gradient w.r.t. the unperturbed output is unchanged.
            loss_input = (output.astype(jnp.float32) + noise).astype(output.dtype)
        else:
            loss_input = output
        # Fast path: scalar loss sum + gradients without materializing the
        # per-element values matrix (elementwise losses compute on flat
        # vectors — (B, dims<128) intermediates lane-pad 128/dims on TPU;
        # the padded RelativeL2 fusion measured 717 us/step at flagship
        # scale). evaluate_loss keeps the values-matrix API.
        loss_sum, dL_dy = self.loss.evaluate_sum_and_gradient(
            self.loss_scale, loss_input, targets, data_pdf
        )
        grads = vjp(dL_dy)[0]
        return loss_sum, grads

    def _train_step(self, state, inputs, targets):
        return self._step_impl(state, inputs, targets, None)

    def _train_step_with_pdf(self, state, inputs, targets, data_pdf):
        return self._step_impl(state, inputs, targets, data_pdf)

    def _step_impl(self, state, inputs, targets, data_pdf):
        new_rng = None
        noise = None
        if self.perturbation_sigma is not None:
            # Logistic output-perturbation noise added to the network output
            # before the loss (reference: trainer.h:114-123), deterministic
            # under jit via the carried key.
            rng, new_rng = jax.random.split(state["rng"])
            padded = self.model.padded_output_width
            u = jax.random.uniform(
                rng, (inputs.shape[0], padded), jnp.float32, 1e-9, 1.0 - 1e-9
            )
            noise = self.perturbation_sigma * 0.551328895421792050 * jnp.log(
                u / (1.0 - u)
            )
        loss_value, grads = self._forward_backward(
            state["params"], inputs, targets, data_pdf, noise
        )
        opt_state, new_params = self._optimizer_step(
            state["opt"], state["params"], grads
        )
        new_state = {"params": new_params, "opt": opt_state}
        if new_rng is not None:
            new_state["rng"] = new_rng
        return new_state, loss_value

    def _optimizer_step(self, opt_state, params, grads):
        """One optimizer update; handles both the flat vector and the
        split-grid-state pytree (per-leaf optimizer instances — exact:
        see _init_split_grid_state)."""
        if not isinstance(params, dict):
            return self.optimizer.step(
                opt_state, params, grads, self.loss_scale
            )
        so_net, new_net = self._opt_net.step(
            opt_state["net"], params["net"], grads["net"], self.loss_scale
        )
        so_lvls, new_lvls = [], []
        for o, s, p, g in zip(
            self._opt_levels, opt_state["levels"], params["levels"],
            grads["levels"],
        ):
            s2, p2 = o.step(s, p, g, self.loss_scale)
            so_lvls.append(s2)
            new_lvls.append(p2)
        return (
            {"net": so_net, "levels": so_lvls},
            {"net": new_net, "levels": tuple(new_lvls)},
        )

    def _step_external_impl(self, state, inputs, dL_doutput):
        """Training step with caller-provided output gradients, skipping the
        loss (reference: trainer.h:127-138 external_dL_dy path). dL_doutput
        must already include the loss scale."""

        def fwd(p):
            return self.model.apply(p, inputs)

        _, vjp = jax.vjp(fwd, state["params"])
        grads = vjp(dL_doutput.astype(self.model.compute_dtype))[0]
        opt_state, new_params = self._optimizer_step(
            state["opt"], state["params"], grads
        )
        new_state = dict(state)  # keep e.g. the perturbation rng key
        new_state.update(params=new_params, opt=opt_state)
        return new_state

    # -- public API ------------------------------------------------------------
    def training_step_with_gradients(self, inputs, dL_doutput):
        """Apply one optimizer step from external output gradients
        (shape (batch, padded_output_width), pre-scaled by loss_scale)."""
        if not hasattr(self, "_jit_ext_step"):
            self._jit_ext_step = jax.jit(
                self._step_external_impl, donate_argnums=(0,)
            )
        self.state = self._jit_ext_step(self.state, inputs, dL_doutput)

    def training_step(self, inputs, targets, data_pdf=None) -> jnp.ndarray:
        """One training iteration; returns the scalar loss (lazy device
        value — call ``float()`` on it to synchronize)."""
        if data_pdf is None:
            self.state, loss_value = self._jit_train_step(
                self.state, inputs, targets
            )
        else:
            self.state, loss_value = self._jit_train_step_pdf(
                self.state, inputs, targets, data_pdf
            )
        return loss_value

    # training_steps compiles one program per (batch_fn, n_steps); bound the
    # cache so fresh per-call lambdas can't grow it (each entry would pin its
    # closure — and any closed-over arrays — alive forever).
    _SCAN_CACHE_MAX = 8

    def training_steps(self, batch_fn, n_steps: int, data=None) -> jnp.ndarray:
        """Run ``n_steps`` training iterations in ONE device dispatch.

        This is the TPU-native analogue of the reference's CUDA-graph
        capture/replay of the train step (reference: trainer.h:344-350,
        cuda_graph.h:65-155): one dispatch per N steps instead of N.

        MEASURED CAVEAT (round 4): at flagship scale the scan LOWERING
        itself taxes the composed per-step device time (~5 ms/step at
        the 2D flagship, tens of ms at 3D state sizes — the scanned body
        loses fusions the straight-line step keeps), which outweighs the
        per-dispatch latency it saves over the axon tunnel. Use this for
        many tiny steps (dispatch-bound regimes), not to speed up
        flagship-scale steps; bench.py defaults to plain per-step
        dispatch (--steps-per-call 1).

        Args:
          batch_fn: pure jax function producing ``(inputs, targets)`` for
            one step. Called ``batch_fn(data, i)`` when ``data`` is given,
            else ``batch_fn(i)`` (``i`` is the traced int32 step index).
          n_steps: static number of steps to fold into the dispatch.
          data: optional pytree (dataset / aux arrays) threaded to
            ``batch_fn`` as an explicit jit argument. Pass device arrays
            HERE, not via closure: a closed-over device array is fetched
            to host at lowering time (multi-minute stalls over the axon
            tunnel) and baked into the compiled program as a constant.

        Returns the (n_steps,) per-step loss vector (lazy device value).
        """
        key = ("_scan", n_steps, id(batch_fn), data is None)
        cache = getattr(self, "_jit_scan_cache", None)
        if cache is None:
            cache = self._jit_scan_cache = {}
        if key not in cache:
            if len(cache) >= self._SCAN_CACHE_MAX:
                cache.pop(next(iter(cache)))

            def block(state, d):
                def body(st, i):
                    if d is None:
                        inputs, targets = batch_fn(i)
                    else:
                        inputs, targets = batch_fn(d, i)
                    return self._step_impl(st, inputs, targets, None)

                return jax.lax.scan(
                    body, state, jnp.arange(n_steps, dtype=jnp.int32)
                )

            cache[key] = jax.jit(block, donate_argnums=(0,))
        self.state, losses = cache[key](self.state, data)
        return losses

    def forward(self, inputs):
        """Training-params forward, padded output (compute dtype)."""
        return self.model.apply(self.state["params"], inputs)

    def evaluate_loss(self, inputs, targets, data_pdf=None):
        """Per-element loss values matrix + scalar, without stepping
        (reference exposes the values matrix via Trainer::forward +
        reduce_sum, trainer.h:97-141, 372-378)."""
        out = self.forward(inputs)
        values, _ = self.loss.evaluate(self.loss_scale, out, targets, data_pdf)
        return values, jnp.sum(values)

    @property
    def learning_rate(self) -> float:
        return self.optimizer.learning_rate

    @learning_rate.setter
    def learning_rate(self, value: float):
        self.optimizer.learning_rate = value
        if self.split_grid_state:
            self._opt_net.learning_rate = value
            for o in self._opt_levels:
                o.learning_rate = value
        # lr is baked into the traced step; re-jit.
        self._jit_train_step = jax.jit(self._train_step, donate_argnums=(0,))
        self._jit_train_step_pdf = jax.jit(
            self._train_step_with_pdf, donate_argnums=(0,)
        )
        if hasattr(self, "_jit_scan_cache"):
            del self._jit_scan_cache

    def _inference_kwargs(self) -> Dict[str, Any]:
        """Serving batches are arbitrary layouts: force the grid encoding's
        per-sample fallback instead of the stratified static path (which
        would NaN-poison non-conforming chunks — e.g. raster slices of an
        image whose width differs from the training strata)."""
        enc = getattr(self.model, "encoding", None)
        if getattr(enc, "gather_strategy", None) == "stratified":
            return {"stratified": False}
        return {}

    def inference(self, inputs, stratified: bool = False) -> jnp.ndarray:
        """Serving path: inference params, trimmed fp32 output
        (reference: object.h:214-271). Jitted and cached (re-traces only
        per input shape); the reference analogue is the CUDA-graph-free
        inference fast path.

        Args:
          stratified: opt-in for the grid's gather-free static path when
            the batch satisfies the raster-tile contract (e.g. rendering a
            full raster whose width equals the training strata). Default
            False: serving batches are arbitrary layouts and use the
            per-sample fallback.
        """
        jits = getattr(self, "_jit_inference_cache", None)
        if jits is None:
            jits = self._jit_inference_cache = {}
        key = bool(stratified)
        if key not in jits:
            kwargs = self._inference_kwargs()
            if stratified and "stratified" in kwargs:
                kwargs = {}

            def _infer(p, x):
                out = self.model.apply(p, x, **kwargs)
                return out[:, : self.model.n_output_dims].astype(jnp.float32)

            jits[key] = jax.jit(_infer)
        from .networks.fully_fused import ffmlp_inference_mode

        with ffmlp_inference_mode():  # trace-time serving-optimal routing
            return jits[key](self.inference_params(), inputs)

    def inference_raster(self, side) -> jnp.ndarray:
        """Serving fast path for full-raster evaluation: inference params,
        trimmed fp32 output of shape ``(prod(sides), n_output_dims)`` in
        raster order (dim 0 fastest — ``utils.sampling.raster_centers``).
        ``side`` is an int (cubic raster) or a per-dim tuple (rectangular,
        e.g. ``(w, h)`` for an image). Routes through the model's
        ``apply_raster`` (static-index grid lookups, no per-sample random
        access) when available; positions never leave the device-side
        trace. Jitted and cached per ``side``."""
        side = int(side) if np.isscalar(side) else tuple(int(s) for s in side)
        jits = getattr(self, "_jit_raster_cache", None)
        if jits is None:
            jits = self._jit_raster_cache = {}
        if side not in jits:
            if hasattr(self.model, "apply_raster"):

                def _infer(p):
                    out = self.model.apply_raster(p, side)
                    return out[:, : self.model.n_output_dims].astype(
                        jnp.float32
                    )

            else:
                from .utils.sampling import raster_centers

                # numpy constant (embedded in the trace; closing over a
                # device array would fetch it to host at lowering).
                x = raster_centers(side, self.model.n_input_dims)
                kwargs = self._inference_kwargs()

                def _infer(p):
                    out = self.model.apply(p, x, **kwargs)
                    return out[:, : self.model.n_output_dims].astype(
                        jnp.float32
                    )

            jits[side] = jax.jit(_infer)
        from .networks.fully_fused import ffmlp_inference_mode

        with ffmlp_inference_mode():  # trace-time serving-optimal routing
            return jits[side](self.inference_params())

    def freeze_serving(self, mesh=None, axis_name: str = "data",
                       table_dtype=None):
        """Production serving handle: snapshots the current inference
        params, prebuilds the grid's per-level quad tables ONCE
        (device-resident), and serves batches/rasters through
        consume-only jitted programs (see serving.FrozenServer). The
        handle is a snapshot — training further does not change it.

        Pass a ``jax.sharding.Mesh`` to scale serving out over multiple
        chips: params/tables replicate, batches and rasters shard on the
        batch axis with no serve-time collectives. ``table_dtype``
        stores the prebuilt tables half-precision at serve time only
        (see serving.FrozenServer)."""
        from .serving import FrozenServer

        return FrozenServer(
            self, mesh=mesh, axis_name=axis_name, table_dtype=table_dtype
        )

    # -- hyperparams ------------------------------------------------------------
    def update_hyperparams(self, params: Dict):
        self.optimizer.update_hyperparams(params.get("optimizer", {}))
        if self.split_grid_state:
            self._opt_net.update_hyperparams(params.get("optimizer", {}))
            for o in self._opt_levels:
                o.update_hyperparams(params.get("optimizer", {}))
        self.loss.update_hyperparams(params.get("loss", {}))
        if hasattr(self.model, "update_hyperparams"):
            self.model.update_hyperparams(params)
        # Hyperparams are static w.r.t. tracing; re-jit.
        self._jit_train_step = jax.jit(self._train_step, donate_argnums=(0,))
        self._jit_train_step_pdf = jax.jit(
            self._train_step_with_pdf, donate_argnums=(0,)
        )
        if hasattr(self, "_jit_inference_cache"):
            del self._jit_inference_cache
        if hasattr(self, "_jit_raster_cache"):
            del self._jit_raster_cache
        if hasattr(self, "_jit_scan_cache"):
            del self._jit_scan_cache

    # -- split-grid-state <-> flat optimizer-state bridge ----------------------
    def _leaf_param_counts(self):
        # The per-leaf optimizers were allocated with exactly these
        # counts (_init_split_grid_state) — reuse them.
        return [self._opt_net.n_weights] + [
            o.n_weights for o in self._opt_levels
        ]

    def _opt_state_flat(self):
        """The optimizer state in the FLAT layout (what checkpoints store;
        reference layout per optimizer — interchange.py). In split mode,
        per-weight arrays are the per-leaf arrays concatenated in the
        flat-params order ([network | level 0 | level 1 | ...]); scalars
        (step counters etc.) are taken from the network leaf (all leaves
        step in lockstep)."""
        if not self.split_grid_state:
            return self.state["opt"]
        leaves = [self.state["opt"]["net"], *self.state["opt"]["levels"]]
        n = self.model.n_params

        def join(*xs):
            # Per-weight arrays carry the weight count in their LAST axis
            # (1-D moments; Average's (n_samples, n) sample ring): same
            # leading dims, last dims summing to n -> concat on -1.
            x0 = xs[0]
            if (
                hasattr(x0, "ndim") and x0.ndim >= 1
                and all(x.shape[:-1] == x0.shape[:-1] for x in xs)
                and sum(int(x.shape[-1]) for x in xs) == n
            ):
                return jnp.concatenate(xs, axis=-1)
            return x0

        return jax.tree_util.tree_map(join, *leaves)

    def _set_opt_state_flat(self, flat_state):
        """Inverse of ``_opt_state_flat``: distribute per-weight arrays to
        the leaf states, replicate everything else."""
        if not self.split_grid_state:
            self.state["opt"] = flat_state
            return
        counts = self._leaf_param_counts()
        bounds = np.concatenate([[0], np.cumsum(counts)])
        n = self.model.n_params

        def split_leaf(i):
            def pick(x):
                if (
                    hasattr(x, "ndim") and x.ndim >= 1
                    and x.shape[-1] == n
                ):
                    return jnp.asarray(x)[..., bounds[i] : bounds[i + 1]]
                return x

            return jax.tree_util.tree_map(pick, flat_state)

        # jnp.copy: replicated scalars (step counters) would otherwise be
        # ONE buffer across leaves — donated twice by the jitted step.
        self.state["opt"] = jax.tree_util.tree_map(
            jnp.copy,
            {
                "net": split_leaf(0),
                "levels": [
                    split_leaf(1 + l) for l in range(len(counts) - 1)
                ],
            },
        )

    # -- serialization (reference: trainer.h:442-482) -------------------------
    def serialize(self, serialize_optimizer: bool = False) -> Dict:
        """Reference-layout snapshot: ``{n_params, params_type,
        params_binary, optimizer?}`` with optimizer state in each
        optimizer's native format (adam.h:304-325 etc. — see
        interchange.py). Binary blobs are nlohmann text-JSON binary
        objects (``{"bytes": [...]}``), so ``json.dumps`` of the result is
        parseable by the reference's ``nlohmann::json``; use
        ``interchange.to_msgpack(serialize_trainer(...))`` for the compact
        MessagePack spelling."""
        from . import interchange

        return interchange.to_json_obj(
            interchange.serialize_trainer(self, serialize_optimizer)
        )

    def deserialize(self, blob: Dict):
        """Accepts reference-layout snapshots (text-JSON or msgpack-decoded)
        and the legacy tcnn_tpu r1 base64 format."""
        from . import interchange

        if isinstance(blob.get("params_binary"), str):
            # Legacy r1 format: base64 params + __ndarray__ optimizer tree.
            n = int(blob["n_params"])
            if n != self.model.n_params:
                raise ValueError(
                    f"checkpoint has {n} params, model has "
                    f"{self.model.n_params}"
                )
            dtype = (
                np.float16 if blob.get("params_type") == "half" else np.float32
            )
            params = np.frombuffer(
                base64.b64decode(blob["params_binary"]), dtype=dtype
            ).astype(np.float32)
            self.params = jnp.asarray(params)
            if "optimizer" in blob:
                template = self.optimizer.init_state()
                self._set_opt_state_flat(
                    _tree_from_json(blob["optimizer"], template)
                )
            return
        interchange.deserialize_trainer(self, interchange.from_json_obj(blob))


def _tree_from_json(blob, template):
    """Legacy (tcnn_tpu r1) optimizer-state reader."""
    if isinstance(blob, dict) and "__ndarray__" in blob:
        arr = np.frombuffer(
            base64.b64decode(blob["__ndarray__"]), dtype=np.dtype(blob["dtype"])
        ).reshape(blob["shape"])
        return jnp.asarray(arr)
    if isinstance(blob, dict):
        return {k: _tree_from_json(v, template[k]) for k, v in blob.items()}
    if isinstance(blob, list):
        return [_tree_from_json(v, template[i]) for i, v in enumerate(blob)]
    return blob

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
        self.state: Dict[str, Any] = {}
        self.initialize_params(seed)

        self._jit_train_step = jax.jit(self._train_step, donate_argnums=(0,))
        self._jit_train_step_pdf = jax.jit(
            functools.partial(self._train_step_with_pdf), donate_argnums=(0,)
        )

    # -- params -----------------------------------------------------------
    def initialize_params(self, seed: int = 1337):
        """(reference: trainer.h:69-87)"""
        rng = make_rng(seed)
        params = self.model.initialize_params(rng)
        assert params.shape == (self.model.n_params,)
        self.state = {
            "params": jnp.asarray(params, jnp.float32),
            "opt": self.optimizer.init_state(),
        }
        if self.perturbation_sigma is not None:
            self.state["rng"] = jax.random.PRNGKey(seed)

    @property
    def params(self) -> jnp.ndarray:
        return self.state["params"]

    @params.setter
    def params(self, value):
        self.state["params"] = jnp.asarray(value, jnp.float32)

    @property
    def n_params(self) -> int:
        return self.model.n_params

    def inference_params(self) -> jnp.ndarray:
        """Custom (EMA/averaged) weights if the optimizer keeps them,
        else the training params (reference: trainer.h:496-500)."""
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
        opt_state, new_params = self.optimizer.step(
            state["opt"], state["params"], grads, self.loss_scale
        )
        new_state = {"params": new_params, "opt": opt_state}
        if new_rng is not None:
            new_state["rng"] = new_rng
        return new_state, loss_value

    def _step_external_impl(self, state, inputs, dL_doutput):
        """Training step with caller-provided output gradients, skipping the
        loss (reference: trainer.h:127-138 external_dL_dy path). dL_doutput
        must already include the loss scale."""

        def fwd(p):
            return self.model.apply(p, inputs)

        _, vjp = jax.vjp(fwd, state["params"])
        grads = vjp(dL_doutput.astype(self.model.compute_dtype))[0]
        opt_state, new_params = self.optimizer.step(
            state["opt"], state["params"], grads, self.loss_scale
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
            self.state["params"] = jnp.asarray(params)
            if "optimizer" in blob:
                template = self.optimizer.init_state()
                self.state["opt"] = _tree_from_json(
                    blob["optimizer"], template
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

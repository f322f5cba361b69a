"""tiny-cuda-nn checkpoint interchange — byte-compatible snapshots.

Serializes/deserializes trainer snapshots in the reference's exact layout
(reference: trainer.h:442-482) including optimizer state in each
optimizer's reference format (adam.h:304-325, sgd.h:134-139,
novograd.h:225-231, ema.h:190-194, average.h:151-156, batched.h:138-144,
lookahead.h:150-154, exponential_decay.h:136-141, composite.h:142-153;
Shampoo raises, like shampoo.h:963-965).

Binary blobs follow nlohmann::json's ``binary_t`` convention
(reference: gpu_memory_json.h:36-71): native ``bin`` values in MessagePack
dumps (`to_msgpack`/`from_msgpack` — the on-disk format Instant-NGP-class
apps use), and ``{"bytes": [...], "subtype": ...}`` objects in text-JSON
dumps (`to_json_obj`/`from_json_obj` — what ``nlohmann::json::dump()``
emits for binary values). Both directions accept both spellings, matching
``from_json``'s dual branch (gpu_memory_json.h:48-66).

Params layout parity (network matrices first, then encoding tables, grid
offset table 8-aligned — object.h:74-80, grid.h:695-737) is what makes the
byte blobs meaningful across implementations; it is asserted by the golden
fixture test (tests/test_interchange.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np


class Binary(bytes):
    """A byte blob that must serialize as nlohmann ``binary_t``."""

    subtype: Optional[int] = None


def _bin(arr: np.ndarray) -> Binary:
    return Binary(np.ascontiguousarray(arr).tobytes())


def _as_bytes(value) -> bytes:
    """Accept msgpack bin (bytes), nlohmann text-JSON binary objects
    ({"bytes": [...]}), or plain int lists."""
    if isinstance(value, (bytes, bytearray)):
        return bytes(value)
    if isinstance(value, dict) and "bytes" in value:
        return bytes(bytearray(value["bytes"]))
    if isinstance(value, (list, tuple)):
        return bytes(bytearray(value))
    raise TypeError(f"cannot interpret {type(value)} as a binary blob")


def _as_array(value, dtype) -> np.ndarray:
    return np.frombuffer(_as_bytes(value), dtype=dtype).copy()


# -- JSON/MessagePack codecs -------------------------------------------------


def to_json_obj(data: Any) -> Any:
    """Replace Binary leaves with nlohmann text-JSON binary objects."""
    if isinstance(data, Binary):
        return {"bytes": list(data), "subtype": data.subtype}
    if isinstance(data, dict):
        return {k: to_json_obj(v) for k, v in data.items()}
    if isinstance(data, (list, tuple)):
        return [to_json_obj(v) for v in data]
    return data


def from_json_obj(data: Any) -> Any:
    if isinstance(data, dict):
        if set(data) <= {"bytes", "subtype"} and "bytes" in data:
            return Binary(bytearray(data["bytes"]))
        return {k: from_json_obj(v) for k, v in data.items()}
    if isinstance(data, list):
        return [from_json_obj(v) for v in data]
    return data


def to_msgpack(data: Any) -> bytes:
    import msgpack

    return msgpack.packb(data, use_bin_type=True)


def from_msgpack(blob: bytes) -> Any:
    import msgpack

    data = msgpack.unpackb(blob, raw=False, strict_map_key=False)

    def conv(v):
        if isinstance(v, (bytes, bytearray)):
            return Binary(v)
        if isinstance(v, dict):
            return {k: conv(x) for k, x in v.items()}
        if isinstance(v, list):
            return [conv(x) for x in v]
        return v

    return conv(data)


# -- optimizer state <-> reference layout ------------------------------------


def serialize_optimizer(opt, state) -> Dict:
    """Our optimizer state pytree -> the reference's serialize() layout."""
    otype = opt.otype

    if otype == "Adam":
        return {
            "current_step": int(state["step"]),
            "base_learning_rate": float(opt.base_learning_rate),
            "first_moments_binary": _bin(
                np.asarray(state["first_moments"], np.float32)
            ),
            "second_moments_binary": _bin(
                np.asarray(state["second_moments"], np.float32)
            ),
            # (reference: adam.h param_steps are uint32)
            "param_steps_binary": _bin(
                np.asarray(state["param_steps"], np.int32).view(np.uint32)
            ),
        }
    if otype == "SGD":
        return {
            "current_step": int(state["step"]),
            "learning_rate": float(opt.base_learning_rate),
        }
    if otype == "Novograd":
        return {
            "current_step": int(state["step"]),
            "base_learning_rate": float(opt.base_learning_rate),
            "first_moments_binary": _bin(
                np.asarray(state["first_moments"], np.float32)
            ),
            "per_layer_second_moments_binary": _bin(
                np.asarray(state["per_layer_second_moments"], np.float32)
            ),
        }
    if otype == "EMA":
        return {
            "nested": serialize_optimizer(opt._nested, state["nested"]),
            "weights_ema_binary": _bin(
                np.asarray(state["weights_ema"], np.float32)
            ),
        }
    if otype == "Average":
        return {
            "nested": serialize_optimizer(opt._nested, state["nested"]),
            "weights_samples_binary": _bin(
                np.asarray(state["weights_samples"], np.float32)
            ),
            "weights_average_binary": _bin(
                np.asarray(state["weights_average"], np.float32)
            ),
        }
    if otype == "Batched":
        avg = np.asarray(state["averaged_gradients"], np.float32)
        return {
            "nested": serialize_optimizer(opt._nested, state["nested"]),
            "averaged_gradients_binary": _bin(avg),
            # The reference keeps a half-precision copy for its compute
            # path (batched.h); emit a cast for compatibility.
            "averaged_gradients_half_binary": _bin(avg.astype(np.float16)),
            "current_step": int(state["step"]),
        }
    if otype == "Lookahead":
        return {
            "nested": serialize_optimizer(opt._nested, state["nested"]),
            "weights_lookahead_binary": _bin(
                np.asarray(state["weights_lookahead"], np.float32)
            ),
        }
    if otype == "ExponentialDecay":
        return {
            "nested": serialize_optimizer(opt._nested, state["nested"]),
            "learning_rate": float(opt.learning_rate),
            "learning_rate_factor": float(state["lr_factor"]),
        }
    if otype == "Composite":
        return {
            "nested": [
                serialize_optimizer(o, s)
                for o, s in zip(opt._nested, state["nested"])
            ],
            "base_learning_rates": [
                float(o.learning_rate) for o in opt._nested
            ],
            "learning_rate_factor": 1.0,
        }
    if otype == "Shampoo":
        # (reference: shampoo.h:963-965)
        raise NotImplementedError(
            "The Shampoo optimizer does not yet support serialization."
        )
    raise NotImplementedError(f"no reference serialization for {otype}")


def deserialize_optimizer(opt, state, data: Dict):
    """Reference-layout optimizer blob -> our state pytree (same treedef
    as ``state``, which provides shapes/dtypes)."""
    otype = opt.otype

    def vec(key, dtype, like):
        arr = _as_array(data[key], dtype)
        want = np.asarray(like)
        if arr.size != want.size:
            raise ValueError(
                f"{otype}.{key}: checkpoint has {arr.size} entries, "
                f"state needs {want.size}"
            )
        return jnp.asarray(arr.reshape(want.shape))

    if otype == "Adam":
        new = dict(state)
        new["step"] = jnp.asarray(int(data["current_step"]), jnp.int32)
        new["first_moments"] = vec(
            "first_moments_binary", np.float32, state["first_moments"]
        )
        new["second_moments"] = vec(
            "second_moments_binary", np.float32, state["second_moments"]
        )
        if "param_steps_binary" in data:
            new["param_steps"] = jnp.asarray(
                _as_array(data["param_steps_binary"], np.uint32)
                .view(np.int32)
                .reshape(np.asarray(state["param_steps"]).shape)
            )
        else:  # (reference: adam.h deserialize zero-fills when absent)
            new["param_steps"] = jnp.zeros_like(state["param_steps"])
        opt.base_learning_rate = float(data["base_learning_rate"])
        return new
    if otype == "SGD":
        opt.base_learning_rate = float(data["learning_rate"])
        return {"step": jnp.asarray(int(data["current_step"]), jnp.int32)}
    if otype == "Novograd":
        new = dict(state)
        new["step"] = jnp.asarray(int(data["current_step"]), jnp.int32)
        new["first_moments"] = vec(
            "first_moments_binary", np.float32, state["first_moments"]
        )
        new["per_layer_second_moments"] = vec(
            "per_layer_second_moments_binary",
            np.float32,
            state["per_layer_second_moments"],
        )
        opt.base_learning_rate = float(data["base_learning_rate"])
        return new
    if otype == "EMA":
        blob = _as_bytes(data["weights_ema_binary"])
        n = np.asarray(state["weights_ema"]).size
        # The reference EMA stores either fp16 or fp32 weights depending
        # on its template type (ema.h:45-75); infer from the byte length.
        dtype = np.float16 if len(blob) == 2 * n else np.float32
        return {
            "nested": deserialize_optimizer(
                opt._nested, state["nested"], data["nested"]
            ),
            "weights_ema": jnp.asarray(
                np.frombuffer(blob, dtype).astype(np.float32)
            ),
        }
    if otype == "Average":
        return {
            "nested": deserialize_optimizer(
                opt._nested, state["nested"], data["nested"]
            ),
            "weights_samples": vec(
                "weights_samples_binary", np.float32, state["weights_samples"]
            ),
            "weights_average": vec(
                "weights_average_binary", np.float32, state["weights_average"]
            ),
        }
    if otype == "Batched":
        return {
            "nested": deserialize_optimizer(
                opt._nested, state["nested"], data["nested"]
            ),
            "step": jnp.asarray(int(data["current_step"]), jnp.int32),
            "averaged_gradients": vec(
                "averaged_gradients_binary",
                np.float32,
                state["averaged_gradients"],
            ),
        }
    if otype == "Lookahead":
        return {
            "nested": deserialize_optimizer(
                opt._nested, state["nested"], data["nested"]
            ),
            "weights_lookahead": vec(
                "weights_lookahead_binary",
                np.float32,
                state["weights_lookahead"],
            ),
        }
    if otype == "ExponentialDecay":
        opt.learning_rate = float(data["learning_rate"])
        return {
            "nested": deserialize_optimizer(
                opt._nested, state["nested"], data["nested"]
            ),
            "lr_factor": jnp.asarray(
                float(data["learning_rate_factor"]), jnp.float32
            ),
        }
    if otype == "Composite":
        lrs = data.get("base_learning_rates")
        if lrs:
            for o, lr in zip(opt._nested, lrs):
                o.learning_rate = float(lr)
        return {
            "nested": [
                deserialize_optimizer(o, s, d)
                for o, s, d in zip(opt._nested, state["nested"], data["nested"])
            ]
        }
    raise NotImplementedError(f"no reference deserialization for {otype}")


# -- trainer snapshots -------------------------------------------------------


def serialize_trainer(trainer, serialize_optimizer_state: bool = False) -> Dict:
    """Reference-layout snapshot (reference: trainer.h:442-455). Like the
    reference, the params blob holds the INFERENCE params (EMA/averaged
    weights when the optimizer keeps them)."""
    params = np.asarray(trainer.inference_params(), np.float32)
    data = {
        "n_params": int(trainer.n_params),
        "params_type": "float",
        "params_binary": _bin(params),
    }
    if serialize_optimizer_state:
        data["optimizer"] = serialize_optimizer(
            trainer.optimizer, trainer._opt_state_flat()
        )
    return data


def deserialize_trainer(trainer, data: Dict) -> None:
    """(reference: trainer.h:457-482). Accepts float and __half params."""
    ptype = data.get("params_type", "float")
    if ptype == "float":
        params = _as_array(data["params_binary"], np.float32)
    elif ptype in ("__half", "half"):
        params = _as_array(data["params_binary"], np.float16).astype(
            np.float32
        )
    else:
        raise ValueError(
            "Trainer: snapshot parameters must be of type float or __half"
        )
    n = int(data.get("n_params", params.size))
    if n != trainer.n_params or params.size != trainer.n_params:
        raise ValueError(
            f"checkpoint has {n} params ({params.size} in blob), model has "
            f"{trainer.n_params}"
        )
    enc = getattr(trainer.model, "encoding", None)
    if getattr(enc, "hash_auto_resolved", False):
        from .utils.log import log_warning

        log_warning(
            "deserialize: this model's grid hash was auto-selected "
            "(CoherentAdditive). If the checkpoint was trained by the "
            "reference under ITS default hash, rebuild the model with "
            "\"hash\": \"CoherentPrime\" — otherwise the hashed levels "
            "index differently and outputs will be garbage."
        )
    trainer.params = jnp.asarray(params)
    if "optimizer" in data:
        trainer._set_opt_state_flat(
            deserialize_optimizer(
                trainer.optimizer, trainer._opt_state_flat(),
                data["optimizer"],
            )
        )

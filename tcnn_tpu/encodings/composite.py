"""Composite encoding: applies nested encodings to slices of the input.

(reference: encodings/composite.h). Nested encodings get explicit
``n_dims_to_encode`` / ``dims_to_encode_begin`` input slices; exactly one
nested encoding may leave ``n_dims_to_encode`` unspecified and receives the
remaining dims. Outputs are combined by Concatenation (with alignment
propagation between nested outputs, composite.h:188-211), Sum, or Product.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from ..common import ReductionType, json_value, lcm_list, string_to_reduction_type
from .base import Encoding


class CompositeEncoding(Encoding):
    otype = "Composite"
    pad_value = 1.0

    def __init__(self, params: dict, n_dims_to_encode: int):
        super().__init__(n_dims_to_encode)
        from . import create_encoding  # late import to avoid cycle

        nested_cfgs = params.get("nested")
        if not isinstance(nested_cfgs, (list, tuple)):
            raise ValueError(
                "Must provide an array of nested encodings to CompositeEncoding."
            )
        self.reduction_type = string_to_reduction_type(
            json_value(params, "reduction", "Concatenation")
        )

        total_nested = 0
        explicit_begin = False
        for cfg in nested_cfgs:
            total_nested += json_value(cfg, "n_dims_to_encode", 0)
            if "dims_to_encode_begin" in cfg:
                explicit_begin = True
        if not explicit_begin and total_nested > n_dims_to_encode:
            raise ValueError(
                f"CompositeEncoding: nested encodings must not encode more dims "
                f"{total_nested} than composite {n_dims_to_encode}"
            )

        unspecified = None if explicit_begin else n_dims_to_encode - total_nested

        self.nested: List[Encoding] = []
        self.dims_to_encode_begin: List[int] = []
        offset = 0
        for cfg in nested_cfgs:
            if "n_dims_to_encode" in cfg:
                if "dims_to_encode_begin" in cfg:
                    offset = cfg["dims_to_encode_begin"]
                n_dims = cfg["n_dims_to_encode"]
            else:
                if unspecified is None:
                    raise ValueError(
                        "CompositeEncoding: may only leave 'n_dims_to_encode' "
                        "unspecified for a single nested encoding"
                    )
                n_dims = unspecified
                unspecified = None
            if n_dims > 0:
                self.nested.append(create_encoding(n_dims, cfg, alignment=1))
                self.dims_to_encode_begin.append(offset)
            offset += n_dims

        # Alignment propagation (composite.h:188-211).
        if self.reduction_type == ReductionType.Concatenation:
            dims_so_far = 0
            for i in range(len(self.nested) - 1):
                desired = self.nested[i + 1].required_output_alignment()
                from ..common import next_multiple

                required = (
                    next_multiple(dims_so_far + self.nested[i].n_output_dims, desired)
                    - dims_so_far
                )
                self.nested[i].set_padded_output_width(required)
                dims_so_far += self.nested[i].padded_output_width
        else:
            alignment = self.required_output_alignment()
            for enc in self.nested:
                enc.set_alignment(alignment)
            widths = {enc.n_output_dims for enc in self.nested}
            if len(widths) > 1:
                raise ValueError(
                    "CompositeEncoding: Sum/Product reduction requires equal "
                    f"nested output widths, got {sorted(widths)}"
                )

        self._sync_output_dims()

    def _sync_output_dims(self):
        if self.reduction_type == ReductionType.Concatenation:
            self.n_output_dims = sum(e.padded_output_width for e in self.nested)
        else:
            self.n_output_dims = (
                self.nested[0].padded_output_width if self.nested else 0
            )
        self.n_to_pad = 0

    # Padding flows into the last nested encoding for concatenation
    # (composite.h:382-392).
    def set_padded_output_width(self, padded_output_width: int):
        if self.reduction_type == ReductionType.Concatenation:
            prev = self.padded_output_width - self.nested[-1].padded_output_width
            if padded_output_width < prev:
                raise ValueError("padded width too small for composite")
            self.nested[-1].set_padded_output_width(padded_output_width - prev)
        else:
            for enc in self.nested:
                enc.set_padded_output_width(padded_output_width)
        self._sync_output_dims()

    def required_output_alignment(self) -> int:
        return lcm_list([e.required_output_alignment() for e in self.nested] or [1])

    @property
    def output_dtype(self):
        return self._output_dtype

    @output_dtype.setter
    def output_dtype(self, dtype):
        self._output_dtype = dtype
        for enc in getattr(self, "nested", []):
            enc.output_dtype = dtype

    # -- parameters ----------------------------------------------------------
    @property
    def n_params(self) -> int:
        return sum(e.n_params for e in self.nested)

    def layer_sizes(self):
        sizes = []
        for e in self.nested:
            sizes.extend(e.layer_sizes())
        return sizes

    def initialize_params(self, rng, scale: float = 1.0) -> np.ndarray:
        parts = [e.initialize_params(rng, scale) for e in self.nested]
        if not parts:
            return np.zeros((0,), np.float32)
        return np.concatenate(parts)

    # -- compute ----------------------------------------------------------------
    def serving_tables(self, params) -> dict:
        """Prebuilt serving tables of every nested encoding that supports
        them (e.g. the NRC preset's hash grid), keyed by nested index —
        consumed by ``apply(..., served_tables=...)`` (see
        GridEncoding.serving_tables / serving.FrozenServer)."""
        out = {}
        off = 0
        for i, enc in enumerate(self.nested):
            if enc.n_params > 0 and hasattr(enc, "serving_tables"):
                sub = enc.serving_tables(params[off : off + enc.n_params])
                if sub:
                    out[i] = sub
            off += enc.n_params
        return out

    def apply(self, params, x, served_tables=None):
        outputs = []
        param_offset = 0
        for i, (enc, begin) in enumerate(
            zip(self.nested, self.dims_to_encode_begin)
        ):
            p = None
            if enc.n_params > 0:
                p = params[param_offset : param_offset + enc.n_params]
            param_offset += enc.n_params
            xin = x[:, begin : begin + enc.n_dims_to_encode]
            kw = (
                {"served_tables": served_tables[i]}
                if served_tables is not None and i in served_tables
                else {}
            )
            outputs.append(enc.apply(p, xin, **kw))

        if self.reduction_type == ReductionType.Concatenation:
            y = jnp.concatenate(outputs, axis=1)
        elif self.reduction_type == ReductionType.Sum:
            y = sum(outputs[1:], outputs[0])
        else:  # Product
            y = outputs[0]
            for o in outputs[1:]:
                y = y * o
        return y.astype(self.output_dtype)

    def n_nested(self) -> int:
        return len(self.nested)

    def hyperparams(self):
        return {
            "otype": self.otype,
            "reduction": self.reduction_type.value,
            "nested": [e.hyperparams() for e in self.nested],
        }

"""Fully fused MLP — Pallas TPU kernel.

TPU-native analogue of the reference's ``kernel_mlp_fused``
(reference: src/fully_fused_mlp.cu:499-557): the *entire* MLP runs in one
kernel launch per batch tile. Where the CUDA kernel keeps weights in per-warp
register fragments and activations in shared memory, here all weight
matrices are pinned in VMEM for the kernel's lifetime and the batch is tiled
over the Pallas grid; every layer is one MXU pass (``jnp.dot`` with fp32
accumulation) with the activation applied in-register by the VPU. No
activation tensor ever round-trips to HBM — that is the entire point of
"fully fused" on both architectures.

Backward follows the Pallas custom-VJP pattern: the forward kernel's
residuals are just ``(params, x)`` and the backward pass *recomputes* the
layer activations (FLOPs are cheaper than HBM on TPU) while walking the
layers in reverse — the analogue of ``kernel_mlp_fused_backward``
(fully_fused_mlp.cu:151-259) with the weight-gradient GEMMs
(dL_dy^T · activations, the split-k CUTLASS calls at :784-830) expressed as
XLA matmuls that the compiler schedules in parallel.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..common import Activation
from ..networks.activations import activation_fn
from .pallas_utils import cdiv, interpret_mode

# Batch rows processed per grid step. Large tiles amortize per-grid-step
# overhead (measured on v5e: 4096 -> 313 M elem/s vs 512 -> 251 M at width
# 64); all weights + activation buffers still stay far under VMEM.
DEFAULT_TILE_B = 4096

# Lane packing default. Standalone forward throughput measures neutral at
# width 64 and the packed shapes fail Mosaic remote-compile at tiles
# >= 16384; composed in the flagship train step it measured a large
# regression (27 -> 63 ms/step) — off until the composed loss is
# understood. Flip per call with pack=True.
DEFAULT_PACK = False

# Kernel-internal lane packing (see _kernel_pack_*): packs G = 128/width
# tile-slabs along the lane axis INSIDE the kernel, with block-diagonal
# weights built in VMEM — no XLA-level relayout of narrow bf16 arrays (the
# composed regression above) and no in-kernel reshape (the Mosaic crash);
# slab packing is pure lane-concat of disjoint row blocks. Streams tile/G
# rows per MXU pass at full 128-lane width: ideal speedup G x for
# row-rate-bound narrow matmuls. Default set by measurement (PLAN.md).
DEFAULT_KPACK = False

# In-kernel activation layout. "rm" (row-major): activations are
# (tile_b, width) — width occupies the 128-lane axis, so a width-w MLP
# uses w/128 of every vreg and MXU pass. "cf" (channel-first /
# weights-stationary): activations are (width, tile_b) — the BATCH fills
# the lane axis and the MXU streams the (w, w) weight's rows, so per-pass
# output-element rate is 128/w higher for narrow widths (the TPU analogue
# of the reference keeping weights in register fragments and streaming
# batch fragments through them, fully_fused_mlp.cu:47-129). No XLA-level
# transpose anywhere: the layout flips ride inside dot_general contraction
# orders, which the MXU consumes natively. Default "cf" by measurement
# (v5e, B=2^20, PLAN.md round-2 table): training 1.6-3.8x over "rm" at
# every width, 74% MXU roofline on the width-128 standalone backward.
DEFAULT_LAYOUT = "cf"


def _lane_packing(weights_t: Sequence[jnp.ndarray]) -> int:
    """Samples packed per 128-lane row for narrow MLPs.

    A width-w MLP (w in {16, 32, 64}) fills only w of the 128 vector lanes
    and w of the 128 MXU columns; packing G = 128/w samples per row with
    block-diagonal weights (the TPU analogue of the reference packing
    16-row wmma batch fragments per warp, fully_fused_mlp.cu:47-129) makes
    every matmul (tile, 128) @ (128, 128) — full lane and MXU utilization
    for G x the FLOPs, a net win whenever utilization gain (128/w)^2 beats
    the G x waste.
    """
    w = weights_t[0].shape[1]
    if w >= 128 or 128 % w != 0:
        return 1
    if any(wt.shape[1] != w for wt in weights_t[:-1]):
        return 1
    return 128 // w


def _pack_block_diag(weights_t, G):
    eye = None
    packed = []
    for wt in weights_t:
        if eye is None or eye.dtype != wt.dtype:
            eye = jnp.eye(G, dtype=wt.dtype)
        packed.append(jnp.kron(eye, wt))
    return packed


def _pad_to_group(x, G):
    b = x.shape[0]
    pb = cdiv(b, G) * G
    if pb != b:
        x = jnp.pad(x, ((0, pb - b), (0, 0)))
    return x


def _unpack_dw(dw, G):
    """(G*a, G*b) block-diagonal gradient -> (a, b): the off-diagonal
    blocks couple different packed samples and are exactly zero in the
    forward; their computed gradients belong to those zero blocks and are
    discarded; the diagonal blocks each see a 1/G slice of the batch and
    sum to the full weight gradient."""
    a, b = dw.shape[0] // G, dw.shape[1] // G
    t = dw.reshape(G, a, G, b)
    return sum(t[g, :, g, :] for g in range(G))


def _kernel_pack_slabs(h, G):
    """(T, c) -> (T/G, G*c): lane-concat G disjoint row slabs. Slab k holds
    rows [k*T/G, (k+1)*T/G) in lane block k — no sublane interleaving, so
    Mosaic lowers it to plain vreg lane concatenation."""
    T = h.shape[0]
    s = T // G
    return jnp.concatenate([h[k * s : (k + 1) * s] for k in range(G)], axis=1)


def _kernel_unpack_slabs(h, G):
    """Inverse of _kernel_pack_slabs: (T/G, G*c) -> (T, c)."""
    c = h.shape[1] // G
    return jnp.concatenate(
        [h[:, k * c : (k + 1) * c] for k in range(G)], axis=0
    )


def _kernel_block_diag(w, G):
    """(a, b) -> (G*a, G*b) block-diagonal, built with static lane/sublane
    concats in VMEM (loop-invariant: Mosaic hoists it out of the grid)."""
    a, b = w.shape
    z = jnp.zeros((a, b), w.dtype)
    rows = []
    for k in range(G):
        rows.append(
            jnp.concatenate(
                [w if j == k else z for j in range(G)], axis=1
            )
        )
    return jnp.concatenate(rows, axis=0)


def _kernel_diag_sum(dw, G):
    """(G*a, G*b) -> (a, b): sum of the diagonal blocks (each sees one
    tile slab of the batch)."""
    a, b = dw.shape[0] // G, dw.shape[1] // G
    acc = dw[:a, :b]
    for k in range(1, G):
        acc = acc + dw[k * a : (k + 1) * a, k * b : (k + 1) * b]
    return acc


def _mlp_kernel(x_ref, *refs, activation: Activation, output_activation: Activation,
                n_layers: int, out_dtype, kpack: int = 1):
    """One batch tile through the whole MLP. refs = (w0, ..., wn-1, out)."""
    w_refs = refs[:n_layers]
    out_ref = refs[n_layers]
    h = x_ref[...]
    if kpack > 1:
        h = _kernel_pack_slabs(h, kpack)
    for i in range(n_layers):
        w = w_refs[i][...]
        if kpack > 1:
            w = _kernel_block_diag(w, kpack)
        acc = jnp.dot(h, w, preferred_element_type=jnp.float32)
        act = output_activation if i == n_layers - 1 else activation
        acc = activation_fn(acc, act)
        h = acc.astype(out_dtype if i == n_layers - 1 else h.dtype)
    if kpack > 1:
        h = _kernel_unpack_slabs(h, kpack)
    out_ref[...] = h


def _dg(a, ca: int, b, cb: int):
    """dot_general contracting a's axis ``ca`` with b's axis ``cb``; output
    dims are (a's free axis, b's free axis). fp32 accumulation. This is how
    the CF kernels express every transpose: as a contraction order the MXU
    consumes natively, never as a data movement."""
    if interpret_mode():
        # XLA:CPU's DotThunk can't run bf16 x bf16 -> f32 for these
        # contraction orders. f32-multiplying bf16 values under f32
        # accumulation is bit-identical to the MXU's bf16 mode, so the
        # interpret path upcasts the operands.
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
    return jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((), ())), preferred_element_type=jnp.float32
    )


def _cf_stack(h, G):
    """(w, T) -> (G*w, T/G): stack G batch slabs along sublanes. Slab g is
    the lane block [g*T/G, (g+1)*T/G) — static slices only, no reshapes
    (in-kernel reshapes are the Mosaic crash the row-major kpack hit)."""
    s = h.shape[1] // G
    return jnp.concatenate(
        [h[:, g * s : (g + 1) * s] for g in range(G)], axis=0
    )


def _cf_unstack(h2, G):
    """Inverse of _cf_stack: (G*w, T/G) -> (w, T)."""
    w = h2.shape[0] // G
    return jnp.concatenate(
        [h2[g * w : (g + 1) * w, :] for g in range(G)], axis=1
    )


def _cf_pack_of(weights_t, n_layers: int, tile_b: int) -> int:
    """Sublane packing degree for the CF kernels: G = 128/w batch slabs
    stacked so every hidden contraction is exactly 128 — full MXU at any
    supported width. Requires >= 1 hidden-to-hidden matmul and equal
    hidden widths."""
    if n_layers < 3:
        return 1
    w = weights_t[0].shape[1]
    if w >= 128 or 128 % w != 0:
        return 1
    if any(wt.shape[1] != w for wt in weights_t[:-1]) or (
        weights_t[-1].shape[0] != w
    ):
        return 1
    G = 128 // w
    # Slab lanes (tile_b/G) must stay a multiple of the 128-lane width.
    if tile_b % (G * 128) != 0:
        return 1
    return G


def _mlp_kernel_cf(x_ref, *refs, activation: Activation,
                   output_activation: Activation, n_layers: int, out_dtype,
                   cfpack: int = 1):
    """Channel-first fused forward: one batch tile, intermediates (w, tile_b)
    with the batch in the 128-lane axis. Input/output blocks stay row-major
    (batch-leading) — the first/last contractions absorb the flips. With
    ``cfpack`` G > 1, hidden layers run sublane-stacked ((G*w, T/G) slabs,
    block-diagonal weights): every hidden MXU pass contracts a full 128."""
    w_refs = refs[:n_layers]
    out_ref = refs[n_layers]
    x = x_ref[...]  # (tile_b, in_w)
    if n_layers == 1:
        z = _dg(x, 1, w_refs[0][...], 0)  # (tile_b, out)
        out_ref[...] = activation_fn(z, output_activation).astype(out_dtype)
        return
    # Layer 0: contract in_w of (in_w, w) against in_w of (tile_b, in_w)
    # -> (w, tile_b), channel-first from here on.
    h = activation_fn(_dg(w_refs[0][...], 0, x, 1), activation).astype(x.dtype)
    if cfpack > 1:
        h = _cf_stack(h, cfpack)
    for i in range(1, n_layers - 1):
        w = w_refs[i][...]
        if cfpack > 1:
            w = _kernel_block_diag(w, cfpack)
        z = _dg(w, 0, h, 0)  # (w_out[*G], tile_b[/G])
        h = activation_fn(z, activation).astype(x.dtype)
    if cfpack > 1:
        h = _cf_unstack(h, cfpack)
    z = _dg(h, 0, w_refs[n_layers - 1][...], 0)  # (tile_b, out)
    out_ref[...] = activation_fn(z, output_activation).astype(out_dtype)


def mlp_forward_pallas(
    x: jnp.ndarray,
    weights_t: Sequence[jnp.ndarray],
    activation: Activation,
    output_activation: Activation,
    tile_b: int = DEFAULT_TILE_B,
    pack: bool = DEFAULT_PACK,
    kpack: bool | None = None,
    layout: str = "rm",
) -> jnp.ndarray:
    """Run the fused forward pass.

    Args:
      x: (batch, in_width) in the compute dtype (bf16).
      weights_t: transposed weights [(in, w), (w, w)..., (w, out_p)] in the
        compute dtype — i.e. ``W_i^T`` of the stored row-major matrices so the
        kernel computes ``h @ W^T`` as plain ``h @ w``.
      pack: lane-pack narrow widths at the XLA level (see ``_lane_packing``).
      kpack: lane-pack tile slabs INSIDE the kernel (no XLA relayout);
        None = DEFAULT_KPACK. Ignored when ``pack`` already packed.
      layout: "rm" (row-major activations) or "cf" (channel-first,
        weights-stationary — see DEFAULT_LAYOUT). "cf" ignores pack/kpack
        (it already fills the lanes with batch).
    """
    orig_batch = x.shape[0]
    if layout not in ("rm", "cf"):
        raise ValueError(f"layout must be 'rm' or 'cf', got {layout!r}")
    if layout == "cf":
        pack = False
        kpack = False
    G = _lane_packing(weights_t) if pack else 1
    if G > 1:
        weights_t = _pack_block_diag(weights_t, G)
        x = _pad_to_group(x, G).reshape(-1, G * x.shape[1])
    batch, in_width = x.shape
    out_width = weights_t[-1].shape[1]
    n_layers = len(weights_t)
    dtype = x.dtype

    kp = 1
    if G == 1 and (DEFAULT_KPACK if kpack is None else kpack):
        kp = _lane_packing(weights_t)

    tile_b = min(tile_b, max(128, cdiv(batch, 1)))
    padded_batch = cdiv(batch, tile_b) * tile_b
    if padded_batch != batch:
        x = jnp.pad(x, ((0, padded_batch - batch), (0, 0)))

    grid = (padded_batch // tile_b,)
    if layout == "cf":
        kernel = functools.partial(
            _mlp_kernel_cf,
            activation=activation,
            output_activation=output_activation,
            n_layers=n_layers,
            out_dtype=dtype,
            cfpack=_cf_pack_of(weights_t, n_layers, tile_b),
        )
    else:
        kernel = functools.partial(
            _mlp_kernel,
            activation=activation,
            output_activation=output_activation,
            n_layers=n_layers,
            out_dtype=dtype,
            kpack=kp,
        )

    in_specs = [
        pl.BlockSpec((tile_b, in_width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    for w in weights_t:
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )

    flops_per_row = 2 * sum(a.shape[0] * a.shape[1] for a in weights_t)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile_b, out_width), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((padded_batch, out_width), dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_row * padded_batch,
            bytes_accessed=(
                padded_batch * (in_width + out_width) * 2
                + sum(a.size for a in weights_t) * 2
            ),
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(x, *weights_t)

    if padded_batch != batch:
        out = out[:batch]
    if G > 1:
        out = out.reshape(-1, out_width // G)[:orig_batch]
    return out


# ---------------------------------------------------------------------------
# Packed-I/O inference kernel
# ---------------------------------------------------------------------------


def packed_group(in_width: int, weights_t) -> int:
    """Samples per 128-lane row for the packed-I/O inference path: G =
    128/in_width when the MLP is narrow-uniform (hidden width == in_width,
    both dividing 128). 1 means packing does not apply."""
    w = weights_t[0].shape[1] if weights_t else 0
    if in_width >= 128 or in_width <= 0 or 128 % in_width != 0:
        return 1
    if w != in_width or any(wt.shape[1] != w for wt in weights_t[:-1]):
        return 1
    return 128 // in_width


def _mlp_kernel_packed(x_ref, *refs, activation: Activation,
                       output_activation: Activation, n_layers: int,
                       out_dtype, G: int):
    """Packed-I/O forward: the block holds G samples per 128-lane row
    (sample r*G+k at lanes [k*w, (k+1)*w)). Every layer runs with
    G-block-diagonal weights, so every matmul contracts a full 128 and —
    the point — the input/output HBM DMAs move NO padding bytes. This is
    the TPU analogue of the reference's INFERENCE=true kernel
    specialization (src/fully_fused_mlp.cu:682-706): same weights, a
    serving-only execution strategy. Inference only (no vjp)."""
    w_refs = refs[:n_layers]
    out_ref = refs[n_layers]
    x = x_ref[...]  # (tile_b, 128): G packed samples per row
    if n_layers == 1:
        # Single matmul: packed lanes in, packed lanes out.
        wbd = _kernel_block_diag(w_refs[0][...], G)
        z = _dg(x, 1, wbd, 0)  # (tile_b, G*out_p)
        out_ref[...] = activation_fn(z, output_activation).astype(out_dtype)
        return
    wbd0 = _kernel_block_diag(w_refs[0][...], G)
    # Layer 0 contracts the packed lanes -> CF slab form (G*w, tile_b):
    # sublane block k holds sample-slab k's hidden units.
    h = activation_fn(_dg(wbd0, 0, x, 1), activation).astype(x.dtype)
    for i in range(1, n_layers - 1):
        wbd = _kernel_block_diag(w_refs[i][...], G)
        h = activation_fn(_dg(wbd, 0, h, 0), activation).astype(x.dtype)
    wbdl = _kernel_block_diag(w_refs[n_layers - 1][...], G)
    z = _dg(h, 0, wbdl, 0)  # (tile_b, G*out_p) packed
    out_ref[...] = activation_fn(z, output_activation).astype(out_dtype)


def mlp_forward_pallas_packed(
    x_packed: jnp.ndarray,
    weights_t: Sequence[jnp.ndarray],
    activation: Activation,
    output_activation: Activation,
    tile_b: int = DEFAULT_TILE_B,
) -> jnp.ndarray:
    """Packed-I/O fused inference.

    Args:
      x_packed: (batch/G, 128) in the compute dtype, G = 128/in_width
        samples per row — row r lane k*in_width+j holds ``x[r*G+k, j]``
        (i.e. exactly ``x.reshape(batch/G, 128)`` of a COMPACT row-major
        (batch, in_width) array; pack on host for free, or keep serving
        buffers in this layout end-to-end).

    Returns (batch/G, G*out_width): row r lanes [k*out_width,
    (k+1)*out_width) hold sample r*G+k's outputs — ``reshape(batch,
    out_width)`` to unpack (again layout-free on compact data).

    Rationale (measured, v5e): a (N, w<128) array pads its minor dim to
    128 lanes in HBM, so the standard kernel's I/O moves 128/w x the
    useful bytes and inference at widths 16-64 floors at ~360 M rows/s.
    Packed I/O moves only real bytes; every matmul is a full-128 MXU
    pass against block-diagonal weights.
    """
    if len(x_packed.shape) != 2 or x_packed.shape[1] != 128:
        raise ValueError(
            f"x_packed must be (batch/G, 128), got {x_packed.shape}"
        )
    n_layers = len(weights_t)
    in_width = weights_t[0].shape[0]
    G = packed_group(in_width, weights_t)
    if G <= 1:
        raise ValueError(
            "packed path needs a narrow uniform MLP (in/hidden width "
            f"dividing 128); got in={in_width}, "
            f"widths={[w.shape[1] for w in weights_t]}"
        )
    out_width = weights_t[-1].shape[1]
    dtype = x_packed.dtype
    rows = x_packed.shape[0]

    tile_b = min(tile_b, max(128, rows))
    padded_rows = cdiv(rows, tile_b) * tile_b
    if padded_rows != rows:
        x_packed = jnp.pad(x_packed, ((0, padded_rows - rows), (0, 0)))

    kernel = functools.partial(
        _mlp_kernel_packed,
        activation=activation,
        output_activation=output_activation,
        n_layers=n_layers,
        out_dtype=dtype,
        G=G,
    )
    in_specs = [
        pl.BlockSpec((tile_b, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
    ]
    for w in weights_t:
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        )
    flops_per_row = 2 * G * sum(a.shape[0] * a.shape[1] for a in weights_t)
    out = pl.pallas_call(
        kernel,
        grid=(padded_rows // tile_b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile_b, G * out_width), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (padded_rows, G * out_width), dtype
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_row * padded_rows,
            bytes_accessed=padded_rows * (128 + G * out_width) * 2
            + sum(a.size for a in weights_t) * 2,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(x_packed, *weights_t)
    if padded_rows != rows:
        out = out[:rows]
    return out


def _mlp_bwd_kernel_packed(x_ref, g_ref, *refs, activation: Activation,
                           output_activation: Activation, n_layers: int,
                           in_dtype, G: int):
    """Packed-I/O fused-recompute backward: one batch tile entirely in
    the packed 128-lane space (G samples per row, block-diagonal
    weights). dW partials reduce to (a, b) by diagonal-block sum —
    G x the FLOPs at G x the MXU utilization, with NO lane-padded I/O
    (the reason the standard kernel loses narrow-width training)."""
    w_refs = refs[:n_layers]
    dx_ref = refs[n_layers]
    dw_refs = refs[n_layers + 1 : 2 * n_layers + 1]
    ws = [_kernel_block_diag(w_refs[i][...], G) for i in range(n_layers)]

    cheap_act = activation in (Activation.NONE, Activation.ReLU)
    x = x_ref[...]  # (tile_b, 128) packed
    hs = [x]
    pres = []
    h = x
    for i in range(n_layers):
        z = jnp.dot(h, ws[i], preferred_element_type=jnp.float32)
        pres.append(None if (cheap_act and i < n_layers - 1) else z)
        if i < n_layers - 1:
            h = activation_fn(z, activation).astype(in_dtype)
            hs.append(h)

    def hvjp(dh, i):
        if activation == Activation.NONE:
            return dh
        if activation == Activation.ReLU:
            # bf16 comparisons are rejected by Mosaic on this target.
            return jnp.where(hs[i + 1].astype(jnp.float32) > 0.0, dh, 0.0)
        return _act_vjp(dh, pres[i], activation)

    g = g_ref[...].astype(jnp.float32)  # (tile_b, G*out_p) packed
    delta = _act_vjp(g, pres[-1], output_activation)
    for i in range(n_layers - 1, -1, -1):
        d16 = delta.astype(in_dtype)
        dw = jnp.dot(hs[i].T, d16, preferred_element_type=jnp.float32)
        dw_refs[i][...] = _kernel_diag_sum(dw, G)[None]
        dh = jnp.dot(d16, ws[i].T, preferred_element_type=jnp.float32)
        if i > 0:
            delta = hvjp(dh, i - 1)
    dx_ref[...] = dh.astype(in_dtype)


def mlp_backward_pallas_packed(
    x_packed: jnp.ndarray,
    g_packed: jnp.ndarray,
    weights_t: Sequence[jnp.ndarray],
    activation: Activation,
    output_activation: Activation,
    tile_b: int = DEFAULT_TILE_B,
):
    """Packed-I/O fused-recompute backward; returns (dx_packed, [dW...])
    with dW in the transposed (in, out) layout of ``weights_t``. Layout
    contract as in :func:`mlp_forward_pallas_packed`."""
    n_layers = len(weights_t)
    in_width = weights_t[0].shape[0]
    G = packed_group(in_width, weights_t)
    if G <= 1:
        raise ValueError("packed path needs a narrow uniform MLP")
    out_width = weights_t[-1].shape[1]
    dtype = x_packed.dtype
    rows = x_packed.shape[0]

    tile_b = min(tile_b, max(128, rows))
    # VMEM guard: x, g, dx + n_layers packed activations (bf16, 128
    # lanes) + f32 transients; halve the tile under the scoped budget.
    cheap = activation in (Activation.NONE, Activation.ReLU)
    per_row = 2 * (2 * 128 + G * out_width) + 2 * n_layers * 128 + (
        0 if cheap else 4 * n_layers * 128
    ) + 12 * 128
    while tile_b > 512 and tile_b * per_row > 11 * 2**20:
        tile_b //= 2
    padded_rows = cdiv(rows, tile_b) * tile_b
    if padded_rows != rows:
        x_packed = jnp.pad(x_packed, ((0, padded_rows - rows), (0, 0)))
        g_packed = jnp.pad(g_packed, ((0, padded_rows - rows), (0, 0)))
    n_tiles = padded_rows // tile_b

    kernel = functools.partial(
        _mlp_bwd_kernel_packed,
        activation=activation,
        output_activation=output_activation,
        n_layers=n_layers,
        in_dtype=dtype,
        G=G,
    )
    in_specs = [
        pl.BlockSpec((tile_b, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_b, G * out_width), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    for w in weights_t:
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        )
    out_specs = [
        pl.BlockSpec((tile_b, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
    ]
    out_shapes = [jax.ShapeDtypeStruct((padded_rows, 128), dtype)]
    for w in weights_t:
        out_specs.append(
            pl.BlockSpec((1,) + w.shape, lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((n_tiles,) + w.shape, jnp.float32)
        )
    flops_per_row = 6 * G * sum(a.shape[0] * a.shape[1] for a in weights_t)
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_row * padded_rows,
            bytes_accessed=padded_rows * (2 * 128 + G * out_width) * 2
            + n_tiles * sum(a.size for a in weights_t) * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(x_packed, g_packed, *weights_t)
    dx = outs[0][:rows]
    dws = [p.sum(axis=0) for p in outs[1:]]
    return dx, dws


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def ffmlp_apply_packed(x_packed, weights_t, activation: Activation,
                       output_activation: Activation):
    """Differentiable packed-I/O fused MLP (first-order reverse mode):
    forward and fused-recompute backward both run entirely in the packed
    128-lane layout — no lane-padded activation or gradient I/O at any
    point. Layout contract: :func:`mlp_forward_pallas_packed`."""
    return mlp_forward_pallas_packed(
        x_packed, tuple(weights_t), activation, output_activation
    )


def _ffmlp_packed_fwd(x_packed, weights_t, activation, output_activation):
    out = mlp_forward_pallas_packed(
        x_packed, tuple(weights_t), activation, output_activation
    )
    return out, (x_packed, tuple(weights_t))


def _ffmlp_packed_bwd(activation, output_activation, residuals, g):
    x_packed, weights_t = residuals
    dx, dws = mlp_backward_pallas_packed(
        x_packed, g.astype(x_packed.dtype), weights_t, activation,
        output_activation,
    )
    return dx, tuple(dw.astype(w.dtype) for dw, w in zip(dws, weights_t))


ffmlp_apply_packed.defvjp(_ffmlp_packed_fwd, _ffmlp_packed_bwd)


# ---------------------------------------------------------------------------
# Fused backward kernel
# ---------------------------------------------------------------------------


def _act_vjp(g, z, act: Activation):
    """dL/dz given dL/da where a = act(z); pure jnp, traceable in-kernel."""
    if act == Activation.NONE:
        return g
    if act == Activation.ReLU:
        return jnp.where(z > 0, g, 0.0)
    _, vjp = jax.vjp(lambda t: activation_fn(t, act), z)
    return vjp(g)[0]


def _mlp_bwd_kernel(x_ref, g_ref, *refs, activation: Activation,
                    output_activation: Activation, n_layers: int, in_dtype,
                    kpack: int = 1):
    """One batch tile: recompute the forward in VMEM, walk the layers in
    reverse, emit dx for the tile and per-tile dW partials. Nothing
    activation-sized ever touches HBM — the TPU analogue of the reference's
    kernel_mlp_fused_backward (fully_fused_mlp.cu:151-259)."""
    w_refs = refs[:n_layers]
    dx_ref = refs[n_layers]
    dw_refs = refs[n_layers + 1 : 2 * n_layers + 1]

    ws = [w_refs[i][...] for i in range(n_layers)]
    if kpack > 1:
        ws = [_kernel_block_diag(w, kpack) for w in ws]

    # Forward recompute, keeping pre-activations (fp32) for the act-vjp.
    x = x_ref[...]
    if kpack > 1:
        x = _kernel_pack_slabs(x, kpack)
    hs = [x]
    pres = []
    h = hs[0]
    for i in range(n_layers):
        z = jnp.dot(h, ws[i], preferred_element_type=jnp.float32)
        pres.append(z)
        act = output_activation if i == n_layers - 1 else activation
        if i < n_layers - 1:
            h = activation_fn(z, act).astype(in_dtype)
            hs.append(h)

    g = g_ref[...].astype(jnp.float32)
    if kpack > 1:
        g = _kernel_pack_slabs(g, kpack)
    delta = _act_vjp(g, pres[-1], output_activation)
    for i in range(n_layers - 1, -1, -1):
        d16 = delta.astype(in_dtype)
        # dW_i = h_i^T @ delta_i — M=N=width, K=tile: MXU-shaped.
        dw = jnp.dot(hs[i].T, d16, preferred_element_type=jnp.float32)
        if kpack > 1:
            dw = _kernel_diag_sum(dw, kpack)
        dw_refs[i][...] = dw[None]
        dh = jnp.dot(d16, ws[i].T, preferred_element_type=jnp.float32)
        if i > 0:
            delta = _act_vjp(dh, pres[i - 1], activation)
    if kpack > 1:
        dh = _kernel_unpack_slabs(dh, kpack)
    dx_ref[...] = dh.astype(in_dtype)


def _mlp_bwd_kernel_cf(x_ref, g_ref, *refs, activation: Activation,
                       output_activation: Activation, n_layers: int,
                       in_dtype, cfpack: int = 1):
    """Channel-first fused-recompute backward. Intermediates (w, tile_b);
    every dW contraction runs over the full-lane tile_b axis and every
    layout flip is a dot_general contraction order (no transposes). With
    ``cfpack`` G > 1 the hidden walk runs sublane-stacked like the forward;
    block-diagonal dW partials reduce to (w, w) by diagonal-block sum —
    packed weight-grad wall-clock equals unpacked (G x FLOPs at G x the
    utilization), while recompute/dgrad gain the full G x."""
    w_refs = refs[:n_layers]
    dx_ref = refs[n_layers]
    dw_refs = refs[n_layers + 1 : 2 * n_layers + 1]
    ws = [w_refs[i][...] for i in range(n_layers)]
    x = x_ref[...]  # (tile_b, in_w)
    g = g_ref[...].astype(jnp.float32)  # (tile_b, out)

    if n_layers == 1:
        z = _dg(x, 1, ws[0], 0)  # (tile_b, out)
        delta = _act_vjp(g, z, output_activation).astype(in_dtype)
        dw_refs[0][...] = _dg(x, 0, delta, 0)[None]  # (in, out), K=tile_b
        dx_ref[...] = _dg(delta, 1, ws[0], 1).astype(in_dtype)  # (tile_b, in)
        return

    G = cfpack
    wbd = [
        _kernel_block_diag(ws[i], G) if G > 1 else ws[i]
        for i in range(1, n_layers - 1)
    ]
    # ReLU's vjp mask is recoverable from the POST-activation (h > 0 <=>
    # z > 0 up to bf16 underflow at ~1e-38), and NONE needs no residual:
    # for those, skip storing the f32 pre-activations entirely — the
    # hidden walk masks against the bf16 hs already in VMEM, halving the
    # backward kernel's live VMEM.
    cheap_act = activation in (Activation.NONE, Activation.ReLU)

    # Forward recompute: hs[i] is layer i's input (CF for i >= 1; hidden
    # inputs sublane-stacked when G > 1).
    pres = []
    z = _dg(ws[0], 0, x, 1)  # (w, tile_b)
    pres.append(None if cheap_act else z)
    h1 = activation_fn(z, activation).astype(in_dtype)
    if G > 1:
        h1 = _cf_stack(h1, G)
    hs = [x, h1]
    for i in range(1, n_layers - 1):
        z = _dg(wbd[i - 1], 0, hs[i], 0)  # (w_out[*G], tile_b[/G])
        pres.append(None if cheap_act else z)
        hs.append(activation_fn(z, activation).astype(in_dtype))

    def hvjp(dh, i):
        # Activation vjp at hidden/first layer i, in dh's packing state
        # (hs[i+1] is stored in the state dh flows in at layer i).
        if activation == Activation.NONE:
            return dh
        if activation == Activation.ReLU:
            # f32 compare: Mosaic rejects bf16 comparisons on this target
            # ("Target does not support this comparison").
            return jnp.where(hs[i + 1].astype(jnp.float32) > 0.0, dh, 0.0)
        return _act_vjp(dh, pres[i], activation)

    h_last = hs[n_layers - 1]
    if G > 1:
        h_last = _cf_unstack(h_last, G)
    if output_activation == Activation.NONE:
        # No output-act vjp -> the last layer's forward recompute matmul
        # is dead; delta is the cotangent itself.
        delta = g.astype(in_dtype)
    else:
        z_last = _dg(h_last, 0, ws[n_layers - 1], 0)  # (tile_b, out)
        delta = _act_vjp(g, z_last, output_activation).astype(in_dtype)
    # Last layer (row-major delta), handing a CF dh to the hidden walk.
    dw_refs[n_layers - 1][...] = _dg(h_last, 1, delta, 0)[None]
    dh = _dg(ws[n_layers - 1], 1, delta, 1)  # (w, tile_b) f32
    if G > 1 and n_layers > 2:
        dh = _cf_stack(dh, G)

    for i in range(n_layers - 2, 0, -1):
        d16 = hvjp(dh, i).astype(in_dtype)
        dwp = _dg(hs[i], 1, d16, 1)  # (w_in[*G], w_out[*G]), K=tile_b[/G]
        if G > 1:
            dwp = _kernel_diag_sum(dwp, G)
        dw_refs[i][...] = dwp[None]
        dh = _dg(wbd[i - 1], 1, d16, 0)  # (w_in[*G], tile_b[/G])

    if cheap_act:
        # Mask in dh's (packed) state, then unstack — where() commutes
        # with the slab unstack.
        d16 = hvjp(dh, 0).astype(in_dtype)
        if G > 1 and n_layers > 2:
            d16 = _cf_unstack(d16, G)
    else:
        if G > 1 and n_layers > 2:
            dh = _cf_unstack(dh, G)
        d16 = _act_vjp(dh, pres[0], activation).astype(in_dtype)
    dw_refs[0][...] = _dg(x, 0, d16, 1)[None]  # (in_w, w), K=tile_b
    dx_ref[...] = _dg(d16, 0, ws[0], 1).astype(in_dtype)  # (tile_b, in_w)


def mlp_backward_pallas(
    x: jnp.ndarray,
    g: jnp.ndarray,
    weights_t: Sequence[jnp.ndarray],
    activation: Activation,
    output_activation: Activation,
    tile_b: int = DEFAULT_TILE_B,
    pack: bool = DEFAULT_PACK,
    kpack: bool | None = None,
    layout: str = "rm",
):
    """Fused-recompute backward: returns (dx, [dW...]) with dW in the same
    transposed (in, out) layout as ``weights_t``. HBM traffic is x + g +
    per-tile dW partials; all activations live and die in VMEM."""
    orig_batch = x.shape[0]
    if layout not in ("rm", "cf"):
        raise ValueError(f"layout must be 'rm' or 'cf', got {layout!r}")
    if layout == "cf":
        pack = False
        kpack = False
    G = _lane_packing(weights_t) if pack else 1
    if G > 1:
        weights_t = _pack_block_diag(weights_t, G)
        x = _pad_to_group(x, G).reshape(-1, G * x.shape[1])
        g = _pad_to_group(g, G).reshape(-1, G * g.shape[1])
    batch, in_width = x.shape
    out_width = weights_t[-1].shape[1]
    n_layers = len(weights_t)
    dtype = x.dtype

    kp = 1
    if G == 1 and (DEFAULT_KPACK if kpack is None else kpack):
        kp = _lane_packing(weights_t)

    tile_b = min(tile_b, max(128, batch))
    # VMEM guard: the backward keeps x, g, dx and n_layers activation
    # tensors (bf16) plus ~3 tile-sized f32 transients live per step (non-
    # cheap activations add n_layers f32 pre-activations). Halve the tile
    # until the estimate clears the ~16 MB scoped-VMEM budget with room
    # for double buffering (a 128x5 net at tile 4096 measured 17.84M and
    # failed to compile before this guard).
    cheap = layout == "cf" and activation in (
        Activation.NONE, Activation.ReLU
    )  # only the CF kernel implements the cheap-act path
    per_row = (
        2 * (2 * in_width + out_width)  # x, dx (bf16) + g
        + 2 * n_layers * max(in_width, out_width, weights_t[0].shape[1])
        + (0 if cheap else 4 * n_layers * weights_t[0].shape[1])
        + 12 * weights_t[0].shape[1]  # f32 transients (dh, d16, z)
    )
    while tile_b > 512 and tile_b * per_row > 11 * 2**20:
        tile_b //= 2
    padded_batch = cdiv(batch, tile_b) * tile_b
    if padded_batch != batch:
        x = jnp.pad(x, ((0, padded_batch - batch), (0, 0)))
        g = jnp.pad(g, ((0, padded_batch - batch), (0, 0)))
    n_tiles = padded_batch // tile_b

    if layout == "cf":
        kernel = functools.partial(
            _mlp_bwd_kernel_cf,
            activation=activation,
            output_activation=output_activation,
            n_layers=n_layers,
            in_dtype=dtype,
            cfpack=_cf_pack_of(weights_t, n_layers, tile_b),
        )
    else:
        kernel = functools.partial(
            _mlp_bwd_kernel,
            activation=activation,
            output_activation=output_activation,
            n_layers=n_layers,
            in_dtype=dtype,
            kpack=kp,
        )
    in_specs = [
        pl.BlockSpec((tile_b, in_width), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_b, out_width), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    for w in weights_t:
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    out_specs = [
        pl.BlockSpec((tile_b, in_width), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
    ]
    out_shapes = [jax.ShapeDtypeStruct((padded_batch, in_width), dtype)]
    for w in weights_t:
        out_specs.append(
            pl.BlockSpec((1,) + w.shape, lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((n_tiles,) + w.shape, jnp.float32)
        )

    flops_per_row = 6 * sum(a.shape[0] * a.shape[1] for a in weights_t)
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_row * padded_batch,
            bytes_accessed=padded_batch * (2 * in_width + out_width) * 2
            + n_tiles * sum(a.size for a in weights_t) * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(x, g, *weights_t)
    dx = outs[0][:batch]
    dws = [p.sum(axis=0) for p in outs[1:]]
    if G > 1:
        dx = dx.reshape(-1, in_width // G)[:orig_batch]
        dws = [_unpack_dw(dw, G) for dw in dws]
    return dx, dws


# ---------------------------------------------------------------------------
# Differentiable wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def ffmlp_apply(x, weights_t, activation: Activation,
                output_activation: Activation, layout: str = DEFAULT_LAYOUT):
    """Differentiable fused MLP: forward on the Pallas kernel, backward via
    recompute + reverse walk (see module docstring). ``layout`` selects the
    in-kernel activation layout ("rm"/"cf" — see DEFAULT_LAYOUT)."""
    return mlp_forward_pallas(
        x, tuple(weights_t), activation, output_activation, layout=layout
    )


def _jnp_forward_saving(x, weights_t, activation, output_activation):
    """Reference (XLA) forward that returns pre-activations for the backward
    walk. Matches the kernel's math: bf16 inputs, fp32 accumulation."""
    pre = []
    h = x
    n = len(weights_t)
    for i, w in enumerate(weights_t):
        z = jnp.dot(h, w, preferred_element_type=jnp.float32)
        pre.append(z)
        act = output_activation if i == n - 1 else activation
        h = activation_fn(z, act).astype(x.dtype)
    return h, pre


def _ffmlp_fwd(x, weights_t, activation, output_activation,
               layout=DEFAULT_LAYOUT):
    out = mlp_forward_pallas(
        x, tuple(weights_t), activation, output_activation, layout=layout
    )
    return out, (x, tuple(weights_t))


def _act_bwd(g, z, act: Activation):
    """dL/dz given dL/da where a = act(z); fp32."""
    if act == Activation.NONE:
        return g
    _, vjp = jax.vjp(lambda t: activation_fn(t, act), z)
    return vjp(g)[0]


def _ffmlp_bwd(activation, output_activation, layout, residuals, g):
    # Fused-recompute backward kernel: the XLA layer-by-layer form round-
    # trips every activation through HBM and runs ~4x slower (PLAN.md).
    x, weights_t = residuals
    dx, dws = mlp_backward_pallas(
        x, g.astype(x.dtype), weights_t, activation, output_activation,
        layout=layout,
    )
    return dx, tuple(
        dw.astype(w.dtype) for dw, w in zip(dws, weights_t)
    )


ffmlp_apply.defvjp(_ffmlp_fwd, _ffmlp_bwd)

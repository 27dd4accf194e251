"""Fused masked attention-softmax forward/backward as Pallas TPU kernels.

TPU-native re-design of the reference's lightseq-derived CUDA kernels
(``src/softmax_kernel.cu``: fw ``ker_attn_softmax:124-224`` /
``ker_attn_softmax_lt32:35-122``, bw ``ker_attn_softmax_bw:308-341``).

Design translation, not a port:

* The CUDA fw picks a launch tier per ``to_len`` in {32,64,...,1024} and
  throws above 1024 (softmax_kernel.cu:250-275).  Here one kernel handles any
  ``to_len`` whose row fits VMEM (~32K fp32 lanes) -- the tiers were a warp
  geometry artifact with no TPU analogue.
* The CUDA kernel is in-place on its input (cuda_kernel_ops.py:457-468, the
  source of the reference's saved-tensor bug).  Pallas outputs are pure; the
  backward consumes the softmax *output*, which is the quantity the math
  wants: ``dinp = out * (dout - sum(dout * out))``.
* Supports an additive mask (padding and/or causal, broadcast over batch and
  query dims like the reference's (B,1,F,T)/(1,1,F,T) masks) plus a fused
  ``causal`` flag that generates the triangular mask from iota on the fly
  instead of materialising a (B,H,T,T) mask in HBM the way the reference does
  (modules_transfomer.py:63-71).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ._utils import DEFAULT_MASK_VALUE, cdiv, ragged_row_block, use_interpret_mode

Array = jax.Array

_DEFAULT_BLOCK_ROWS = 128


def _softmax_fwd_kernel(x_ref, mask_ref, out_ref, *, causal: bool, block_rows: int):
    x = x_ref[0, 0].astype(jnp.float32)  # (block_rows, to_len)
    if mask_ref is not None:
        x = x + mask_ref[0, 0].astype(jnp.float32)
    if causal:
        qi = pl.program_id(2)
        rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + qi * block_rows
        cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = jnp.where(cols <= rows, x, DEFAULT_MASK_VALUE)
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    out_ref[0, 0] = (e / s).astype(out_ref.dtype)


def _softmax_bwd_kernel(out_ref, dout_ref, dinp_ref):
    out = out_ref[...].astype(jnp.float32)
    dout = dout_ref[...].astype(jnp.float32)
    dot = jnp.sum(out * dout, axis=-1, keepdims=True)
    dinp_ref[...] = (out * (dout - dot)).astype(dinp_ref.dtype)


def _row_block(from_len: int) -> int:
    # Rows are independent in both fw and bw, so a ragged last block is safe
    # (OOB writes dropped).  8-aligned keeps Mosaic's sublane constraint.
    return ragged_row_block(from_len, _DEFAULT_BLOCK_ROWS)


def _fwd_impl(inp: Array, mask: Optional[Array], causal: bool) -> Array:
    b, h, f, t = inp.shape
    br = _row_block(f)
    grid = (b, h, cdiv(f, br))

    in_specs = [pl.BlockSpec((1, 1, br, t), lambda i, j, q: (i, j, q, 0))]
    args = [inp]
    if mask is not None:
        mb, mh, mf, mt = mask.shape
        assert mt == t, "mask to_len must match input"

        # Broadcast-aware index map over batch/head/query dims (shapes are
        # static python ints, so broadcasting resolves at trace time).
        def mask_map_static(i, j, q):
            return (0 if mb == 1 else i, 0 if mh == 1 else j, 0 if mf == 1 else q, 0)

        in_specs.append(
            pl.BlockSpec((1, 1, br if mf != 1 else 1, t), mask_map_static)
        )
        args.append(mask)

    kernel = functools.partial(
        _softmax_fwd_kernel if mask is not None else _softmax_fwd_nomask_kernel,
        causal=causal,
        block_rows=br,
    )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, br, t), lambda i, j, q: (i, j, q, 0)),
        out_shape=jax.ShapeDtypeStruct(inp.shape, inp.dtype),
        interpret=use_interpret_mode(),
    )(*args)


def _softmax_fwd_nomask_kernel(x_ref, out_ref, *, causal: bool, block_rows: int):
    _softmax_fwd_kernel(x_ref, None, out_ref, causal=causal, block_rows=block_rows)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def attn_softmax_pallas(inp: Array, mask: Optional[Array] = None,
                        causal: bool = False) -> Array:
    """The hand-written Pallas fused softmax (fw/bw kernels above)."""
    return _fwd_impl(inp, mask, causal)


def attn_softmax(inp: Array, mask: Optional[Array] = None,
                 causal: bool = False, impl: str = "auto") -> Array:
    """Fused masked softmax over the last dim of ``(B, H, F, T)`` scores.

    ``mask`` is an *additive* mask broadcastable as (B|1, H|1, F|1, T);
    ``causal=True`` additionally applies the triangular future mask in-kernel.
    Matches reference ``Attn_Softmax`` (tensor_functions.py:435-451) semantics
    with its in-place/saved-tensor defect fixed.

    ``impl="auto"`` uses the XLA op-graph path: measured on v5e, XLA's own
    softmax fusion matches the Pallas kernel at aligned shapes and beats it
    at unaligned ones (SURVEY.md §7: this kernel tier "becomes XLA" — the
    reference needed a hand kernel only because its baseline was per-op CUDA
    launches, softmax_kernel.cu:232-292).  ``impl="pallas"`` selects the
    hand-written kernel, which also lifts the reference's to_len<=1024 cap.
    """
    if impl == "pallas":
        return attn_softmax_pallas(inp, mask, causal)
    return attn_softmax_reference(inp, mask, causal)


def _attn_softmax_vjp_fwd(inp, mask, causal):
    out = _fwd_impl(inp, mask, causal)
    return out, (out,)


def _attn_softmax_vjp_bwd(causal, res, dout):
    (out,) = res
    b, h, f, t = out.shape
    br = _row_block(f)
    grid = (b, h, cdiv(f, br))
    spec = pl.BlockSpec((1, 1, br, t), lambda i, j, q: (i, j, q, 0))
    dinp = pl.pallas_call(
        _softmax_bwd_kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(out.shape, out.dtype),
        interpret=use_interpret_mode(),
    )(out, dout)
    return dinp, None


attn_softmax_pallas.defvjp(_attn_softmax_vjp_fwd, _attn_softmax_vjp_bwd)


def attn_softmax_reference(inp: Array, mask: Optional[Array] = None, causal: bool = False) -> Array:
    """Pure-jnp oracle for tests (the reference's op-graph baseline,
    kernel_tests/test_softmax_fw.py:60-72)."""
    x = inp
    if mask is not None:
        x = x + mask
    if causal:
        f, t = x.shape[-2:]
        rows = jnp.arange(f)[:, None]
        cols = jnp.arange(t)[None, :]
        x = jnp.where(cols <= rows, x, DEFAULT_MASK_VALUE)
    return jax.nn.softmax(x, axis=-1)

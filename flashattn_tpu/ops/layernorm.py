"""Fused LayerNorm forward/backward as Pallas TPU kernels.

TPU-native re-design of the reference's lightseq-derived CUDA layernorm
(``src/layernorm_kernel.cu``: fw ``ker_layer_norm:36-98``, bw
``ker_ln_bw_dgamma_dbetta:192-259`` + ``ker_ln_bw_dinp:291-368``).

Design translation, not a port:

* The CUDA fw assigns one thread block per row with float4 vectorised loads
  and a two-stage (sum, sum-of-squares) block reduce.  Here one grid step
  normalises a *block of rows* at once -- the VPU reduces across the 128-lane
  axis natively, so there is no hand-written reduction tree.
* The CUDA bw runs two kernels on two streams (dgamma/dbeta via a 32x32
  shared-memory transpose; dinp via float4 + blockReduce).  Here a single
  backward kernel walks row-blocks sequentially and accumulates dgamma/dbeta
  in a revisited VMEM output block -- the Pallas equivalent of the
  cross-row-block reduction.
* Residuals saved for backward are (mean, rstd) per row -- smaller than the
  reference's (inp, gamma, beta, var, means) save set
  (tensor_functions.py:459).
* The reference's launch constraints (hidden %4 == 0, hidden <= 4096,
  layernorm_kernel.cu:105,411) disappear; any hidden dim that fits a VMEM
  row-block works.

The public entry :func:`layernorm` is differentiable via ``jax.custom_vjp``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._utils import cdiv, ragged_row_block, use_interpret_mode

Array = jax.Array


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _ln_fwd_kernel(x_ref, gamma_ref, beta_ref, y_ref, mean_ref, rstd_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    centered = x - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = centered * rstd * gamma_ref[...].astype(jnp.float32) + beta_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)
    mean_ref[...] = mean
    rstd_ref[...] = rstd


def _ln_fwd(x: Array, gamma: Array, beta: Array, eps: float, block_rows: int):
    n, h = x.shape
    grid = (cdiv(n, block_rows),)
    y, mean, rstd = pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, h), lambda i: (i, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, h), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h), x.dtype),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        interpret=use_interpret_mode(),
    )(x, gamma.reshape(1, h), beta.reshape(1, h))
    return y, mean, rstd


# ---------------------------------------------------------------------------
# Backward
#
#   xhat = (x - mean) * rstd
#   dg   = sum_rows(dy * xhat)        db = sum_rows(dy)
#   dx   = rstd * (dyg - mean_h(dyg) - xhat * mean_h(dyg * xhat)),
#          where dyg = dy * gamma and mean_h is the mean over the hidden dim.
# (same math as ker_ln_bw_dinp, layernorm_kernel.cu:291-368)
# ---------------------------------------------------------------------------


def _ln_bwd_kernel(x_ref, dy_ref, mean_ref, rstd_ref, gamma_ref,
                   dx_ref, dg_ref, db_ref, *, n_rows: int, block_rows: int):
    i = pl.program_id(0)

    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    mean = mean_ref[...]
    rstd = rstd_ref[...]
    gamma = gamma_ref[...].astype(jnp.float32)

    xhat = (x - mean) * rstd

    # dgamma / dbeta accumulate across row blocks into a revisited block.
    @pl.when(i == 0)
    def _():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    # The last block may be ragged: rows past n_rows hold garbage (possibly
    # NaN via rstd) and must not leak into the cross-row reductions.
    if n_rows % block_rows:
        rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + i * block_rows
        valid = rows < n_rows
        dg_ref[...] += jnp.sum(jnp.where(valid, dy * xhat, 0.0),
                               axis=0, keepdims=True)
        db_ref[...] += jnp.sum(jnp.where(valid, dy, 0.0),
                               axis=0, keepdims=True)
    else:
        dg_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
        db_ref[...] += jnp.sum(dy, axis=0, keepdims=True)

    dyg = dy * gamma
    h = x.shape[-1]
    m1 = jnp.sum(dyg, axis=-1, keepdims=True) / h
    m2 = jnp.sum(dyg * xhat, axis=-1, keepdims=True) / h
    dx = rstd * (dyg - m1 - xhat * m2)
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _ln_bwd(x, dy, mean, rstd, gamma, block_rows: int):
    n, h = x.shape
    grid = (cdiv(n, block_rows),)
    dx, dg, db = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, n_rows=n, block_rows=block_rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, h), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, h), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, h), lambda i: (i, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h), x.dtype),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
        ],
        interpret=use_interpret_mode(),
    )(x, dy, mean, rstd, gamma.reshape(1, h))
    return dx, dg.reshape(h), db.reshape(h)


# ---------------------------------------------------------------------------
# Public differentiable entry point
# ---------------------------------------------------------------------------

_DEFAULT_BLOCK_ROWS = 256


def _pick_block_rows(n: int) -> int:
    # Ragged last block allowed; bwd masks the tail rows out of the
    # dgamma/dbeta reductions.
    return ragged_row_block(n, _DEFAULT_BLOCK_ROWS)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layernorm(x: Array, gamma: Array, beta: Array, eps: float = 1e-5) -> Array:
    """Fused layer normalisation over the last dim of ``x`` (any leading dims).

    Differentiable; forward saves (mean, rstd) residuals like the reference
    fused kernel (tensor_functions.py:454-469 semantics, TPU layout).
    """
    y, _, _ = _layernorm_fwd_impl(x, gamma, beta, eps)
    return y


def _layernorm_fwd_impl(x, gamma, beta, eps):
    shape = x.shape
    h = shape[-1]
    x2 = x.reshape(-1, h)
    n = x2.shape[0]
    block = _pick_block_rows(n)
    y2, mean, rstd = _ln_fwd(x2, gamma, beta, eps, block)
    return y2.reshape(shape), mean, rstd


def _layernorm_vjp_fwd(x, gamma, beta, eps):
    y, mean, rstd = _layernorm_fwd_impl(x, gamma, beta, eps)
    return y, (x, gamma, mean, rstd)


def _layernorm_vjp_bwd(eps, res, dy):
    x, gamma, mean, rstd = res
    shape = x.shape
    h = shape[-1]
    x2 = x.reshape(-1, h)
    dy2 = dy.reshape(-1, h)
    block = _pick_block_rows(x2.shape[0])
    dx2, dg, db = _ln_bwd(x2, dy2, mean, rstd, gamma, block)
    return dx2.reshape(shape), dg.astype(gamma.dtype), db.astype(gamma.dtype)


layernorm.defvjp(_layernorm_vjp_fwd, _layernorm_vjp_bwd)


def layernorm_reference(x: Array, gamma: Array, beta: Array, eps: float = 1e-5) -> Array:
    """Pure-jnp oracle used by tests (the role torch plays in the reference)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta

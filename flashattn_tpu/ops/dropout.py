"""Fused dropout(+bias, +residual, +activation) Pallas kernels.

TPU re-design of the reference's LightSeq dropout launcher surface
(``launch_ls_dropout_res_bias`` / ``launch_ls_dropout_act_bias``,
src/includes/kernels.h:113-175 — declared-only there): ONE elementwise HBM
pass computing bias add, in-kernel PRNG mask, inverted-dropout rescale and
residual add.  The op-graph composition leaves the threefry mask as a
separate full-array pass, which Pallas PRNG removes — measured 2.6-9.3x
(kernel_bench/battery_logs/fused_dropout.log).

Backward saves NO mask: the keep mask is REGENERATED in the backward kernel
from the same (seed, grid position), so the vjp costs zero residual HBM
traffic (the reference stores the mask tensor instead, kernels.h:128-137).
Dropout's adjoint is itself a masked rescale, so the forward mask kernel
doubles as the backward for the plain variant.

CPU / interpret mode falls back to the exact op-graph semantics
(``jax.random.bernoulli`` over the caller's key), keeping the test suite's
masks bit-identical to the pre-fused implementation; the Pallas path is
chip-only (``pltpu.prng_seed`` has no CPU lowering), like
``quant.quantize_int8_stochastic``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.dtypes import float0
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._utils import cdiv, use_interpret_mode

Array = jax.Array

_GELU_C = math.sqrt(2.0 / math.pi)


def _seed_from_key(key: jax.Array) -> jax.Array:
    """(1,) int32 seed from a jax PRNG key (typed or raw uint32 pair)."""
    data = jax.random.key_data(key).ravel()
    return jax.lax.bitcast_convert_type(data[-1:], jnp.int32)


def _eligible(x2d, d) -> bool:
    return (d % 128 == 0 and x2d.dtype in (jnp.float32, jnp.bfloat16)
            and x2d.shape[0] >= 8 and not use_interpret_mode()
            and jax.default_backend() == "tpu")


def _pick_block(n, d, itemsize):
    """Rows per grid step: stage up to 5 (block, d) tiles + the random bits
    inside the default 16MB scoped-vmem budget.

    ONE formula for every kernel in this file: the backward regenerates the
    forward's mask from (seed, program_id, block shape), so forward and
    backward MUST land on the same block for the same (n, d, dtype)."""
    block = 512
    while block > 8 and block * d * (5 * itemsize + 4) > 12 * 2**20:
        block //= 2
    return block


def _keep(shape, rate):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thresh = jnp.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    return bits >= thresh


# -- kernels -----------------------------------------------------------------


def _mask_scale_kernel(seed_ref, x_ref, o_ref, *, rate):
    """out = keep(x) / (1-rate) — dropout forward AND its own adjoint."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    keep = _keep(x_ref.shape, rate)
    y = jnp.where(keep, x_ref[...], jnp.zeros_like(x_ref)) / (1.0 - rate)
    o_ref[...] = y.astype(o_ref.dtype)


def _res_bias_kernel(seed_ref, x_ref, b_ref, r_ref, o_ref, *, rate):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    y = x_ref[...] + b_ref[...]
    keep = _keep(y.shape, rate)
    y = jnp.where(keep, y, jnp.zeros_like(y)) / (1.0 - rate)
    o_ref[...] = (r_ref[...] + y).astype(o_ref.dtype)


def _act_bias_kernel(seed_ref, x_ref, b_ref, o_ref, *, rate, act):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    u = (x_ref[...] + b_ref[...]).astype(jnp.float32)
    if act == "gelu":
        y = 0.5 * u * (1.0 + jnp.tanh(_GELU_C * (u + 0.044715 * u**3)))
    else:
        y = jnp.maximum(u, 0.0)
    keep = _keep(y.shape, rate)
    y = jnp.where(keep, y, jnp.zeros_like(y)) / (1.0 - rate)
    o_ref[...] = y.astype(o_ref.dtype)


def _mask_colsum_kernel(seed_ref, g_ref, dx_ref, db_ref, acc, *,
                        rate, n, block):
    """dx = keep(g)/(1-rate); db = column sum of dx accumulated across the
    grid (the (1, d) db block is revisited every step — running-accumulation
    store, same pattern as the subrow backward's dk/dv)."""
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i)
    keep = _keep(g_ref.shape, rate)
    dx = jnp.where(keep, g_ref[...].astype(jnp.float32),
                   0.0) / (1.0 - rate)
    dx_ref[...] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    # ragged tail: rows past n are garbage reads — zero them out of the sum
    row = jax.lax.broadcasted_iota(jnp.int32, dx.shape, 0) + i * block
    acc[...] += jnp.sum(jnp.where(row < n, dx, 0.0), axis=0, keepdims=True)
    db_ref[...] = acc[...]


def _act_bias_bwd_kernel(seed_ref, g_ref, x_ref, b_ref, dx_ref, db_ref, acc,
                         *, rate, act, n, block):
    """dx = keep(g)/(1-rate) * act'(x+b); db = column sum of dx."""
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i)
    keep = _keep(g_ref.shape, rate)
    dy = jnp.where(keep, g_ref[...].astype(jnp.float32),
                   0.0) / (1.0 - rate)
    u = (x_ref[...] + b_ref[...]).astype(jnp.float32)
    if act == "gelu":
        inner = _GELU_C * (u + 0.044715 * u**3)
        t = jnp.tanh(inner)
        dact = 0.5 * (1.0 + t) + 0.5 * u * (1.0 - t * t) * _GELU_C * (
            1.0 + 3 * 0.044715 * u * u)
    else:
        dact = (u > 0.0).astype(jnp.float32)
    dx = dy * dact
    dx_ref[...] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    row = jax.lax.broadcasted_iota(jnp.int32, dx.shape, 0) + i * block
    acc[...] += jnp.sum(jnp.where(row < n, dx, 0.0), axis=0, keepdims=True)
    db_ref[...] = acc[...]


# -- pallas_call wrappers ----------------------------------------------------


def _grid_call(kernel, seed, n, d, dtype, inputs, in_rowblocks,
               accumulate=False):
    """Common 1-D row-block pallas_call: inputs listed with True for
    (block, d) row-blocked specs, False for (1, d) broadcast rows."""
    block = _pick_block(n, d, jnp.dtype(dtype).itemsize)
    in_specs = [
        pl.BlockSpec((block, d), lambda i, s: (i, 0)) if rb else
        pl.BlockSpec((1, d), lambda i, s: (0, 0))
        for rb in in_rowblocks
    ]
    out_specs = [pl.BlockSpec((block, d), lambda i, s: (i, 0))]
    out_shape = [jax.ShapeDtypeStruct((n, d), dtype)]
    scratch = []
    if accumulate:
        out_specs.append(pl.BlockSpec((1, d), lambda i, s: (0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((1, d), jnp.float32))
        scratch.append(pltpu.VMEM((1, d), jnp.float32))
    sem = ("arbitrary",) if accumulate else ("parallel",)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cdiv(n, block),),
            in_specs=in_specs,
            out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
            scratch_shapes=scratch,
        ),
        out_shape=out_shape if len(out_shape) > 1 else out_shape[0],
        compiler_params=pltpu.CompilerParams(dimension_semantics=sem),
    )(seed, *inputs), block


def _mask_scale(x2d, rate, seed):
    n, d = x2d.shape
    out, _ = _grid_call(
        functools.partial(_mask_scale_kernel, rate=rate),
        seed, n, d, x2d.dtype, [x2d], [True])
    return out


# -- custom-vjp primitives (TPU path; seed is an int32 arg with a float0
# cotangent) ----------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dropout_p(x2d, seed, rate):
    return _mask_scale(x2d, rate, seed)


def _dropout_p_fwd(x2d, seed, rate):
    return _mask_scale(x2d, rate, seed), seed


def _dropout_p_bwd(rate, seed, g):
    # dropout's adjoint IS the same masked rescale
    return _mask_scale(g, rate, seed), np.zeros((1,), dtype=float0)


_dropout_p.defvjp(_dropout_p_fwd, _dropout_p_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _res_bias_p(x2d, b, r2d, seed, rate):
    n, d = x2d.shape
    out, _ = _grid_call(
        functools.partial(_res_bias_kernel, rate=rate),
        seed, n, d, x2d.dtype, [x2d, b, r2d], [True, False, True])
    return out


def _res_bias_p_fwd(x2d, b, r2d, seed, rate):
    return _res_bias_p(x2d, b, r2d, seed, rate), seed


def _res_bias_p_bwd(rate, seed, g):
    n, d = g.shape
    block = _pick_block(n, d, g.dtype.itemsize)
    (dx, db), _ = _grid_call(
        functools.partial(_mask_colsum_kernel, rate=rate, n=n, block=block),
        seed, n, d, g.dtype, [g], [True], accumulate=True)
    # db keeps the (1, d) primal-arg shape
    return dx, db.astype(g.dtype), g, np.zeros((1,), dtype=float0)


_res_bias_p.defvjp(_res_bias_p_fwd, _res_bias_p_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _act_bias_p(x2d, b, seed, rate, act):
    n, d = x2d.shape
    out, _ = _grid_call(
        functools.partial(_act_bias_kernel, rate=rate, act=act),
        seed, n, d, x2d.dtype, [x2d, b], [True, False])
    return out


def _act_bias_p_fwd(x2d, b, seed, rate, act):
    return _act_bias_p(x2d, b, seed, rate, act), (x2d, b, seed)


def _act_bias_p_bwd(rate, act, res, g):
    x2d, b, seed = res
    n, d = g.shape
    block = _pick_block(n, d, g.dtype.itemsize)
    (dx, db), _ = _grid_call(
        functools.partial(_act_bias_bwd_kernel, rate=rate, act=act,
                          n=n, block=block),
        seed, n, d, g.dtype, [g, x2d, b], [True, True, False],
        accumulate=True)
    return dx, db.astype(g.dtype), np.zeros((1,), dtype=float0)


_act_bias_p.defvjp(_act_bias_p_fwd, _act_bias_p_bwd)


# -- public ops --------------------------------------------------------------


def fused_dropout(x: Array, rate: float, key: jax.Array | None) -> Array:
    """Inverted dropout; Pallas-PRNG fused on chip, op-graph elsewhere.

    The fallback reproduces ``nn.functional.dropout(scale=True)`` exactly
    (same bernoulli mask from the same key), so CPU behaviour is unchanged;
    on TPU the mask comes from the in-kernel PRNG seeded from ``key``.
    """
    if rate <= 0.0 or key is None:
        return x
    d = x.shape[-1]
    x2d = x.reshape(-1, d)
    if not _eligible(x2d, d):
        keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
        return jnp.where(keep, x, jnp.zeros_like(x)) / (1.0 - rate)
    return _dropout_p(x2d, _seed_from_key(key), rate).reshape(x.shape)


def fused_dropout_res_bias(x: Array, bias: Array, residual: Array,
                           rate: float, key: jax.Array | None) -> Array:
    """residual + dropout(x + bias) in one HBM pass (kernels.h:118-122)."""
    d = x.shape[-1]
    x2d = x.reshape(-1, d)
    if rate <= 0.0 or key is None or not _eligible(x2d, d):
        y = x + bias
        if rate > 0.0 and key is not None:
            keep = jax.random.bernoulli(key, 1.0 - rate, y.shape)
            y = jnp.where(keep, y, jnp.zeros_like(y)) / (1.0 - rate)
        return residual + y
    out = _res_bias_p(x2d, bias.reshape(1, d), residual.reshape(-1, d),
                      _seed_from_key(key), rate)
    return out.reshape(x.shape)


def fused_dropout_act_bias(x: Array, bias: Array, rate: float,
                           key: jax.Array | None, act: str = "gelu") -> Array:
    """dropout(act(x + bias)) in one HBM pass (kernels.h:123-126)."""
    if act not in ("gelu", "relu"):
        raise ValueError(f"act must be 'gelu' or 'relu', got {act!r}")
    d = x.shape[-1]
    x2d = x.reshape(-1, d)
    if not _eligible(x2d, d):
        u = x + bias
        if act == "gelu":
            y = 0.5 * u * (1.0 + jnp.tanh(_GELU_C * (u + 0.044715 * u**3)))
        else:
            y = jnp.maximum(u, 0.0)
        if rate > 0.0 and key is not None:
            keep = jax.random.bernoulli(key, 1.0 - rate, y.shape)
            y = jnp.where(keep, y, jnp.zeros_like(y)) / (1.0 - rate)
        return y
    if rate <= 0.0 or key is None:
        u = x + bias
        if act == "gelu":
            return 0.5 * u * (1.0 + jnp.tanh(_GELU_C * (u + 0.044715 * u**3)))
        return jnp.maximum(u, 0.0)
    out = _act_bias_p(x2d, bias.reshape(1, d), _seed_from_key(key), rate, act)
    return out.reshape(x.shape)

"""Paged attention: single-token decode over a paged KV-cache.

Serving-path component with no reference equivalent (the reference's
generation re-runs the full model per token, run_machine_translation.py:
300-323); this is the TPU-native design from the guide (§8-13): the KV cache
lives in non-contiguous fixed-size pages in HBM, each sequence owns a
``page_indices`` row, and the kernel walks a sequence's pages with the
online-softmax loop.

Page gathering uses ``PrefetchScalarGridSpec``: the page table is a
scalar-prefetch argument, so the K/V BlockSpec index maps *themselves* look
up the physical page for each grid step -- Pallas's pipeline DMAs the right
page while the previous one computes (double buffering for free).

Supports GQA (query-head groups per KV head) and int8-quantised pages
(payload + per-token scales), halving page-load bandwidth.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._utils import use_interpret_mode

Array = jax.Array


def _paged_kernel(pages_ref, lengths_ref,  # scalar prefetch
                  q_ref, k_ref, v_ref, ks_ref, vs_ref,
                  o_ref, m_scr, l_scr, acc_scr,
                  *, page_size: int, quantized: bool):
    b = pl.program_id(0)
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    length = lengths_ref[b]

    @pl.when(i * page_size < length)
    def _compute():
        q = q_ref[0, 0]                               # (group, d)
        k = k_ref[0, 0]                               # (page, d)
        if quantized:
            ks = ks_ref[0, 0]                         # (page, 1)
        s = jax.lax.dot_general(
            q, k.astype(q.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                             # (group, page)
        if quantized:
            s = s * ks.reshape(1, -1)

        pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * page_size
        s = jnp.where(pos < length, s, -1e30)

        m_prev, l_prev = m_scr[...], l_scr[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = l_next

        v = v_ref[0, 0]                               # (page, d)
        if quantized:
            p = p * vs_ref[0, 0].reshape(1, -1)
        pv = jax.lax.dot(p.astype(q.dtype), v.astype(q.dtype),
                         preferred_element_type=jnp.float32)
        acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(i == pl.num_programs(2) - 1)
    def _finalize():
        l = l_scr[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


def paged_attention(
    q: Array,                      # (B, n_q_heads, d)
    k_pages: Array,                # (n_kv_heads, n_pages, page_size, d)
    v_pages: Array,
    lengths: Array,                # (B,) int32 valid tokens per sequence
    page_indices: Array,           # (B, pages_per_seq) int32 page table
    *,
    k_scales: Optional[Array] = None,   # (n_kv_heads, n_pages, page_size, 1)
    v_scales: Optional[Array] = None,
    sm_scale: Optional[float] = None,
) -> Array:
    """Decode-time attention of one query token per sequence against its
    paged KV history.  Returns (B, n_q_heads, d)."""
    b, n_q_heads, d = q.shape
    n_kv_heads, n_pages, page_size, _ = k_pages.shape
    assert n_q_heads % n_kv_heads == 0
    group = n_q_heads // n_kv_heads
    pages_per_seq = page_indices.shape[1]
    scale = sm_scale if sm_scale is not None else 1.0 / (d**0.5)
    quantized = k_scales is not None

    # (B, Hq, d) -> (B, Hkv, group, d), prescaled.
    qg = (q * jnp.asarray(scale, q.dtype)).reshape(b, n_kv_heads, group, d)

    def q_map(b_, h_, i_, pages, lens):
        return (b_, h_, 0, 0)

    def kv_map(b_, h_, i_, pages, lens):
        return (h_, pages[b_, i_], 0, 0)

    def o_map(b_, h_, i_, pages, lens):
        return (b_, h_, 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, group, d), q_map),
        pl.BlockSpec((1, 1, page_size, d), kv_map),
        pl.BlockSpec((1, 1, page_size, d), kv_map),
    ]
    args = [qg, k_pages, v_pages]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, 1, page_size, 1), kv_map),
            pl.BlockSpec((1, 1, page_size, 1), kv_map),
        ]
        args += [k_scales, v_scales]

        kernel = functools.partial(
            _paged_kernel, page_size=page_size, quantized=True,
        )
    else:
        def kernel(pages_ref, lengths_ref, q_ref, k_ref, v_ref,
                   o_ref, m_scr, l_scr, acc_scr):
            return _paged_kernel(pages_ref, lengths_ref, q_ref, k_ref, v_ref,
                                 None, None, o_ref, m_scr, l_scr, acc_scr,
                                 page_size=page_size, quantized=False)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_kv_heads, pages_per_seq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, group, d), o_map),
        scratch_shapes=[
            pltpu.VMEM((group, 1), jnp.float32),
            pltpu.VMEM((group, 1), jnp.float32),
            pltpu.VMEM((group, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_kv_heads, group, d), q.dtype),
        interpret=use_interpret_mode(),
    )(page_indices.astype(jnp.int32), lengths.astype(jnp.int32), *args)
    return out.reshape(b, n_q_heads, d)


def paged_attention_reference(q, k_pages, v_pages, lengths, page_indices,
                              k_scales=None, v_scales=None, sm_scale=None):
    """jnp oracle: gather pages densely, mask by length, full softmax."""
    b, n_q_heads, d = q.shape
    n_kv_heads, _, page_size, _ = k_pages.shape
    group = n_q_heads // n_kv_heads
    scale = sm_scale if sm_scale is not None else 1.0 / (d**0.5)
    if k_scales is not None:
        k_pages = k_pages.astype(jnp.float32) * k_scales
        v_pages = v_pages.astype(jnp.float32) * v_scales
    # (B, Hkv, pages*page, d)
    k_seq = k_pages[:, page_indices].transpose(1, 0, 2, 3, 4)
    k_seq = k_seq.reshape(b, n_kv_heads, -1, d)
    v_seq = v_pages[:, page_indices].transpose(1, 0, 2, 3, 4)
    v_seq = v_seq.reshape(b, n_kv_heads, -1, d)
    qg = q.reshape(b, n_kv_heads, group, d).astype(jnp.float32)
    s = jnp.einsum("bhgd,bhkd->bhgk", qg, k_seq.astype(jnp.float32)) * scale
    pos = jnp.arange(s.shape[-1])[None, None, None]
    s = jnp.where(pos < lengths[:, None, None, None], s, -1e30)
    w = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgk,bhkd->bhgd", w, v_seq.astype(jnp.float32))
    return o.reshape(b, n_q_heads, d).astype(q.dtype)

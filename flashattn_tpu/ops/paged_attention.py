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
                  *, page_size: int, quantized: bool,
                  window: Optional[int] = None, chunk: int = 1):
    """One grid step = one physical page x ALL kv heads.

    Head-blocking matters: with grid (b, h, pages) each step DMAs one 32KB
    page and does a (group, d)x(d, page) dot -- the per-step pipeline
    overhead dominates and decode runs at ~13% of HBM bandwidth.  Folding the
    head axis into the block (grid (b, pages), k block (H, page, d)) makes
    every DMA H x bigger and every dot an H-batched MXU call.

    ``chunk`` > 1 = multi-token decode (speculative verification / chunked
    prefill-extend): q carries ``group * chunk`` rows per kv head, ordered
    (group, chunk); row j of a group sits at absolute position
    ``lengths[b] - chunk + j`` and attends positions <= its own (causal
    within the chunk).  ``lengths`` counts valid tokens INCLUDING the chunk
    (whose K/V must already be scattered into the pages) — the same
    convention the single-token callers use.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    length = lengths_ref[b]             # last row's exclusive KV bound
    base = length - chunk               # tokens before the chunk

    run = i * page_size < length
    if window is not None:
        # earliest row (j=0) attends positions >= base + 1 - window
        run &= (i + 1) * page_size > base + 1 - window

    @pl.when(run)
    def _compute():
        q = q_ref[0]                                  # (H, group*chunk, d)
        k = k_ref[:, 0]                               # (H, page, d)
        s = jax.lax.dot_general(
            q, k.astype(q.dtype), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                             # (H, group*chunk, page)
        if quantized:
            ks = ks_ref[:, 0]                         # (H, page, 1)
            s = s * ks.reshape(ks.shape[0], 1, -1)

        pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) + i * page_size
        # per-row causal bound: row (g, j) attends pos < base + j + 1
        j = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) % chunk
        keep = pos < base + j + 1
        if window is not None:
            keep &= pos >= base + j + 1 - window
        s = jnp.where(keep, s, -1e30)

        m_prev, l_prev = m_scr[...], l_scr[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = l_next

        v = v_ref[:, 0]                               # (H, page, d)
        if quantized:
            vs = vs_ref[:, 0]                         # (H, page, 1)
            p = p * vs.reshape(vs.shape[0], 1, -1)
        pv = jax.lax.dot_general(
            p.astype(q.dtype), v.astype(q.dtype),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                             # (H, group, d)
        acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(i == pl.num_programs(1) - 1)
    def _finalize():
        l = l_scr[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


def _paged_dma_body(pages_ref, lengths_ref, q_ref, k_hbm, v_hbm,
                    ks_hbm, vs_hbm, o_ref, kbuf, vbuf, ksbuf, vsbuf, sems,
                    *, page_size: int, pages_per_seq: int,
                    window: Optional[int] = None, chunk: int = 1):
    """Manual double-buffered page walk (guide: Patterns/Double Buffering).

    One grid step = one sequence; pages stream HBM -> VMEM with two buffers,
    the next page's DMA in flight while the current page computes.  The page
    loop has a DYNAMIC trip count (cdiv(length, page_size)), so short
    sequences in a continuous batch pay only for the pages they have --
    the pallas-grid version must visit every slot.  A sliding ``window``
    starts the walk at the first page overlapping [length - window, length),
    so long histories pay only O(window) page loads.

    Quantized (int8/fp8) pools stream their per-token scales alongside the
    payload pages — scales arrive as (H, n_pages, page) so the DMA slice's
    minor dim stays lane-aligned — and this path runs at payload bandwidth
    (half the bytes of bf16), instead of falling back to the every-slot
    grid walk.
    """
    quantized = ks_hbm is not None
    b = pl.program_id(0)
    length = lengths_ref[b]             # incl. the chunk (see _paged_kernel)
    base = length - chunk
    # clamp the walk to the table row: a chunked prefill wave's padding can
    # push length past capacity (its writes were clamped; only padding rows
    # reference those positions, and their outputs are ignored) — without
    # this, pages_ref[b, i] reads past the row on-chip
    n = jnp.minimum((length + page_size - 1) // page_size, pages_per_seq)
    p0 = jnp.int32(0)
    if window is not None:
        # earliest chunk row (j=0) attends positions >= base + 1 - window
        p0 = jnp.maximum(base + 1 - window, 0) // page_size
    q = q_ref[0]                                      # (H, group*chunk, d)
    h, group, dd = q.shape

    streams = [(kbuf, k_hbm), (vbuf, v_hbm)]
    if quantized:
        streams += [(ksbuf, ks_hbm), (vsbuf, vs_hbm)]

    def dma(buf, hbm, i, slot, kind):
        return pltpu.make_async_copy(
            hbm.at[:, pages_ref[b, i]], buf.at[slot], sems.at[slot, kind])

    @pl.when(n > p0)
    def _warmup():
        s0 = jax.lax.rem(p0, 2)
        for kind, (buf, hbm) in enumerate(streams):
            dma(buf, hbm, p0, s0, kind).start()

    def body(i, carry):
        m_prev, l_prev, acc = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n)
        def _prefetch():
            nxt = 1 - slot
            for kind, (buf, hbm) in enumerate(streams):
                dma(buf, hbm, i + 1, nxt, kind).start()

        for kind, (buf, hbm) in enumerate(streams):
            dma(buf, hbm, i, slot, kind).wait()

        k = kbuf[slot]                                # (H, page, d)
        v = vbuf[slot]
        s = jax.lax.dot_general(
            q, k.astype(q.dtype), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                             # (H, group, page)
        if quantized:
            # per-token K scale: rank-1 column rescale after the dot
            s = s * ksbuf[slot].reshape(h, 1, page_size)
        pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) + i * page_size
        j = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) % chunk
        keep = pos < base + j + 1
        if window is not None:
            keep &= pos >= base + j + 1 - window
        s = jnp.where(keep, s, -1e30)

        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        if quantized:
            # fold the V scale into p -- (H, group, page) is the smaller
            # operand at decode shapes (group*chunk rows vs d columns)
            p = p * vsbuf[slot].reshape(h, 1, page_size)
        pv = jax.lax.dot_general(
            p.astype(q.dtype), v.astype(q.dtype), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return m_next, l_next, acc * alpha + pv

    m0 = jnp.full((h, group, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((h, group, 1), jnp.float32)
    acc0 = jnp.zeros((h, group, dd), jnp.float32)
    _, l, acc = jax.lax.fori_loop(p0, n, body, (m0, l0, acc0))
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0] = (acc * l_inv).astype(o_ref.dtype)


def _paged_dma_kernel(pages_ref, lengths_ref, q_ref, k_hbm, v_hbm, o_ref,
                      kbuf, vbuf, sems, **kw):
    return _paged_dma_body(pages_ref, lengths_ref, q_ref, k_hbm, v_hbm,
                           None, None, o_ref, kbuf, vbuf, None, None, sems,
                           **kw)


def _paged_attention_pipelined(qg, k_pages, v_pages, lengths, page_indices,
                               window=None, chunk=1, k_scales=None,
                               v_scales=None):
    b, n_kv_heads, group, d = qg.shape   # group already folds the chunk
    _, _, page_size, _ = k_pages.shape
    pages_per_seq = page_indices.shape[1]
    quantized = k_scales is not None

    in_specs = [
        pl.BlockSpec((1, n_kv_heads, group, d),
                     lambda b_, pages, lens: (b_, 0, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch = [
        pltpu.VMEM((2, n_kv_heads, page_size, d), k_pages.dtype),
        pltpu.VMEM((2, n_kv_heads, page_size, d), v_pages.dtype),
    ]
    args = [qg, k_pages, v_pages]
    if quantized:
        # (H, n_pages, page, 1) -> (H, n_pages, page): the per-page DMA
        # slice then has a lane-aligned minor dim (page_size), which a
        # trailing 1 would not
        args += [k_scales.reshape(n_kv_heads, -1, page_size),
                 v_scales.reshape(n_kv_heads, -1, page_size)]
        in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 2
        scratch += [pltpu.VMEM((2, n_kv_heads, page_size), jnp.float32)] * 2
        kernel = _paged_dma_body
    else:
        kernel = _paged_dma_kernel
    scratch.append(pltpu.SemaphoreType.DMA((2, 4 if quantized else 2)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n_kv_heads, group, d),
                               lambda b_, pages, lens: (b_, 0, 0, 0)),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        functools.partial(kernel, page_size=page_size,
                          pages_per_seq=pages_per_seq, window=window,
                          chunk=chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_kv_heads, group, d), qg.dtype),
        interpret=use_interpret_mode(),
    )(page_indices.astype(jnp.int32), lengths.astype(jnp.int32), *args)
    return out


def paged_attention(
    q: Array,                      # (B, n_q_heads, d) or (B, chunk, n_q_heads, d)
    k_pages: Array,                # (n_kv_heads, n_pages, page_size, d)
    v_pages: Array,
    lengths: Array,                # (B,) int32 valid tokens per sequence
    page_indices: Array,           # (B, pages_per_seq) int32 page table
    *,
    k_scales: Optional[Array] = None,   # (n_kv_heads, n_pages, page_size, 1)
    v_scales: Optional[Array] = None,
    sm_scale: Optional[float] = None,
    pipelined: bool = True,
    window: Optional[int] = None,
) -> Array:
    """Decode-time attention of one query token (or a ``chunk`` of tokens)
    per sequence against its paged KV history.  Returns (B, n_q_heads, d)
    (or (B, chunk, n_q_heads, d) for a 4-d q).

    A chunked q enables multi-token decode — speculative-decoding
    verification and chunked prefill-extend: chunk row j sits at absolute
    position ``lengths - chunk + j`` and attends causally within the chunk;
    ``lengths`` counts valid tokens INCLUDING the chunk, whose K/V must
    already be scattered into the pages.

    ``pipelined=True`` (bf16 pages only) uses the manual double-buffered DMA
    walk with a dynamic page-count loop; otherwise a pallas-grid schedule
    visiting every page slot (also the quantized-page path).  ``window``
    restricts attention to the last ``window`` positions (sliding-window
    decode): the pipelined walk STARTS at the first in-window page and the
    grid path skips out-of-window pages, so page loads are O(window)."""
    chunked_in = q.ndim == 4
    if not chunked_in:
        q = q[:, None]                          # (B, 1, Hq, d)
    b, chunk, n_q_heads, d = q.shape
    n_kv_heads, n_pages, page_size, _ = k_pages.shape
    assert n_q_heads % n_kv_heads == 0
    group = n_q_heads // n_kv_heads
    pages_per_seq = page_indices.shape[1]
    scale = sm_scale if sm_scale is not None else 1.0 / (d**0.5)
    quantized = k_scales is not None

    # (B, chunk, Hq, d) -> (B, Hkv, group*chunk, d) with rows ordered
    # (group, chunk) — the kernels recover j = row % chunk; prescaled with
    # log2(e) folded in so the online softmax runs in exp2 (VPU-native).
    qg = (q * jnp.asarray(scale * 1.4426950408889634, q.dtype))
    qg = qg.reshape(b, chunk, n_kv_heads, group, d)
    qg = qg.transpose(0, 2, 3, 1, 4).reshape(b, n_kv_heads, group * chunk, d)

    def unfold(out):                            # (B, Hkv, group*chunk, d)
        out = out.reshape(b, n_kv_heads, group, chunk, d)
        out = out.transpose(0, 3, 1, 2, 4).reshape(b, chunk, n_q_heads, d)
        return out if chunked_in else out[:, 0]

    # The manual-DMA path slices pages out of the (possibly VMEM-resident)
    # pool; Mosaic requires the minor dim of such slices to be lane-tile
    # aligned, so gate on d % 128 (the grid path handles sub-tile head
    # dims).  Quantized pools ride the same walk (scales streamed alongside
    # payloads) when page_size keeps their slices aligned too.
    if pipelined and d % 128 == 0 and (
            not quantized or page_size % 128 == 0):
        out = _paged_attention_pipelined(
            qg, k_pages, v_pages, lengths, page_indices, window, chunk,
            k_scales=k_scales, v_scales=v_scales)
        return unfold(out)

    def q_map(b_, i_, pages, lens):
        return (b_, 0, 0, 0)

    def kv_map(b_, i_, pages, lens):
        # clamp skipped grid steps onto the nearest RUNNING step's page so
        # Pallas elides their DMAs (same trick as the flash kernels' causal
        # block-skip): high side = last valid page, low side = first
        # in-window page.  Without this the grid path loads every page slot
        # and the window's O(window) bandwidth saving never materialises.
        hi = jnp.minimum(jnp.maximum(lens[b_] - 1, 0) // page_size,
                         pages_per_seq - 1)   # padding can exceed capacity
        i_ = jnp.minimum(i_, hi)
        if window is not None:
            # earliest page the kernel runs: chunk row j=0 at position
            # lens - chunk attends >= lens - chunk + 1 - window
            lo = jnp.maximum(lens[b_] - chunk + 1 - window, 0) // page_size
            i_ = jnp.maximum(i_, jnp.minimum(lo, hi))
        return (0, pages[b_, i_], 0, 0)

    def o_map(b_, i_, pages, lens):
        return (b_, 0, 0, 0)

    gc = group * chunk
    in_specs = [
        pl.BlockSpec((1, n_kv_heads, gc, d), q_map),
        pl.BlockSpec((n_kv_heads, 1, page_size, d), kv_map),
        pl.BlockSpec((n_kv_heads, 1, page_size, d), kv_map),
    ]
    args = [qg, k_pages, v_pages]
    if quantized:
        in_specs += [
            pl.BlockSpec((n_kv_heads, 1, page_size, 1), kv_map),
            pl.BlockSpec((n_kv_heads, 1, page_size, 1), kv_map),
        ]
        args += [k_scales, v_scales]

        kernel = functools.partial(
            _paged_kernel, page_size=page_size, quantized=True,
            window=window, chunk=chunk,
        )
    else:
        def kernel(pages_ref, lengths_ref, q_ref, k_ref, v_ref,
                   o_ref, m_scr, l_scr, acc_scr):
            return _paged_kernel(pages_ref, lengths_ref, q_ref, k_ref, v_ref,
                                 None, None, o_ref, m_scr, l_scr, acc_scr,
                                 page_size=page_size, quantized=False,
                                 window=window, chunk=chunk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, pages_per_seq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n_kv_heads, gc, d), o_map),
        scratch_shapes=[
            pltpu.VMEM((n_kv_heads, gc, 1), jnp.float32),
            pltpu.VMEM((n_kv_heads, gc, 1), jnp.float32),
            pltpu.VMEM((n_kv_heads, gc, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_kv_heads, gc, d), q.dtype),
        interpret=use_interpret_mode(),
    )(page_indices.astype(jnp.int32), lengths.astype(jnp.int32), *args)
    return unfold(out)


def paged_attention_reference(q, k_pages, v_pages, lengths, page_indices,
                              k_scales=None, v_scales=None, sm_scale=None,
                              window=None):
    """jnp oracle: gather pages densely, mask by length, full softmax.
    ``q`` may be (B, Hq, d) or chunked (B, chunk, Hq, d) — chunk row j sits
    at position ``lengths - chunk + j`` (same convention as the kernel)."""
    chunked_in = q.ndim == 4
    if not chunked_in:
        q = q[:, None]
    b, chunk, n_q_heads, d = q.shape
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
    qg = q.reshape(b, chunk, n_kv_heads, group, d).astype(jnp.float32)
    s = jnp.einsum("bjhgd,bhkd->bjhgk", qg,
                   k_seq.astype(jnp.float32)) * scale
    pos = jnp.arange(s.shape[-1])[None, None, None, None, :]  # (1,1,1,1,K)
    bound = (lengths[:, None] - chunk + 1
             + jnp.arange(chunk)[None, :])          # (B, chunk) exclusive
    bound = bound[:, :, None, None, None]
    keep = pos < bound
    if window is not None:
        keep &= pos >= bound - window
    s = jnp.where(keep, s, -1e30)
    w = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bjhgk,bhkd->bjhgd", w, v_seq.astype(jnp.float32))
    o = o.reshape(b, chunk, n_q_heads, d).astype(q.dtype)
    return o if chunked_in else o[:, 0]

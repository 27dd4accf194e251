"""FlashAttention forward/backward as Pallas TPU kernels.

TPU-native re-design of the reference's core contribution
(``src/flashattention_kernel.cu``: fw ``forward_kernel:9-112`` /
``forward_kernel_causal:438-545``, bw ``backward_kernel:115-255`` /
``backward_kernel_causal:547-690``; Python bridge
``minitorch/cuda_kernel_ops.py:605-870``; autodiff Functions
``tensor_functions.py:472-516``).

Design translation, not a port:

* The CUDA kernel assigns one *thread* per Q row with tiles of at most
  Bc=64 rows and loops K-tiles in the outer loop (fw:37-50) -- a FlashAttn-1
  schedule with O rescaled in HBM every tile.  Here the schedule is
  FlashAttention-2 shaped for the MXU: grid (batch, head, q_block, kv_block)
  with 128x128 MXU tiles, online-softmax statistics (m, l) and the output
  accumulator held in f32 VMEM scratch that persists across the sequential
  kv_block grid axis, and O written once on the last kv step.
* Residuals are (o, lse) with lse = m + log(l) -- the FA-2 simplification of
  the reference's separate (l, m) buffers (cuda_kernel_ops.py:608-628).
* Backward splits into a dKV kernel (kv-major grid, accumulates dK/dV over Q
  blocks) and a dQ kernel (q-major grid, accumulates dQ over KV blocks),
  eliminating the reference's HBM ``dQ +=`` race-prone accumulation
  (flashattention_kernel.cu:228-235).  ``di = sum(o * do)`` is precomputed
  once and shared.
* Causal handling: whole KV blocks strictly above the diagonal are skipped at
  the grid level (the reference does the same block-skip at
  flashattention_kernel.cu:511-515) and the diagonal blocks are masked
  element-wise with iota.
* No d <= 2048 / Bc <= 64 / SRAM-size envelopes (fw:264-273): any head_dim
  and block size that fits VMEM works.

Public entries: :func:`flash_attention` (differentiable, causal flag),
:func:`flash_attention_reference` (pure-jnp oracle for tests).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._utils import DEFAULT_MASK_VALUE, cdiv, largest_divisor_block, use_interpret_mode

Array = jax.Array

# The kernels run the online softmax in base 2: exp2 is the VPU-native
# transcendental (exp costs an extra multiply per element), so log2(e) is
# folded into the score scale once and the running max m lives in the scaled
# domain.  l = sum exp2(s2 - m2) = sum exp(s - m) is invariant, so the
# natural-log lse residual is recovered as m2*ln2 + log(l).
LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453

# (1024, 1024) won the round-2/3 on-chip sweeps at every causal N
# (battery_logs/r2_measure.log, r3_followup.log): 84.1 TF @2K / 116.7 @8K
# causal and 136.9 TF non-causal @2K vs 77.1/106.6/124.5 for the old
# (512, 1024) — bigger tiles amortise the per-kv-step online-softmax VPU
# work.  Round 2's interior-tile `pl.when` mask-skip was measured as an ~18%
# LOSS (predication around the main dot breaks Mosaic pipelining; the
# unconditional iota+where it saved is cheaper) and was removed, as was the
# `diag_subtile` strip-dot variant (20-70% slower at every swept point).
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024
# Below this sequence length the plain fused-softmax op-graph is faster than
# the flash schedule; the wrapper falls back to the jnp path.
_MIN_BLOCK = 8


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr,
                *, causal: bool, sm_scale: float, block_q: int, block_k: int,
                num_kv: int, window: Optional[int] = None):
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # Causal: skip KV blocks strictly above the diagonal; varlen: skip KV
    # blocks entirely past this row's valid prefix; sliding window: skip KV
    # blocks entirely left of every row's window (row r sees cols
    # (r - window, r]).
    should_run = True
    row_len = None
    if causal:
        should_run = (qi + 1) * block_q - 1 >= ki * block_k
    if window is not None:
        should_run &= (ki + 1) * block_k - 1 >= qi * block_q - (window - 1)
    if len_ref is not None:
        row_len = len_ref[pl.program_id(0)]
        should_run &= ki * block_k < row_len

    @pl.when(should_run)
    def _compute():
        # Feed the MXU in the input dtype (bf16 stays bf16 -- 4x the f32
        # throughput) and accumulate in f32 via preferred_element_type.
        # q is pre-scaled by sm_scale in the wrapper, so no per-tile rescale.
        q = q_ref[0, 0]                              # (block_q, d)
        k = k_ref[0, 0]                              # (block_k, d)
        v = v_ref[0, 0]                              # (block_k, d)

        def score(k_blk):
            return jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                        # (block_q, k_blk rows)

        def update(s, keep, v_blk):
            m_prev = m_scr[...]                      # (block_q, 1)
            l_prev = l_scr[...]
            m_curr = jnp.max(s, axis=-1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - m_next)                 # (block_q, width)
            if keep is not None and (len_ref is not None or window is not None):
                # fully-masked rows (short varlen prefix, or a window that
                # has no overlap with this block even though other rows'
                # windows do): m == MASK makes every p entry exp2(0) == 1;
                # zero them so l stays 0 and the empty-row guard yields 0
                p = jnp.where(keep, p, 0.0)
            l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

            m_scr[...] = m_next
            l_scr[...] = l_next

            pv = jax.lax.dot(
                p.astype(v_blk.dtype), v_blk, preferred_element_type=jnp.float32
            )
            acc_scr[...] = acc_scr[...] * alpha + pv

        if causal or window is not None or len_ref is not None:
            # Mask every running tile unconditionally.  Measured on-chip:
            # branching the mask on a per-tile needs_mask predicate (round
            # 2's interior-skip) is ~18% SLOWER than always-iota+where —
            # predication around the main dot breaks Mosaic pipelining
            # (battery_logs/r3_followup.log leg A vs leg B).
            row_min = qi * block_q
            col_min = ki * block_k
            s = score(k)
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + row_min
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + col_min
            keep = jnp.ones(s.shape, jnp.bool_)
            if causal:
                keep &= cols <= rows
            if window is not None:
                keep &= cols > rows - window
            if len_ref is not None:  # per-batch valid KV prefix
                keep &= cols < row_len
            update(jnp.where(keep, s, DEFAULT_MASK_VALUE), keep, v)
        else:
            update(score(k), None, v)

    @pl.when(ki == num_kv - 1)
    def _finalize():
        l = l_scr[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        # m is in the base-2 (scale*log2e) domain; lse returned in nats.
        lse = m_scr[...] * LN2 + jnp.log(jnp.where(l == 0.0, 1.0, l))
        lse_ref[0, 0] = lse.astype(lse_ref.dtype)


def _flash_fwd(q, k, v, *, causal, sm_scale, block_q, block_k,
               kv_lengths=None, window=None):
    b, h, n_q, d = q.shape
    n_kv = k.shape[2]
    # GQA/MQA: q heads grouped onto fewer kv heads — the kv index maps fold
    # the grid's q-head index down (h_ // group); no k/v repeat materialised.
    group = h // k.shape[1]
    grid = (b, h, cdiv(n_q, block_q), cdiv(n_kv, block_k))
    num_kv = grid[3]

    # Fold the softmax scale AND log2(e) into q once (XLA fuses it into the
    # producer) instead of rescaling every (block_q, block_k) score tile in
    # the kernel; the kernel's softmax then runs in exp2.
    q = q * jnp.asarray(sm_scale * LOG2E, q.dtype)

    if causal:
        # Above-diagonal KV blocks are skipped by the kernel; clamp their
        # index map to the diagonal block so consecutive skipped steps hit
        # the same block and Pallas elides the K/V DMAs entirely (the
        # reference's block-skip, flashattention_kernel.cu:511-515, spent
        # the memory traffic anyway).  A sliding window additionally skips
        # blocks entirely left of the earliest row's window — clamp those
        # up to the first needed block for the same DMA elision.
        def kv_index(b_, h_, q_, k_):
            last = ((q_ + 1) * block_q - 1) // block_k
            k_ = jnp.minimum(k_, last)
            if window is not None:
                first = jnp.maximum(q_ * block_q - (window - 1), 0) // block_k
                k_ = jnp.maximum(k_, jnp.minimum(first, last))
            return (b_, h_ // group, k_, 0)
    else:
        def kv_index(b_, h_, q_, k_):
            return (b_, h_ // group, k_, 0)

    out_shape = [
        jax.ShapeDtypeStruct((b, h, n_q, d), q.dtype),
        jax.ShapeDtypeStruct((b, h, n_q, 1), jnp.float32),
    ]
    scratch_shapes = [
        pltpu.VMEM((block_q, 1), jnp.float32),
        pltpu.VMEM((block_q, 1), jnp.float32),
        pltpu.VMEM((block_q, d), jnp.float32),
    ]
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
    )

    if kv_lengths is None:
        kernel = functools.partial(
            _fwd_kernel, None, causal=causal, sm_scale=sm_scale,
            block_q=block_q, block_k=block_k, num_kv=num_kv, window=window,
        )
        o, lse = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d),
                             lambda b_, h_, q_, k_: (b_, h_, q_, 0)),
                pl.BlockSpec((1, 1, block_k, d), kv_index),
                pl.BlockSpec((1, 1, block_k, d), kv_index),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_q, d),
                             lambda b_, h_, q_, k_: (b_, h_, q_, 0)),
                pl.BlockSpec((1, 1, block_q, 1),
                             lambda b_, h_, q_, k_: (b_, h_, q_, 0)),
            ],
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            compiler_params=compiler_params,
            interpret=use_interpret_mode(),
        )(q, k, v)
        return o, lse

    # varlen path: lengths ride scalar prefetch so both the kernel body AND
    # the index maps can read them (blocks past the valid prefix are clamped
    # so their DMAs are elided, like the causal block-skip).
    def kv_index_len(b_, h_, q_, k_, lens):
        hi = jnp.maximum(lens[b_] - 1, 0) // block_k
        if causal:
            hi = jnp.minimum(hi, ((q_ + 1) * block_q - 1) // block_k)
        k_ = jnp.minimum(k_, hi)
        if window is not None:
            first = jnp.maximum(q_ * block_q - (window - 1), 0) // block_k
            k_ = jnp.maximum(k_, jnp.minimum(first, hi))
        return (b_, h_ // group, k_, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d),
                         lambda b_, h_, q_, k_, lens: (b_, h_, q_, 0)),
            pl.BlockSpec((1, 1, block_k, d), kv_index_len),
            pl.BlockSpec((1, 1, block_k, d), kv_index_len),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d),
                         lambda b_, h_, q_, k_, lens: (b_, h_, q_, 0)),
            pl.BlockSpec((1, 1, block_q, 1),
                         lambda b_, h_, q_, k_, lens: (b_, h_, q_, 0)),
        ],
        scratch_shapes=scratch_shapes,
    )
    kernel = functools.partial(
        _fwd_kernel, causal=causal, sm_scale=sm_scale,
        block_q=block_q, block_k=block_k, num_kv=num_kv, window=window,
    )
    o, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=compiler_params,
        interpret=use_interpret_mode(),
    )(kv_lengths.astype(jnp.int32), q, k, v)
    return o, lse


# ---------------------------------------------------------------------------
# Forward kernel, q-major loop schedule (causal self-attention fast path)
# ---------------------------------------------------------------------------
#
# The grid kernel above walks (b, h, q_block, kv_block) and pays, per kv
# step: a grid-pipeline step (skipped above the diagonal but still
# sequenced), an iota+where mask, and an online-softmax rescale.  Measured
# on-chip (battery_logs/r3_followup.log), a SINGLE full-tile masked dot hits
# ~95% of the matmul roofline while the stepped schedule tops out at ~78%
# raw — the per-step work, not the MXU, is the causal ceiling.  This
# schedule restructures causal attention around that finding:
#
# * grid (b, h, q_block): one kernel invocation owns a whole q block's row;
#   no skipped grid steps exist at all.
# * interior KV chunks (strictly below the diagonal) stream HBM->VMEM with
#   the same manual double-buffered DMA loop the paged-decode kernel proves
#   (paged_attention.py:119); the fori_loop trip count is DYNAMIC (qi
#   chunks), so short rows pay only for the chunks they attend to.  Interior
#   chunks are fully live: no mask, no branch, full-width MXU dots.
# * the diagonal block arrives through the ordinary BlockSpec pipeline and
#   is processed at TRACE time after the loop: its score dot is issued as
#   column strips with triangular row starts (strip j covers cols
#   [j*ds, (j+1)*ds) and only rows >= j*ds), staged into an f32 VMEM tile
#   pre-filled with the mask value — cutting the diagonal tile's MXU work
#   ~in half while keeping ONE online-softmax update for the whole tile.
#   Only each strip's top (ds, ds) square needs an iota mask.
# * the PV dot for the diagonal is stripped the same way (acc rows >= j*ds).
#
# The reference has no analogue (its causal kernel masks every tile,
# flashattention_kernel.cu:511-545); this is the TPU-shaped answer to the
# same math.


def _fwd_loop_kernel(q_ref, kd_ref, vd_ref, k_hbm, v_hbm, o_ref, lse_ref,
                     m_scr, l_scr, acc_scr, kbuf, vbuf, sems,
                     *, block_q: int, chunk: int, diag_strip: int,
                     group: int, causal: bool = True, n_kv: int = 0):
    b_ = pl.program_id(0)
    h_ = pl.program_id(1)
    qi = pl.program_id(2)
    hk = h_ // group

    q = q_ref[0, 0]                                   # (bq, d), pre-scaled
    m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    if causal:
        n_int = qi * (block_q // chunk)               # interior chunk count
    else:
        # non-causal: every chunk is interior; the BlockSpec-piped block
        # serves the LAST kv chunk (no mask anywhere)
        n_int = n_kv // chunk - 1

    def dma(buf, hbm, i, slot, kind):
        return pltpu.make_async_copy(
            hbm.at[b_, hk, pl.ds(i * chunk, chunk)],
            buf.at[slot], sems.at[slot, kind])

    @pl.when(n_int > 0)
    def _warmup():
        dma(kbuf, k_hbm, 0, 0, 0).start()
        dma(vbuf, v_hbm, 0, 0, 1).start()

    def body(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_int)
        def _prefetch():
            nxt = 1 - slot
            dma(kbuf, k_hbm, i + 1, nxt, 0).start()
            dma(vbuf, v_hbm, i + 1, nxt, 1).start()

        dma(kbuf, k_hbm, i, slot, 0).wait()
        dma(vbuf, v_hbm, i, slot, 1).wait()

        k = kbuf[slot]                                # (chunk, d)
        v = vbuf[slot]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # (bq, chunk)
        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next)
        m_scr[...] = m_next
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot(p.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        acc_scr[...] = acc_scr[...] * alpha + pv
        return 0

    jax.lax.fori_loop(0, n_int, body, 0)

    # -- final block --------------------------------------------------------
    # Causal: the diagonal block as trace-time triangular ROW groups.
    # Row group g covers q rows [g*ds, (g+1)*ds) and needs only kv columns
    # [0, (g+1)*ds) under the causal mask, so its score dot is
    # (ds, d) x (d, (g+1)*ds) — MXU work drops from bq^2 to
    # (G+1)/(2G) * bq^2 at G groups.  Row groups touch DISJOINT rows of the
    # (m, l, acc) statistics, so each row still gets exactly ONE
    # online-softmax update for the whole diagonal tile: no extra rescale
    # passes and no reduction-order change (unlike column strips, which
    # measured 25-45% slower from the repeated full-height updates).  Only
    # each group's trailing (ds, ds) square pays an iota mask.  ds=0 (or
    # ds=block_q) degrades to one full-width masked dot.
    # Non-causal: the piped block is simply the LAST kv chunk, unmasked.
    kd = kd_ref[0, 0]                                 # (bq, d)
    vd = vd_ref[0, 0]
    if not causal:
        s = jax.lax.dot_general(q, kd, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next)
        m_scr[...] = m_next
        l_scr[...] = alpha * l_prev + jnp.sum(p, -1, keepdims=True)
        pv = jax.lax.dot(p.astype(vd.dtype), vd,
                         preferred_element_type=jnp.float32)
        acc_scr[...] = acc_scr[...] * alpha + pv
        l = l_scr[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        lse = m_scr[...] * LN2 + jnp.log(jnp.where(l == 0.0, 1.0, l))
        lse_ref[0, 0] = lse.astype(lse_ref.dtype)
        return
    ds = diag_strip if (diag_strip and block_q % diag_strip == 0
                        and diag_strip < block_q) else block_q
    for g in range(block_q // ds):
        r0 = g * ds
        c_hi = r0 + ds                                # live cols [0, c_hi)
        sj = jax.lax.dot_general(
            q[r0:c_hi], kd[:c_hi], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # (ds, c_hi)
        # only the trailing (ds, ds) square straddles the diagonal
        rows = jax.lax.broadcasted_iota(jnp.int32, (ds, ds), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (ds, ds), 1)
        wedge = jnp.where(cols <= rows, sj[:, r0:], DEFAULT_MASK_VALUE)
        if r0 > 0:
            sj = jnp.concatenate([sj[:, :r0], wedge], axis=1)
        else:
            sj = wedge
        m_prev = m_scr[r0:c_hi, ...]
        l_prev = l_scr[r0:c_hi, ...]
        m_curr = jnp.max(sj, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(sj - m_next)
        m_scr[r0:c_hi, ...] = m_next
        l_scr[r0:c_hi, ...] = alpha * l_prev + jnp.sum(p, -1, keepdims=True)
        pv = jax.lax.dot(p.astype(vd.dtype), vd[:c_hi],
                         preferred_element_type=jnp.float32)
        acc_scr[r0:c_hi, ...] = acc_scr[r0:c_hi, ...] * alpha + pv

    l = l_scr[...]
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
    lse = m_scr[...] * LN2 + jnp.log(jnp.where(l == 0.0, 1.0, l))
    lse_ref[0, 0] = lse.astype(lse_ref.dtype)


# Row-group width for the loop kernel's diagonal block (trace-time,
# branch-free).  0 = one full-width masked dot — the measured FORWARD winner
# (battery_logs/r3_measure_fwd3.log: groups' smaller dots + sliced-scratch
# updates cost more than the masked overcompute they save); the BACKWARD
# loop kernels prefer groups (no online-softmax chain there, so the saving
# is pure) and pass their own width.
DEFAULT_DIAG_STRIP = 0


def _flash_fwd_loop(q, k, v, *, sm_scale, block_q, chunk=None,
                    diag_strip=DEFAULT_DIAG_STRIP, causal=True):
    """Self-attention via the q-major loop schedule.

    Causal requires n_q == n_kv with block_q | n_q (the dispatcher
    guarantees it); non-causal allows n_kv != n_q (cross-attention) with
    block_q | n_kv — every chunk is interior and the piped block serves
    the last kv chunk.
    """
    b, h, n, d = q.shape
    n_kv = k.shape[2]
    group = h // k.shape[1]
    chunk = chunk or block_q
    assert n % block_q == 0 and block_q % chunk == 0
    assert causal is False or n == n_kv
    assert n_kv % block_q == 0
    num_q = n // block_q
    last_kv = n_kv // block_q - 1

    q = q * jnp.asarray(sm_scale * LOG2E, q.dtype)

    if causal:
        def kv_index(b_, h_, q_):
            return (b_, h_ // group, q_, 0)
    else:
        def kv_index(b_, h_, q_):
            return (b_, h_ // group, last_kv, 0)

    grid = (b, h, num_q)
    kernel = functools.partial(
        _fwd_loop_kernel, block_q=block_q, chunk=chunk,
        diag_strip=diag_strip, group=group, causal=causal, n_kv=n_kv)
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d),
                         lambda b_, h_, q_: (b_, h_, q_, 0)),
            pl.BlockSpec((1, 1, block_q, d), kv_index),
            pl.BlockSpec((1, 1, block_q, d), kv_index),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d),
                         lambda b_, h_, q_: (b_, h_, q_, 0)),
            pl.BlockSpec((1, 1, block_q, 1),
                         lambda b_, h_, q_: (b_, h_, q_, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, n, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((2, chunk, d), k.dtype),
            pltpu.VMEM((2, chunk, d), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=use_interpret_mode(),
    )(q, k, v, k, v)
    return o, lse


# ---------------------------------------------------------------------------
# Forward kernel, subrow schedule (causal, short-to-moderate sequences)
# ---------------------------------------------------------------------------
#
# At seq <= ~4K the whole K/V row fits in VMEM, so causal attention needs
# NO online softmax at all: grid (batch, head), K/V/Q arrive whole through
# the BlockSpec pipeline, and a trace-time loop over q ROW GROUPS gives
# each group one triangular-width score dot (rows [g*sub, (g+1)*sub) only
# attend cols [0, (g+1)*sub)) followed by a single-pass softmax and one PV
# dot.  No m/l rescale chains, no DMA loop, no pl.when — causal overcompute
# falls to (1 + sub/N)x and every VPU op touches only live elements.


def _fwd_subrow_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                       *, sub: int, n: int, concat_mask: bool = True):
    q = q_ref[0, 0]                                   # (n, d), pre-scaled
    k = k_ref[0, 0]                                   # (n, d)
    v = v_ref[0, 0]
    if concat_mask:
        rows = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 1)
        tri = cols <= rows
    for g in range(n // sub):
        r0 = g * sub
        c_hi = r0 + sub
        s = jax.lax.dot_general(
            q[r0:c_hi], k[:c_hi], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # (sub, c_hi)
        if concat_mask:
            wedge = jnp.where(tri, s[:, r0:], DEFAULT_MASK_VALUE)
            if r0 > 0:
                s = jnp.concatenate([s[:, :r0], wedge], axis=1)
            else:
                s = wedge
        else:
            # full-width select (no slice+concat buffer): row r0+rr keeps
            # cols <= r0+rr
            rr = jax.lax.broadcasted_iota(jnp.int32, (sub, c_hi), 0) + r0
            cc = jax.lax.broadcasted_iota(jnp.int32, (sub, c_hi), 1)
            s = jnp.where(cc <= rr, s, DEFAULT_MASK_VALUE)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot(p.astype(v.dtype), v[:c_hi],
                         preferred_element_type=jnp.float32)
        o_ref[0, 0, r0:c_hi] = (pv / l).astype(o_ref.dtype)
        lse_ref[0, 0, r0:c_hi] = (m * LN2 + jnp.log(l)).astype(jnp.float32)


def _flash_fwd_subrow(q, k, v, *, sm_scale, sub: int = 256,
                      concat_mask: bool = True,
                      vmem_limit: Optional[int] = None):
    """Causal self-attention with the whole K/V row VMEM-resident.

    Requires n_q == n_kv, sub | n, and the row to fit VMEM.  ``vmem_limit``
    raises Mosaic's scoped-vmem budget above the 16MB default (v5e has
    128MB physical VMEM per core); the dispatcher passes it for n > 2048,
    where the whole-row blocks + score intermediates exceed the default."""
    b, h, n, d = q.shape
    group = h // k.shape[1]
    assert n % sub == 0
    q = q * jnp.asarray(sm_scale * LOG2E, q.dtype)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_subrow_kernel, sub=sub, n=n,
                          concat_mask=concat_mask),
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, n, d), lambda b_, h_: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, n, d),
                         lambda b_, h_: (b_, h_ // group, 0, 0)),
            pl.BlockSpec((1, 1, n, d),
                         lambda b_, h_: (b_, h_ // group, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, n, d), lambda b_, h_: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, n, 1), lambda b_, h_: (b_, h_, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, n, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=vmem_limit),
        interpret=use_interpret_mode(),
    )(q, k, v)
    return o, lse


def _fwd_subrow_varlen_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                              *, sub: int, n: int):
    """Varlen port of the subrow schedule: the batch row's valid KV prefix
    arrives via scalar prefetch and masks score COLUMNS (cols >= len join
    the causal mask in one full-width where — the measured-fastest dense
    mask variant).  Rows past len still attend the valid prefix, matching
    the grid varlen kernel / oracle bit-for-bit on padding rows; len == 0
    rows emit (0, -inf) via a scalar guard."""
    ln = len_ref[pl.program_id(0)]
    q = q_ref[0, 0]                                   # (n, d), pre-scaled
    k = k_ref[0, 0]                                   # (n, d)
    v = v_ref[0, 0]
    live = (ln > 0).astype(jnp.float32)               # scalar 0/1
    for g in range(n // sub):
        r0 = g * sub
        c_hi = r0 + sub
        s = jax.lax.dot_general(
            q[r0:c_hi], k[:c_hi], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # (sub, c_hi)
        rr = jax.lax.broadcasted_iota(jnp.int32, (sub, c_hi), 0) + r0
        cc = jax.lax.broadcasted_iota(jnp.int32, (sub, c_hi), 1)
        # causal AND varlen in ONE compare: col <= min(row, len-1)
        s = jnp.where(cc <= jnp.minimum(rr, ln - 1), s, DEFAULT_MASK_VALUE)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot(p.astype(v.dtype), v[:c_hi],
                         preferred_element_type=jnp.float32)
        # ln == 0 leaves every col masked: m == MASK makes p uniform 1 and
        # pv/l a spurious mean of v — the scalar guard restores the
        # oracle's (0, -inf) empty-row convention.
        o_ref[0, 0, r0:c_hi] = (pv / l * live).astype(o_ref.dtype)
        lse_ref[0, 0, r0:c_hi] = jnp.where(
            live > 0, m * LN2 + jnp.log(l), -jnp.inf).astype(jnp.float32)


def _flash_fwd_subrow_varlen(q, k, v, kv_lengths, *, sm_scale,
                             sub: int = 256,
                             vmem_limit: Optional[int] = None,
                             prefetch: bool = True):
    """Varlen causal self-attention with the whole K/V row VMEM-resident.

    The serving engine's batched prefill is varlen
    (serving/engine.py::_prefill -> models/transformer.py
    forward_prefill_paged), which previously excluded it from the champion
    subrow schedule; this wrapper brings the same whole-row/no-online-
    softmax layout to padded ragged batches.  Same eligibility envelope as
    the dense kernel (:func:`_subrow_ok`) — lengths only affect masking,
    not the footprint."""
    b, h, n, d = q.shape
    group = h // k.shape[1]
    assert n % sub == 0
    q = q * jnp.asarray(sm_scale * LOG2E, q.dtype)
    out_shape = [
        jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
        jax.ShapeDtypeStruct((b, h, n, 1), jnp.float32),
    ]
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel"),
        vmem_limit_bytes=vmem_limit)
    if prefetch:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h),
            in_specs=[
                pl.BlockSpec((1, 1, n, d),
                             lambda b_, h_, lens: (b_, h_, 0, 0)),
                pl.BlockSpec((1, 1, n, d),
                             lambda b_, h_, lens: (b_, h_ // group, 0, 0)),
                pl.BlockSpec((1, 1, n, d),
                             lambda b_, h_, lens: (b_, h_ // group, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, n, d),
                             lambda b_, h_, lens: (b_, h_, 0, 0)),
                pl.BlockSpec((1, 1, n, 1),
                             lambda b_, h_, lens: (b_, h_, 0, 0)),
            ],
        )
        o, lse = pl.pallas_call(
            functools.partial(_fwd_subrow_varlen_kernel, sub=sub, n=n),
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=params,
            interpret=use_interpret_mode(),
        )(kv_lengths.astype(jnp.int32), q, k, v)
        return o, lse
    # SMEM variant: lens ride an SMEM block spec on a plain grid (A/B vs
    # the prefetch grid spec's ~19% overhead hypothesis)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_subrow_varlen_kernel, sub=sub, n=n),
        grid=(b, h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n, d), lambda b_, h_: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, n, d),
                         lambda b_, h_: (b_, h_ // group, 0, 0)),
            pl.BlockSpec((1, 1, n, d),
                         lambda b_, h_: (b_, h_ // group, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, n, d), lambda b_, h_: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, n, 1), lambda b_, h_: (b_, h_, 0, 0)),
        ],
        out_shape=out_shape,
        compiler_params=params,
        interpret=use_interpret_mode(),
    )(kv_lengths.astype(jnp.int32), q, k, v)
    return o, lse


# ---------------------------------------------------------------------------
# Forward kernel, TWO-LEVEL schedule (16K+: subrow inside VMEM-sized panels,
# online softmax only ACROSS panels)
# ---------------------------------------------------------------------------
#
# At 16K the whole K/V row overflows even the 100MB raised budget, so the
# loop kernel served it (144.5 TF) with a 1024-wide online-softmax merge per
# chunk.  This schedule keeps the subrow structure but at PANEL granularity:
# grid (b, h, q_panel, kv_panel) with ~4K panels; interior panels run
# full-width (sub, panel) dots and ONE (m, l, acc) merge per row group per
# panel — n/panel merges per row instead of the loop kernel's n/1024 — and
# the diagonal panel runs the triangular subrow wedge.  Above-diagonal
# steps clamp their index maps onto the diagonal so their DMAs elide.


def _fwd_twolevel_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                         m_scr, l_scr, acc_scr, *, panel: int, sub: int):
    qp = pl.program_id(2)
    kp = pl.program_id(3)

    @pl.when(kp == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]                                   # (panel, d) pre-scaled
    k = k_ref[0, 0]                                   # (panel, d)
    v = v_ref[0, 0]

    def merge(g, s, c_hi):
        r0, r1 = g * sub, g * sub + sub
        m_prev = m_scr[r0:r1]
        l_prev = l_scr[r0:r1]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next)
        m_scr[r0:r1] = m_next
        l_scr[r0:r1] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot(p.astype(v.dtype), v[:c_hi],
                         preferred_element_type=jnp.float32)
        acc_scr[r0:r1] = acc_scr[r0:r1] * alpha + pv

    @pl.when(kp < qp)
    def _interior():
        for g in range(panel // sub):
            r0 = g * sub
            s = jax.lax.dot_general(
                q[r0:r0 + sub], k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # (sub, panel)
            merge(g, s, panel)

    @pl.when(kp == qp)
    def _diag_and_finalize():
        for g in range(panel // sub):
            r0 = g * sub
            c_hi = r0 + sub
            s = jax.lax.dot_general(
                q[r0:c_hi], k[:c_hi], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # (sub, c_hi)
            rr = jax.lax.broadcasted_iota(jnp.int32, (sub, c_hi), 0) + r0
            cc = jax.lax.broadcasted_iota(jnp.int32, (sub, c_hi), 1)
            merge(g, jnp.where(cc <= rr, s, DEFAULT_MASK_VALUE), c_hi)
        l = l_scr[...]
        o_ref[0, 0] = (acc_scr[...] / l).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_scr[...] * LN2 + jnp.log(l)).astype(jnp.float32)


def _flash_fwd_twolevel(q, k, v, *, sm_scale, panel: int = 4096,
                        sub: int = 256, vmem_limit: Optional[int] = None):
    """Causal self-attention for rows too long for the subrow schedule.

    Requires n_q == n_kv, panel | n, sub | panel.  GQA folds kv heads in
    the index maps like every other schedule here."""
    b, h, n, d = q.shape
    group = h // k.shape[1]
    assert n % panel == 0 and panel % sub == 0
    q = q * jnp.asarray(sm_scale * LOG2E, q.dtype)
    num_p = n // panel

    def kv_index(b_, h_, qp_, kp_):
        return (b_, h_ // group, jnp.minimum(kp_, qp_), 0)

    o, lse = pl.pallas_call(
        functools.partial(_fwd_twolevel_kernel, panel=panel, sub=sub),
        grid=(b, h, num_p, num_p),
        in_specs=[
            pl.BlockSpec((1, 1, panel, d),
                         lambda b_, h_, qp_, kp_: (b_, h_, qp_, 0)),
            pl.BlockSpec((1, 1, panel, d), kv_index),
            pl.BlockSpec((1, 1, panel, d), kv_index),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, panel, d),
                         lambda b_, h_, qp_, kp_: (b_, h_, qp_, 0)),
            pl.BlockSpec((1, 1, panel, 1),
                         lambda b_, h_, qp_, kp_: (b_, h_, qp_, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, n, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((panel, 1), jnp.float32),
            pltpu.VMEM((panel, 1), jnp.float32),
            pltpu.VMEM((panel, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=vmem_limit),
        interpret=use_interpret_mode(),
    )(q, k, v)
    return o, lse


# ---------------------------------------------------------------------------
# Backward kernel, subrow schedule (whole row VMEM-resident, ONE kernel)
# ---------------------------------------------------------------------------
#
# The loop backward (below) splits into a q-major dQ kernel and a kv-major
# dKV kernel, so every (q, kv) pair's score matrix is computed TWICE (7
# score-shaped dots total: s/dp/dq + s^T/dv/dp^T/dk).  When the whole K/V
# row fits VMEM (seq 1-8K at d=128 bf16 — up to 2K inside the default 16MB
# scoped-vmem budget, 4/8K under the tuned 48/64MB raised limits of
# _flash_vjp_bwd) a single fused kernel computes p once
# per triangular q row group and issues exactly the 5 essential dots
# (s, dv, dp, dq, dk) — a 7/5 = 1.4x MXU-work reduction on top of losing
# the chunked-DMA machinery.  dq rows are disjoint per group (written
# straight to the output); dk/dv accumulate in f32 scratch over row groups
# and GQA group heads (grid is (batch, kv_head)).  Mirrors the reference's
# one-kernel backward (flashattention_kernel.cu:547-690) at row-group
# rather than thread granularity.


def _bwd_subrow_kernel(q_ref, do_ref, lse_ref, di_ref, k_ref, v_ref,
                       dq_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                       *, sub: int, n: int, sm_scale: float):
    g_ = pl.program_id(2)                             # GQA group step
    k = k_ref[0, 0]                                   # (n, d)
    v = v_ref[0, 0]

    @pl.when(g_ == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    scale2 = sm_scale * LOG2E
    rows = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 1)
    tri = cols <= rows
    q = q_ref[0, 0]                                   # (n, d)
    do = do_ref[0, 0]
    for i in range(n // sub):
        r0 = i * sub
        c_hi = r0 + sub
        qs = q[r0:c_hi]
        dos = do[r0:c_hi]
        lse2 = lse_ref[0, 0, r0:c_hi] * LOG2E         # (sub, 1), base-2
        di = di_ref[0, 0, r0:c_hi]
        s = jax.lax.dot_general(
            qs, k[:c_hi], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale2  # (sub, c_hi)
        wedge = jnp.where(tri, s[:, r0:], DEFAULT_MASK_VALUE)
        if r0 > 0:
            s = jnp.concatenate([s[:, :r0], wedge], axis=1)
        else:
            s = wedge
        p = jnp.exp2(s - lse2)                        # masked cols -> 0
        dv_scr[:c_hi] += jax.lax.dot_general(
            p.astype(dos.dtype), dos, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (c_hi, d)
        dp = jax.lax.dot_general(
            dos, v[:c_hi], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # (sub, c_hi)
        ds_ = p * (dp - di) * sm_scale
        dq_ref[0, 0, r0:c_hi] = jax.lax.dot(
            ds_.astype(k.dtype), k[:c_hi],
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_scr[:c_hi] += jax.lax.dot_general(
            ds_.astype(qs.dtype), qs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    # dk/dv output blocks are revisited across the group axis; Pallas
    # flushes them to HBM when the (b, hk) index changes, so the last group
    # step's store wins — write the running accumulation every step.
    dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
    dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _flash_bwd_subrow(q, k, v, lse, di, do, *, sm_scale, sub: int = 512,
                      vmem_limit: Optional[int] = None):
    """Causal self-attention backward with the whole row VMEM-resident.

    Requires n_q == n_kv, sub | n, and the dispatcher's vmem gate
    (:func:`_bwd_subrow_ok`).  GQA rides the GRID (grid (b, h_kv, group)
    with k/v blocks revisited and dk/dv accumulated in scratch across the
    group axis), so the VMEM footprint is group-independent.  Returns
    (dq, dk, dv) with dk/dv at h_kv granularity, matching
    :func:`_flash_bwd_loop`."""
    b, h, n, d = q.shape
    h_kv = k.shape[1]
    group = h // h_kv
    assert n % sub == 0

    def q_index(b_, hk_, g_):
        return (b_, hk_ * group + g_, 0, 0)

    def kv_index(b_, hk_, g_):
        return (b_, hk_, 0, 0)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_subrow_kernel, sub=sub, n=n,
                          sm_scale=sm_scale),
        grid=(b, h_kv, group),
        in_specs=[
            pl.BlockSpec((1, 1, n, d), q_index),
            pl.BlockSpec((1, 1, n, d), q_index),
            pl.BlockSpec((1, 1, n, 1), q_index),
            pl.BlockSpec((1, 1, n, 1), q_index),
            pl.BlockSpec((1, 1, n, d), kv_index),
            pl.BlockSpec((1, 1, n, d), kv_index),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, n, d), q_index),
            pl.BlockSpec((1, 1, n, d), kv_index),
            pl.BlockSpec((1, 1, n, d), kv_index),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
            jax.ShapeDtypeStruct((b, h_kv, n, d), k.dtype),
            jax.ShapeDtypeStruct((b, h_kv, n, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, d), jnp.float32),
            pltpu.VMEM((n, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_limit),
        interpret=use_interpret_mode(),
    )(q, do, lse, di, k, v)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Backward kernels, q-major / kv-major loop schedules (causal fast path)
# ---------------------------------------------------------------------------
#
# Same restructuring as the forward loop kernel: no skipped grid steps, no
# pl.when around the dots, interior chunks streamed with double-buffered
# DMA, the diagonal block via the BlockSpec pipeline with trace-time
# triangular strips.  Backward is simpler than forward in one way (lse is
# precomputed, so there is no online-softmax rescale chain at all) and
# harder in another: dKV walks q-major per KV block, so the per-Q-row
# statistics (lse, di) stream as (1, chunk) ROW vectors and the whole dKV
# kernel runs in the TRANSPOSED score layout s^T = (scale*log2e) * k q^T —
# every dot lands in its natural orientation (dV = p^T dO, dK = dS^T q) and
# the row stats broadcast along lanes with no relayouts.


def _bwd_dq_loop_kernel(q_ref, do_ref, lse_ref, di_ref, kd_ref, vd_ref,
                        k_hbm, v_hbm, dq_ref, dq_scr, kbuf, vbuf, sems,
                        *, block_q: int, chunk: int, diag_strip: int,
                        group: int, sm_scale: float):
    b_ = pl.program_id(0)
    h_ = pl.program_id(1)
    qi = pl.program_id(2)
    hk = h_ // group

    q = q_ref[0, 0]                                   # (bq, d)
    do = do_ref[0, 0]
    lse2 = lse_ref[0, 0] * LOG2E                      # (bq, 1), base-2
    di = di_ref[0, 0]
    dq_scr[...] = jnp.zeros_like(dq_scr)
    scale2 = sm_scale * LOG2E

    n_int = qi * (block_q // chunk)

    def dma(buf, hbm, i, slot, kind):
        return pltpu.make_async_copy(
            hbm.at[b_, hk, pl.ds(i * chunk, chunk)],
            buf.at[slot], sems.at[slot, kind])

    @pl.when(n_int > 0)
    def _warmup():
        dma(kbuf, k_hbm, 0, 0, 0).start()
        dma(vbuf, v_hbm, 0, 0, 1).start()

    def body(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_int)
        def _prefetch():
            nxt = 1 - slot
            dma(kbuf, k_hbm, i + 1, nxt, 0).start()
            dma(vbuf, v_hbm, i + 1, nxt, 1).start()

        dma(kbuf, k_hbm, i, slot, 0).wait()
        dma(vbuf, v_hbm, i, slot, 1).wait()
        k = kbuf[slot]
        v = vbuf[slot]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale2
        p = jnp.exp2(s - lse2)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds_ = p * (dp - di) * sm_scale
        dq_scr[...] += jax.lax.dot(ds_.astype(k.dtype), k,
                                   preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_int, body, 0)

    # diagonal block as triangular ROW groups (see the fwd loop kernel):
    # group g = q rows [g*ds, (g+1)*ds) against kv cols [0, (g+1)*ds);
    # disjoint dq_scr row slices, one accumulation per row.
    kd = kd_ref[0, 0]
    vd = vd_ref[0, 0]
    ds_w = diag_strip if (diag_strip and block_q % diag_strip == 0
                          and diag_strip < block_q) else block_q
    for g in range(block_q // ds_w):
        r0 = g * ds_w
        c_hi = r0 + ds_w
        sj = jax.lax.dot_general(
            q[r0:c_hi], kd[:c_hi], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale2   # (ds_w, c_hi)
        rows = jax.lax.broadcasted_iota(jnp.int32, (ds_w, ds_w), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (ds_w, ds_w), 1)
        wedge = jnp.where(cols <= rows, sj[:, r0:], DEFAULT_MASK_VALUE)
        if r0 > 0:
            sj = jnp.concatenate([sj[:, :r0], wedge], axis=1)
        else:
            sj = wedge
        p = jnp.exp2(sj - lse2[r0:c_hi])
        dp = jax.lax.dot_general(
            do[r0:c_hi], vd[:c_hi], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dsj = p * (dp - di[r0:c_hi]) * sm_scale
        dq_scr[r0:c_hi, ...] += jax.lax.dot(
            dsj.astype(kd.dtype), kd[:c_hi],
            preferred_element_type=jnp.float32)

    dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd_dkv_loop_kernel(k_ref, v_ref, qd_ref, dod_ref, lsed_ref, did_ref,
                         q_hbm, do_hbm, lse_hbm, di_hbm, dk_ref, dv_ref,
                         dk_scr, dv_scr, qbuf, dobuf, lsebuf, dibuf, sems,
                         *, block_k: int, chunk: int, diag_strip: int,
                         group: int, num_q: int, sm_scale: float):
    b_ = pl.program_id(0)
    hk = pl.program_id(1)
    ki = pl.program_id(2)

    k = k_ref[0, 0]                                   # (bk, d)
    v = v_ref[0, 0]
    dk_scr[...] = jnp.zeros_like(dk_scr)
    dv_scr[...] = jnp.zeros_like(dv_scr)
    scale2 = sm_scale * LOG2E

    ratio = block_k // chunk
    n_chunks = num_q * ratio                          # q chunks in total

    for g in range(group):                            # GQA: static unroll
        head = hk * group + g

        def dma(buf, hbm, i, slot, kind):
            return pltpu.make_async_copy(
                hbm.at[b_, head, pl.ds(i * chunk, chunk)],
                buf.at[slot], sems.at[slot, kind])

        def dma_stat(buf, hbm, i, slot, kind):
            return pltpu.make_async_copy(
                hbm.at[b_, head, :, pl.ds(i * chunk, chunk)],
                buf.at[slot], sems.at[slot, kind])

        # ---- diagonal q block (rows == this kv block's cols) -------------
        # triangular KV-COLUMN groups in the transposed layout: group g =
        # kv cols [g*ds, (g+1)*ds) against q rows [g*ds, bk) — DISJOINT
        # dk/dv row slices, one accumulation per kv token for the whole
        # diagonal tile; only the leading (ds, ds) square pays the mask.
        qd = qd_ref[0, g]                             # (bk, d)
        dod = dod_ref[0, g]
        ds_w = diag_strip if (diag_strip and block_k % diag_strip == 0
                              and diag_strip < block_k) else block_k
        for gg in range(block_k // ds_w):
            c0 = gg * ds_w                            # kv cols [c0, c0+ds)
            q_s = qd[c0:]                             # q rows [c0, bk)
            do_s = dod[c0:]
            # lane-offset row slices must load from the REF (loads realign
            # the layout): slicing the loaded (1, bk) row then broadcasting
            # crashes Mosaic with a vpad'd vector.broadcast
            lsed2_g = lsed_ref[0, g, :, c0:] * LOG2E  # (1, bk - c0)
            did_g = did_ref[0, g, :, c0:]
            st = jax.lax.dot_general(
                k[c0:c0 + ds_w], q_s, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale2  # (ds_w, bk-c0)
            # transposed wedge: st row = kv col c0+rr, st col = q row
            # c0+cc: live iff rr <= cc — the LEADING (ds_w, ds_w) square
            rr = jax.lax.broadcasted_iota(jnp.int32, (ds_w, ds_w), 0)
            cc = jax.lax.broadcasted_iota(jnp.int32, (ds_w, ds_w), 1)
            wedge = jnp.where(rr <= cc, st[:, :ds_w], DEFAULT_MASK_VALUE)
            if c0 + ds_w < block_k:
                st = jnp.concatenate([wedge, st[:, ds_w:]], axis=1)
            else:
                st = wedge
            pt = jnp.exp2(st - lsed2_g)
            dv_scr[c0:c0 + ds_w] += jax.lax.dot(
                pt.astype(do_s.dtype), do_s,
                preferred_element_type=jnp.float32)
            dpt = jax.lax.dot_general(
                v[c0:c0 + ds_w], do_s, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dst = pt * (dpt - did_g) * sm_scale
            dk_scr[c0:c0 + ds_w] += jax.lax.dot(
                dst.astype(q_s.dtype), q_s,
                preferred_element_type=jnp.float32)

        # ---- interior q chunks strictly below the diagonal ----------------
        j0 = (ki + 1) * ratio

        @pl.when(j0 < n_chunks)
        def _warmup():
            s0 = jax.lax.rem(j0, 2)
            dma(qbuf, q_hbm, j0, s0, 0).start()
            dma(dobuf, do_hbm, j0, s0, 1).start()
            dma_stat(lsebuf, lse_hbm, j0, s0, 2).start()
            dma_stat(dibuf, di_hbm, j0, s0, 3).start()

        def body(i, _):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_chunks)
            def _prefetch():
                nxt = 1 - slot
                dma(qbuf, q_hbm, i + 1, nxt, 0).start()
                dma(dobuf, do_hbm, i + 1, nxt, 1).start()
                dma_stat(lsebuf, lse_hbm, i + 1, nxt, 2).start()
                dma_stat(dibuf, di_hbm, i + 1, nxt, 3).start()

            dma(qbuf, q_hbm, i, slot, 0).wait()
            dma(dobuf, do_hbm, i, slot, 1).wait()
            dma_stat(lsebuf, lse_hbm, i, slot, 2).wait()
            dma_stat(dibuf, di_hbm, i, slot, 3).wait()
            qc = qbuf[slot]                           # (chunk, d)
            doc = dobuf[slot]
            st = jax.lax.dot_general(
                k, qc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale2  # (bk, chunk)
            pt = jnp.exp2(st - lsebuf[slot] * LOG2E)
            dv_scr[...] += jax.lax.dot(
                pt.astype(doc.dtype), doc,
                preferred_element_type=jnp.float32)
            dpt = jax.lax.dot_general(
                v, doc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dst = pt * (dpt - dibuf[slot]) * sm_scale
            dk_scr[...] += jax.lax.dot(
                dst.astype(qc.dtype), qc,
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(j0, n_chunks, body, 0)

    dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
    dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _flash_bwd_loop(q, k, v, lse, di, do, *, sm_scale, block: int,
                    diag_strip: int = 0, chunk: Optional[int] = None):
    """Causal self-attention backward via the loop schedules.

    Requires n_q == n_kv, block | n (dispatcher guarantees).  ``di`` is
    rowsum(dO * O) shaped (b, h, n, 1); lse likewise.  Returns (dq, dk, dv)
    with dk/dv at h_kv granularity (GQA group accumulated in-kernel).
    ``chunk`` (<= block, dividing it) sets the interior DMA chunk: the bwd
    body holds FOUR score-shaped f32 intermediates (s, p, dp, ds), so
    smaller chunks relieve vmem pressure where the fwd kernel doesn't
    need to.
    """
    b, h, n, d = q.shape
    h_kv = k.shape[1]
    group = h // h_kv
    num_q = n // block
    chunk = chunk or block
    assert block % chunk == 0
    scale = sm_scale

    # row-vector layout for the dKV streams: (b, h, 1, n) so per-chunk DMA
    # slices are (1, chunk) with a lane-aligned minor dim
    lse_row = lse.reshape(b, h, 1, n)
    di_row = di.reshape(b, h, 1, n)

    (dq,) = pl.pallas_call(
        functools.partial(_bwd_dq_loop_kernel, block_q=block, chunk=chunk,
                          diag_strip=diag_strip, group=group,
                          sm_scale=scale),
        grid=(b, h, num_q),
        in_specs=[
            pl.BlockSpec((1, 1, block, d), lambda b_, h_, q_: (b_, h_, q_, 0)),
            pl.BlockSpec((1, 1, block, d), lambda b_, h_, q_: (b_, h_, q_, 0)),
            pl.BlockSpec((1, 1, block, 1), lambda b_, h_, q_: (b_, h_, q_, 0)),
            pl.BlockSpec((1, 1, block, 1), lambda b_, h_, q_: (b_, h_, q_, 0)),
            pl.BlockSpec((1, 1, block, d),
                         lambda b_, h_, q_: (b_, h_ // group, q_, 0)),
            pl.BlockSpec((1, 1, block, d),
                         lambda b_, h_, q_: (b_, h_ // group, q_, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((1, 1, block, d),
                                lambda b_, h_, q_: (b_, h_, q_, 0))],
        out_shape=[jax.ShapeDtypeStruct((b, h, n, d), q.dtype)],
        scratch_shapes=[
            pltpu.VMEM((block, d), jnp.float32),
            pltpu.VMEM((2, chunk, d), k.dtype),
            pltpu.VMEM((2, chunk, d), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=use_interpret_mode(),
    )(q, do, lse, di, k, v, k, v)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_loop_kernel, block_k=block, chunk=chunk,
                          diag_strip=diag_strip, group=group, num_q=num_q,
                          sm_scale=scale),
        grid=(b, h_kv, num_q),
        in_specs=[
            pl.BlockSpec((1, 1, block, d),
                         lambda b_, hk_, k_: (b_, hk_, k_, 0)),
            pl.BlockSpec((1, 1, block, d),
                         lambda b_, hk_, k_: (b_, hk_, k_, 0)),
            pl.BlockSpec((1, group, block, d),
                         lambda b_, hk_, k_: (b_, hk_, k_, 0)),
            pl.BlockSpec((1, group, block, d),
                         lambda b_, hk_, k_: (b_, hk_, k_, 0)),
            pl.BlockSpec((1, group, 1, block),
                         lambda b_, hk_, k_: (b_, hk_, 0, k_)),
            pl.BlockSpec((1, group, 1, block),
                         lambda b_, hk_, k_: (b_, hk_, 0, k_)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block, d),
                         lambda b_, hk_, k_: (b_, hk_, k_, 0)),
            pl.BlockSpec((1, 1, block, d),
                         lambda b_, hk_, k_: (b_, hk_, k_, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h_kv, n, d), k.dtype),
            jax.ShapeDtypeStruct((b, h_kv, n, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, d), jnp.float32),
            pltpu.VMEM((block, d), jnp.float32),
            pltpu.VMEM((2, chunk, d), q.dtype),
            pltpu.VMEM((2, chunk, d), do.dtype),
            pltpu.VMEM((2, 1, chunk), jnp.float32),
            pltpu.VMEM((2, 1, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=use_interpret_mode(),
    )(k, v, q, do, lse_row, di_row, q, do, lse_row, di_row)

    return dq, dk, dv


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_dkv_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                    dk_ref, dv_ref,
                    dk_scr, dv_scr,
                    *, causal: bool, sm_scale: float, block_q: int, block_k: int,
                    num_q: int, group: int = 1,
                    window: Optional[int] = None):
    # Grid is (b, h_kv, kv_block, group, q_block): for GQA the query-head
    # group is an inner grid axis revisiting the SAME dk/dv output block, so
    # dK/dV accumulate at h_kv granularity in VMEM scratch -- no (b, h,
    # n_kv, d) per-query-head intermediate in HBM and no XLA group-sum
    # afterwards (the HBM traffic GQA exists to avoid).
    ki = pl.program_id(2)
    gi = pl.program_id(3)
    qi = pl.program_id(4)

    @pl.when(jnp.logical_and(gi == 0, qi == 0))
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    should_run = True
    row_len = None
    if causal:
        should_run = (qi + 1) * block_q - 1 >= ki * block_k
    if window is not None:
        # q rows past every col's window contribute nothing to this kv block
        should_run &= (ki + 1) * block_k - 1 >= qi * block_q - (window - 1)
    if len_ref is not None:
        row_len = len_ref[pl.program_id(0)]
        should_run &= ki * block_k < row_len

    @pl.when(should_run)
    def _compute():
        # MXU dots run in the input dtype with f32 accumulation.
        q = q_ref[0, 0]                              # (block_q, d)
        k = k_ref[0, 0]                              # (block_k, d)
        v = v_ref[0, 0]
        do = do_ref[0, 0]                            # (block_q, d)
        lse = lse_ref[0, 0]                          # (block_q, 1)
        di = di_ref[0, 0]                            # (block_q, 1)

        def accum(s, keep, q_blk, do_blk, lse_blk, di_blk):
            # s held in the base-2 domain: p = exp(s_nat-lse) = exp2(s2-lse2)
            p = jnp.exp2(s - lse_blk * LOG2E)        # (rows, block_k) f32
            if keep is not None and len_ref is not None:
                # empty rows carry lse = -inf -> exp2(+inf); zero them
                p = jnp.where(keep & jnp.isfinite(lse_blk), p, 0.0)
            # dV += P^T @ dO
            dv_scr[...] += jax.lax.dot_general(
                p.astype(do_blk.dtype), do_blk, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # dP = dO @ V^T
            dp = jax.lax.dot_general(
                do_blk, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                        # (rows, block_k)
            ds = p * (dp - di_blk) * sm_scale
            # dK += dS^T @ Q
            dk_scr[...] += jax.lax.dot_general(
                ds.astype(q_blk.dtype), q_blk, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def score(q_blk):
            return jax.lax.dot_general(
                q_blk, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (sm_scale * LOG2E)                   # (rows, block_k)

        if causal or window is not None or len_ref is not None:
            # Unconditional iota+where on every running tile (the measured
            # winner; see the fwd kernel's note).
            row_min = qi * block_q
            col_min = ki * block_k
            s = score(q)
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + row_min
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + col_min
            keep = jnp.ones(s.shape, jnp.bool_)
            if causal:
                keep &= cols <= rows
            if window is not None:
                keep &= cols > rows - window
            if len_ref is not None:
                keep &= cols < row_len
            accum(jnp.where(keep, s, DEFAULT_MASK_VALUE), keep,
                  q, do, lse, di)
        else:
            accum(score(q), None, q, do, lse, di)

    @pl.when(jnp.logical_and(gi == group - 1, qi == num_q - 1))
    def _finalize():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                   dq_ref, dq_scr,
                   *, causal: bool, sm_scale: float, block_q: int, block_k: int,
                   num_kv: int, window: Optional[int] = None):
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    should_run = True
    row_len = None
    if causal:
        should_run = (qi + 1) * block_q - 1 >= ki * block_k
    if window is not None:
        should_run &= (ki + 1) * block_k - 1 >= qi * block_q - (window - 1)
    if len_ref is not None:
        row_len = len_ref[pl.program_id(0)]
        should_run &= ki * block_k < row_len

    @pl.when(should_run)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]
        di = di_ref[0, 0]

        def accum(s, keep, k_blk, v_blk):
            p = jnp.exp2(s - lse * LOG2E)
            if keep is not None and len_ref is not None:
                p = jnp.where(keep & jnp.isfinite(lse), p, 0.0)
            dp = jax.lax.dot_general(
                do, v_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - di) * sm_scale
            dq_scr[...] += jax.lax.dot(
                ds.astype(k_blk.dtype), k_blk,
                preferred_element_type=jnp.float32
            )

        def score(k_blk):
            return jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (sm_scale * LOG2E)

        if causal or window is not None or len_ref is not None:
            # unconditional iota+where (the measured winner; see fwd note)
            row_min = qi * block_q
            col_min = ki * block_k
            s = score(k)
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + row_min
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + col_min
            keep = jnp.ones(s.shape, jnp.bool_)
            if causal:
                keep &= cols <= rows
            if window is not None:
                keep &= cols > rows - window
            if len_ref is not None:
                keep &= cols < row_len
            accum(jnp.where(keep, s, DEFAULT_MASK_VALUE), keep, k, v)
        else:
            accum(score(k), None, k, v)

    @pl.when(ki == num_kv - 1)
    def _finalize():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _flash_bwd(q, k, v, o, lse, do, *, causal, sm_scale, block_q, block_k,
               kv_lengths=None, window=None):
    b, h, n_q, d = q.shape
    n_kv = k.shape[2]
    h_kv = k.shape[1]
    group = h // h_kv
    num_q = cdiv(n_q, block_q)
    num_kv = cdiv(n_kv, block_k)

    # varlen: lengths ride scalar prefetch (PrefetchScalarGridSpec); index
    # maps gain a trailing lens arg, kernels get len_ref as first ref.
    varlen = kv_lengths is not None
    len_args = [kv_lengths.astype(jnp.int32)] if varlen else []

    def adapt(index_map, rank):
        # plain grid: `rank` args; scalar-prefetch grid: rank args + lens
        return (lambda *a: index_map(*a[:rank])) if varlen else index_map

    def bind(kern, **kw):
        return (functools.partial(kern, **kw) if varlen
                else functools.partial(kern, None, **kw))

    def make_call(kernel, grid, in_specs, out_specs, out_shape,
                  scratch_shapes):
        rank = len(grid)
        params = pltpu.CompilerParams(
            dimension_semantics=("parallel",) * 3 + ("arbitrary",) * (rank - 3))
        in_specs = [pl.BlockSpec(s.block_shape, adapt(s.index_map, rank))
                    for s in in_specs]
        out_specs = [pl.BlockSpec(s.block_shape, adapt(s.index_map, rank))
                     for s in out_specs]
        if varlen:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
                out_specs=out_specs, scratch_shapes=scratch_shapes)
            return pl.pallas_call(kernel, grid_spec=grid_spec,
                                  out_shape=out_shape,
                                  compiler_params=params,
                                  interpret=use_interpret_mode())
        return pl.pallas_call(kernel, grid=grid, in_specs=in_specs,
                              out_specs=out_specs, out_shape=out_shape,
                              scratch_shapes=scratch_shapes,
                              compiler_params=params,
                              interpret=use_interpret_mode())

    # di = rowsum(dO * O): tiny elementwise pass, XLA fuses it; shared by
    # both kernels (guide §7; reference computes D inside the kernel at
    # flashattention_kernel.cu:217-220).
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32),
                 axis=-1, keepdims=True)             # (b, h, n_q, 1)

    # dKV grid is (b, h_kv, kv_block, group, q_block): for a fixed KV block,
    # q blocks strictly before the diagonal are skipped -- clamp their index
    # map so the elided steps re-reference the diagonal block (no DMA).  A
    # sliding window also skips q blocks past every col's window (high
    # side).  The GQA query-head group rides an inner grid axis revisiting
    # the same dk/dv block, so dK/dV come out at h_kv granularity directly
    # (no per-q-head HBM intermediate, no XLA group-sum).
    if causal:
        def q_index(b_, hk_, i, g_, j):
            first = (i * block_k) // block_q
            j = jnp.maximum(j, first)
            if window is not None:
                last = ((i + 1) * block_k - 1 + (window - 1)) // block_q
                j = jnp.minimum(j, jnp.maximum(last, first))
            return (b_, hk_ * group + g_, j, 0)
    else:
        def q_index(b_, hk_, i, g_, j):
            return (b_, hk_ * group + g_, j, 0)

    q_spec = pl.BlockSpec((1, 1, block_q, d), q_index)
    kv_spec = pl.BlockSpec((1, 1, block_k, d),
                           lambda b_, hk_, i, g_, j: (b_, hk_, i, 0))
    stat_spec = pl.BlockSpec((1, 1, block_q, 1), q_index)

    dk, dv = make_call(
        bind(_bwd_dkv_kernel, causal=causal, sm_scale=sm_scale,
             block_q=block_q, block_k=block_k, num_q=num_q, group=group,
             window=window),
        grid=(b, h_kv, num_kv, group, num_q),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, stat_spec, stat_spec],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d),
                         lambda b_, hk_, i, g_, j: (b_, hk_, i, 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda b_, hk_, i, g_, j: (b_, hk_, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h_kv, n_kv, d), k.dtype),
            jax.ShapeDtypeStruct((b, h_kv, n_kv, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
    )(*len_args, q, k, v, do, lse, di)

    # dQ grid is (b, h, q_block, kv_block): above-diagonal KV blocks skipped,
    # plus (windowed) KV blocks left of every row's window.
    if causal:
        def kv_index2(b_, h_, i, j):
            last = ((i + 1) * block_q - 1) // block_k
            j = jnp.minimum(j, last)
            if window is not None:
                first = jnp.maximum(i * block_q - (window - 1), 0) // block_k
                j = jnp.maximum(j, jnp.minimum(first, last))
            return (b_, h_ // group, j, 0)
    else:
        def kv_index2(b_, h_, i, j):
            return (b_, h_ // group, j, 0)

    q_spec2 = pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i, j: (b_, h_, i, 0))
    kv_spec2 = pl.BlockSpec((1, 1, block_k, d), kv_index2)
    stat_spec2 = pl.BlockSpec((1, 1, block_q, 1), lambda b_, h_, i, j: (b_, h_, i, 0))

    (dq,) = make_call(
        bind(_bwd_dq_kernel, causal=causal, sm_scale=sm_scale,
             block_q=block_q, block_k=block_k, num_kv=num_kv, window=window),
        grid=(b, h, num_q, num_kv),
        in_specs=[q_spec2, kv_spec2, kv_spec2, q_spec2, stat_spec2,
                  stat_spec2],
        out_specs=[pl.BlockSpec((1, 1, block_q, d),
                                lambda b_, h_, i, j: (b_, h_, i, 0))],
        out_shape=[jax.ShapeDtypeStruct((b, h, n_q, d), q.dtype)],
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
    )(*len_args, q, k, v, do, lse, di)

    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public differentiable entry point
# ---------------------------------------------------------------------------


def _pick_blocks(n_q: int, n_kv: int, block_q: int, block_k: int,
                 d: Optional[int] = None):
    if d is not None and d > 128:
        # the kernels stage (block_q, block_k) f32 scores plus (block_q, d)
        # accumulators in scoped vmem (16MB): the (1024,1024) default that
        # wins at d=128 OOMs at d=256 (measured: sweep_reference HTTP 500) —
        # big head dims keep round 1's proven (512, 1024)
        block_q = min(block_q, 512)
    bq = largest_divisor_block(n_q, block_q, _MIN_BLOCK)
    bk = largest_divisor_block(n_kv, block_k, _MIN_BLOCK)
    return bq, bk


# Below this KV length XLA's fused op-graph attention beats the flash
# schedule (measured sweep, PERF.md: flash 0.09-0.5x at seq 128-512, 1.8-12x
# at seq >= 2048); "auto" dispatches on it.
MIN_KERNEL_KV_LEN = 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def flash_attention(
    q: Array,
    k: Array,
    v: Array,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    impl: str = "auto",
    window: Optional[int] = None,
    vmem_limit: Optional[int] = None,
) -> Array:
    """softmax(Q K^T / sqrt(d)) V without materialising the scores matrix.

    Args:
      q, k, v: (batch, heads, seq, head_dim).  kv seq may differ from q seq.
      causal: apply the triangular future mask (reference
        ``flash_attention_causal``, tensor_functions.py:501-516).
      sm_scale: score scale; defaults to 1/sqrt(head_dim)
        (flashattention_kernel.cu:278).
      impl: "auto" picks the measured-best path per shape: XLA's fused
        op-graph below kv_len 1024, the SUBROW kernel for causal dense
        self-attention at seq 1024-2048 / d=128 (whole K/V row resident,
        no online softmax), the q-major LOOP kernels at larger causal
        seq % 1024 == 0 / d == 128 (forward AND backward), and the grid
        kernels otherwise.  "pallas" forces the grid kernels, "loop" /
        "subrow" force those schedules, "reference" forces the jnp
        op-graph.
      window: sliding-window (local) attention — row i attends cols
        (i - window, i].  Requires ``causal=True``.  KV blocks wholly
        outside the window are skipped at the GRID level with their DMAs
        elided, so compute AND memory traffic are O(seq * window), in
        forward and both backward kernels.
      vmem_limit: override Mosaic's scoped-vmem budget (bytes) for the
        subrow schedules.  The dispatch defaults carry a grid-shape safety
        margin worth ~3-5%; the TIGHTEST limit that compiles for YOUR grid
        is fastest (e.g. 32MB at B4 H8 seq 4096 measures 158-159 TF vs the
        default's 148) but under-provisioning is a hard compile error —
        this knob hands that trade to the caller.

    Returns: (batch, heads, seq_q, head_dim).
    """
    o, _ = _flash_fwd_entry(q, k, v, causal, sm_scale, block_q, block_k,
                            impl, window, vmem_limit)
    return o


def repeat_kv(k: Array, v: Array, n_q_heads: int):
    """Broadcast GQA/MQA kv heads up to ``n_q_heads`` query heads.

    THE head-order convention: query head ``h`` reads kv head ``h // group``
    with ``group = n_q_heads // n_kv_heads`` — the same folding the Pallas
    kernels apply in their kv index maps and the backward applies in its
    dK/dV group-sum.  Every op-graph path must broadcast through this helper
    so the convention is pinned in one place.
    """
    group = n_q_heads // k.shape[1]
    if group == 1:
        return k, v
    return jnp.repeat(k, group, axis=1), jnp.repeat(v, group, axis=1)


def _check_heads(q, k, v):
    h, h_kv = q.shape[1], k.shape[1]
    if v.shape[1] != h_kv:
        raise ValueError(
            f"k has {h_kv} heads but v has {v.shape[1]}; they must match")
    if h_kv == 0 or h % h_kv != 0:
        raise ValueError(
            f"q heads ({h}) must be a positive multiple of kv heads "
            f"({h_kv}) for GQA/MQA grouping")


# Above Mosaic's 16MB default scoped-vmem budget the subrow kernels pass an
# explicit limit (v5e has 128MB physical VMEM/core).  The limit is a
# PERFORMANCE knob, not just a capacity one: Mosaic's allocation/pipelining
# choices degrade with headroom, so the TIGHTEST limit that compiles wins —
# fwd @4K measured 159.0 TF at 32MB vs 135.6 at 100MB (+17%), @8K 149.1 at
# 64MB vs 144.3 at 100MB; 32/48MB fail to compile at 8K
# (battery_logs/r4_limtune.log).
#
# r5 CAVEAT: the scoped demand varies ~10% with the GRID shape, not just
# the block (B8 H16 @4K wants 33.16M where B4 H8 fit 32M; B2 H16 @8K wants
# 71.66M where B4 H8 fit 64M — r5_sweep_prod.log / r5_vmem36.log), and an
# under-provisioned limit is a HARD compile failure for the user.  The
# production limits therefore carry margin over the tightest observed
# demand.  The tax is a step function AT the tight limit, not gradual
# (interleaved @B4H8, r5 limpick: 4K 32M=157.8 / 36M=149.5 / 40M=148.4;
# 8K 64M=149.4 / 72-80M=145.0-145.6) — any margin costs the same ~3-5%,
# so the margin size is chosen for safety, not speed.
_SUBROW_VMEM_4K = 40 * 1024 * 1024
_SUBROW_VMEM_8K = 80 * 1024 * 1024
# bwd holds four score-shaped intermediates (s/p, dp, ds) + dk/dv scratch:
# 48MB is its 4K floor at B4 H8 (142.7 TF vs 139.1 at 100MB) + grid margin.
_BWD_SUBROW_VMEM_4K = 56 * 1024 * 1024
# the varlen kernel's per-group iota/min masks need more headroom than the
# dense where-mask (72MB tightest at B4 H8 @8K, 131.5 TF, r5_varlen2.log);
# same grid margin policy
_VARLEN_SUBROW_VMEM_8K = 80 * 1024 * 1024


def _subrow_params(n):
    """(sub, vmem_limit) for the subrow forward: 512-row groups inside the
    default scoped-vmem budget at n <= 2048 (the r3-proven envelope);
    256-row groups + the tightest compiling raised limit above
    (battery_logs/r4_vmem_fwd.log, r4_limtune.log).

    sub=256 under a 24MB limit at 2K measured 137.8 in the r5 sweep but an
    interleaved confirm run put both configs at 124-136 TF across reps —
    statistically tied through relay noise (r5_varlen2.log confirm2k), so
    2K keeps the incumbent 512/default (~130 TF)."""
    if n <= 2048:
        return 512, None
    if n <= 4096:
        return 256, _SUBROW_VMEM_4K
    return 256, _SUBROW_VMEM_8K


def _subrow_ok(q, k, causal, window, impl):
    """Eligibility for the subrow schedule — the measured champion at EVERY
    seq it fits (vs the loop kernel: 131.9/97.6 @2K, 137.2/118.7 @4K,
    145.2/129.0 @8K; battery_logs/r3_subrow.log + r4_vmem_fwd.log): causal
    dense self-attention with the whole K/V row VMEM-resident.  16K
    overflows the raised 100MB budget (r4_vmem_bwd.log tail); d != 128
    unmeasured."""
    if impl not in ("auto", "subrow") or not causal or window is not None:
        return False
    n = q.shape[2]
    if not (n == k.shape[2] and q.shape[3] == 128 and 1024 <= n <= 8192
            and n % 512 == 0):
        return False
    # f32 doubles the whole-row + score footprint: n=2048 f32 fails Mosaic
    # compile even inside the default budget (measured on chip,
    # r5 probe — this had silently broken f32 training at 2K since r3),
    # and the raised limits above 2K are tuned tightest-compiling for
    # 2-byte dtypes.  f32 keeps subrow only at 1K; the loop schedule
    # serves it beyond.
    return n <= 1024 or q.dtype.itemsize <= 2


def _loop_block(q, k, causal, window, impl, blocks):
    """Block size for the q-major loop schedule, or None if the grid kernel
    should run instead.

    The loop kernels are the measured causal winners
    (battery_logs/r3_measure_fwd*.log: fwd 99/119/129 TF at 2/4/8K vs the
    grid's 84/106/117; bwd +20%), so ``impl="auto"`` routes eligible shapes
    through them: causal dense self-attention, seq divisible by the 1024
    block (smaller loop blocks measured SLOWER than the grid kernel), and a
    lane-aligned head dim (the manual (chunk, d) DMA slices need d % 128 ==
    0 to lower on Mosaic; sub-128 head dims keep the grid path).  Explicit
    ``impl="loop"`` trusts the caller's block size (tests drive small
    blocks in interpret mode).
    """
    if window is not None:
        return None
    n, n_kv = q.shape[2], k.shape[2]
    if causal and n != n_kv:
        return None
    if impl == "loop":
        bq = blocks[0]
        return bq if (n % bq == 0 and n_kv % bq == 0) else None
    # auto stays causal-only until the non-causal loop is measured a win
    if impl == "auto" and causal and q.shape[3] == 128:
        if q.dtype.itemsize <= 2 and n % 1024 == 0 and blocks[0] >= 1024:
            return 1024
        # f32 doubles the staged tiles: 1024 blocks fail Mosaic compile
        # (r5 probe); 512 is the smoke-proven f32 block
        if q.dtype.itemsize == 4 and n % 512 == 0 and blocks[0] >= 512:
            return 512
    return None


# Backward loop-kernel tuning (battery_logs/r3_measure_fwd4.log: block 1024,
# interior chunk = block, diagonal row groups of 256 won at every seq).
_BWD_LOOP_DIAG = 256

# Fused subrow-backward tuning (r4): 256-row groups won or tied at every
# seq (battery_logs/r4_vmem_bwd.log: 129.7/139.9/165.8 TF at 2/4/8K vs the
# loop schedule's 102.2/116.3/115.5 — the 7-dots-to-5 fusion plus zero
# chunk machinery; raw saturation at 8K is ~98% of the matmul roofline).
_BWD_SUBROW_SUB = 256


def _bwd_subrow_ok(q, k, causal, window, impl):
    """Eligibility for the fused one-kernel subrow backward: same envelope
    as the forward subrow gate.  GQA group size does not affect the
    footprint — the group rides the grid with per-step (1, 1, n, d) q/do/dq
    blocks and dk/dv accumulated in scratch across the group axis."""
    if impl not in ("auto", "subrow") or not causal or window is not None:
        return False
    n, d = q.shape[2], q.shape[3]
    if not (n == k.shape[2] and d == 128 and 1024 <= n <= 8192
            and n % 512 == 0):
        return False
    # same 2-byte gate as _subrow_ok (f32 @2K fails compile, r5 probe)
    return n <= 1024 or q.dtype.itemsize <= 2


def _pad128(t):
    d = t.shape[-1]
    return jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, 128 - d)))


def _pad128_ok(q, k, causal, window, impl):
    """Small-head-dim tier (the reference's flagship MT config is d=32,
    run_machine_translation.py:397-407): zero-pad d -> 128 and ride the
    champion subrow/loop schedules.

    On the MXU every dense mapping of d < 128 attention pays a 128/d waste
    factor — the score dot underfills the contraction depth, the PV dot the
    output lanes, and block-diagonal head-packing layouts cost identical
    FLOPs (the zeros are multiplied either way).  Zero-padding therefore
    achieves the optimal rate: champion_rate * d/128 useful — measured at
    its ceiling: d=64 62.4/79.8 TF at 2/4K (grid: 44.0/52.7), d=32
    33.3/39.5 (grid 19.8/25.8), d=16 19.6 (grid 13.2)
    (battery_logs/r5_pad_fp8_2lvl.log).  Scores and lse are exact (zero pad
    contributes nothing to q.k); padded dV/dK columns are discarded on
    slice."""
    if impl != "auto" or not causal or window is not None:
        return False
    n, d = q.shape[2], q.shape[3]
    if not (d < 128 and d % 8 == 0 and d >= 16):
        return False
    if not (n == k.shape[2] and n >= 1024 and n % 512 == 0):
        return False
    # the padded recursion lands on the subrow/loop kernels: same f32
    # envelope as _subrow_ok (f32 @2K subrow fails compile; the loop
    # serves f32 at n % 1024 == 0)
    return n <= 1024 or q.dtype.itemsize <= 2 or n % 1024 == 0


def _use_kernel(q, k, block_q, block_k, impl):
    if impl == "reference":
        return None
    bq, bk = _pick_blocks(q.shape[2], k.shape[2], block_q, block_k,
                          q.shape[3])
    if bq is None or bk is None:   # not tileable at all
        return None
    if impl == "auto" and k.shape[2] < MIN_KERNEL_KV_LEN:
        return None
    return bq, bk


def _flash_fwd_entry(q, k, v, causal, sm_scale, block_q, block_k,
                     impl="auto", window=None, vmem_limit=None):
    _check_heads(q, k, v)
    if window is not None:
        if not causal:
            raise ValueError("window (sliding-window attention) requires "
                             "causal=True")
        if window < 1:
            raise ValueError(f"window must be >= 1, got {window}")
    d = q.shape[-1]
    scale = sm_scale if sm_scale is not None else 1.0 / (d**0.5)
    blocks = _use_kernel(q, k, block_q, block_k, impl)
    if blocks is None:
        # jnp op-graph path (jitted & fused by XLA); lse kept for the vjp.
        return _reference_fwd_with_lse(q, k, v, causal, scale, window=window)
    if _subrow_ok(q, k, causal, window, impl):
        sub, lim = _subrow_params(q.shape[2])
        return _flash_fwd_subrow(q, k, v, sm_scale=scale, sub=sub,
                                 concat_mask=False,
                                 vmem_limit=vmem_limit or lim)
    if _pad128_ok(q, k, causal, window, impl):
        qp, kp, vp = (_pad128(t) for t in (q, k, v))
        o, lse = _flash_fwd_entry(qp, kp, vp, causal, scale, block_q,
                                  block_k, impl, window, vmem_limit)
        return o[..., :d], lse
    lb = _loop_block(q, k, causal, window, impl, blocks)
    if lb is not None:
        return _flash_fwd_loop(q, k, v, sm_scale=scale, block_q=lb,
                               causal=causal)
    return _flash_fwd(q, k, v, causal=causal, sm_scale=scale,
                      block_q=blocks[0], block_k=blocks[1], window=window)


def _reference_fwd_with_lse(q, k, v, causal, scale, kv_lengths=None,
                            window=None):
    k, v = repeat_kv(k, v, q.shape[1])  # GQA/MQA broadcast
    # preferred_element_type keeps bf16 scores in f32 end-to-end — without it
    # the einsum rounds s to bf16 and the ORACLE is less accurate than the
    # kernel (seen as ~4e-2 "kernel error" at seq 2048 bf16).
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    keep = None
    if causal:
        nq, nk = s.shape[-2:]
        keep = jnp.arange(nk)[None, :] <= jnp.arange(nq)[:, None]
        if window is not None:
            keep &= jnp.arange(nk)[None, :] > jnp.arange(nq)[:, None] - window
        s = jnp.where(keep, s, DEFAULT_MASK_VALUE)
    if kv_lengths is not None:
        nk = s.shape[-1]
        valid = jnp.arange(nk)[None, None, None, :] < kv_lengths[:, None, None, None]
        s = jnp.where(valid, s, DEFAULT_MASK_VALUE)
        keep = valid if keep is None else (keep & valid)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    if keep is not None and kv_lengths is not None:
        # Rows with NO live keys output 0 (the kernel's convention).  The
        # zeroing must use the COMBINED mask: a short varlen row whose
        # in-prefix keys are all outside the sliding window has m == MASK,
        # making every masked e equal 1 — zeroing only the kv_lengths
        # positions previously left such rows emitting a spurious uniform
        # average over the prefix (and its dV pollution in backward).
        e = jnp.where(keep, e, 0.0)
    l = jnp.sum(e, axis=-1, keepdims=True)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o = jnp.einsum("bhqk,bhkd->bhqd", (e / l_safe).astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    lse = jnp.where(l == 0.0, -jnp.inf, m + jnp.log(l_safe))
    return o.astype(q.dtype), lse


def _flash_vjp_fwd(q, k, v, causal, sm_scale, block_q, block_k, impl,
                   window, vmem_limit):
    o, lse = _flash_fwd_entry(q, k, v, causal, sm_scale, block_q, block_k,
                              impl, window, vmem_limit)
    return o, (q, k, v, o, lse)


def _flash_vjp_bwd(causal, sm_scale, block_q, block_k, impl, window,
                   vmem_limit, res, do):
    q, k, v, o, lse = res
    d = q.shape[-1]
    scale = sm_scale if sm_scale is not None else 1.0 / (d**0.5)
    blocks = _use_kernel(q, k, block_q, block_k, impl)
    if blocks is None:
        def f(q_, k_, v_):
            return _reference_fwd_with_lse(q_, k_, v_, causal, scale,
                                           window=window)[0]

        _, vjp = jax.vjp(f, q, k, v)
        return vjp(do)
    if _bwd_subrow_ok(q, k, causal, window, impl):
        di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32),
                     axis=-1, keepdims=True)
        n = q.shape[2]
        # r4_bwd.log: sub=512 wins at 1K (112.5 vs 107.6 TF), 256 at 2K+
        # (148.9 vs 143.3); the raised limit only where the default budget
        # overflows, and then the tightest compiling one (r4_limtune.log).
        sub = 512 if n <= 1024 else _BWD_SUBROW_SUB
        if n <= 2048:
            lim = None
        elif n <= 4096:
            lim = _BWD_SUBROW_VMEM_4K
        else:
            lim = _SUBROW_VMEM_8K
        return _flash_bwd_subrow(q, k, v, lse, di, do, sm_scale=scale,
                                 sub=sub, vmem_limit=vmem_limit or lim)
    if _pad128_ok(q, k, causal, window, impl):
        # small-head-dim tier: same zero-pad recursion as the forward; o's
        # padded columns are genuinely zero (v was zero there), so di and
        # the score chain are exact, and the padded dQ/dK/dV columns are
        # discarded on slice
        res_p = (_pad128(q), _pad128(k), _pad128(v), _pad128(o), lse)
        dq, dk, dv = _flash_vjp_bwd(causal, scale, block_q, block_k, impl,
                                    window, vmem_limit, res_p, _pad128(do))
        return dq[..., :d], dk[..., :d], dv[..., :d]
    lb = _loop_block(q, k, causal, window, impl, blocks)
    if lb is not None and causal:   # the loop backward is causal-only
        di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32),
                     axis=-1, keepdims=True)
        ds = _BWD_LOOP_DIAG if lb % _BWD_LOOP_DIAG == 0 and \
            lb > _BWD_LOOP_DIAG else 0
        return _flash_bwd_loop(q, k, v, lse, di, do, sm_scale=scale,
                               block=lb, diag_strip=ds)
    dq, dk, dv = _flash_bwd(q, k, v, o, lse, do, causal=causal, sm_scale=scale,
                            block_q=blocks[0], block_k=blocks[1],
                            window=window)
    return dq, dk, dv


flash_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention_reference(q, k, v, causal: bool = False,
                              sm_scale: Optional[float] = None,
                              kv_lengths: Optional[Array] = None,
                              window: Optional[int] = None) -> Array:
    """Pure-jnp oracle playing the role torch plays in the reference tests
    (tests/test_flash_attention.py:44-77)."""
    _check_heads(q, k, v)
    d = q.shape[-1]
    scale = sm_scale if sm_scale is not None else 1.0 / (d**0.5)
    return _reference_fwd_with_lse(q, k, v, causal, scale, kv_lengths,
                                   window)[0]


# ---------------------------------------------------------------------------
# Variable-length (padded batch) entry point
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def flash_attention_varlen(
    q: Array, k: Array, v: Array, kv_lengths: Array,
    causal: bool = False, sm_scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K,
    impl: str = "auto", window: Optional[int] = None,
) -> Array:
    """Flash attention over a PADDED batch: ``kv_lengths`` (B,) int32 gives
    each row's valid KV prefix; keys/values at positions >= length are
    masked out of the softmax in-kernel (no (B,H,Nq,Nkv) mask materialised
    — the capability the reference's fused softmax provides via an additive
    HBM mask, softmax_kernel.cu:232-292, fused here into the flash loop).

    Enables batched prefill (one step attends a whole ragged batch of
    prompts) and padded-batch training.  Differentiable in q/k/v.
    ``window`` composes sliding-window attention with the varlen masking
    (windowed batched prefill); requires causal.
    """
    o, _ = _varlen_fwd(q, k, v, kv_lengths, causal, sm_scale, block_q,
                       block_k, impl, window)
    return o


def _varlen_fwd(q, k, v, kv_lengths, causal, sm_scale, block_q, block_k,
                impl, window=None):
    _check_heads(q, k, v)
    if window is not None:
        if not causal:
            raise ValueError("window (sliding-window attention) requires "
                             "causal=True")
        if window < 1:
            raise ValueError(f"window must be >= 1, got {window}")
    d = q.shape[-1]
    scale = sm_scale if sm_scale is not None else 1.0 / (d**0.5)
    blocks = _use_kernel(q, k, block_q, block_k, impl)
    if blocks is None:
        return _reference_fwd_with_lse(q, k, v, causal, scale, kv_lengths,
                                       window)
    if _subrow_ok(q, k, causal, window, impl):
        # lengths only change the mask (not the footprint, modulo the 8K
        # limit bump) — the serving engine's batched prefill rides the
        # champion schedule too: 106/129/131 TF at 2/4/8K vs the grid
        # varlen kernel's 64/74/85 (battery_logs/r5_varlen2.log)
        sub, lim = _subrow_params(q.shape[2])
        if q.shape[2] > 4096:
            lim = _VARLEN_SUBROW_VMEM_8K
        return _flash_fwd_subrow_varlen(q, k, v, kv_lengths, sm_scale=scale,
                                        sub=sub, vmem_limit=lim)
    if _pad128_ok(q, k, causal, window, impl):
        o, lse = _varlen_fwd(_pad128(q), _pad128(k), _pad128(v), kv_lengths,
                             causal, scale, block_q, block_k, impl, window)
        return o[..., :d], lse
    return _flash_fwd(q, k, v, causal=causal, sm_scale=scale,
                      block_q=blocks[0], block_k=blocks[1],
                      kv_lengths=kv_lengths, window=window)


def _varlen_vjp_fwd(q, k, v, kv_lengths, causal, sm_scale, block_q, block_k,
                    impl, window):
    o, lse = _varlen_fwd(q, k, v, kv_lengths, causal, sm_scale, block_q,
                         block_k, impl, window)
    return o, (q, k, v, kv_lengths, o, lse)


def _varlen_vjp_bwd(causal, sm_scale, block_q, block_k, impl, window,
                    res, do):
    q, k, v, kv_lengths, o, lse = res
    d = q.shape[-1]
    scale = sm_scale if sm_scale is not None else 1.0 / (d**0.5)
    blocks = _use_kernel(q, k, block_q, block_k, impl)
    if blocks is None:
        def f(q_, k_, v_):
            return _reference_fwd_with_lse(q_, k_, v_, causal, scale,
                                           kv_lengths, window)[0]

        _, vjp = jax.vjp(f, q, k, v)
        dq, dk, dv = vjp(do)
        return dq, dk, dv, None
    if _pad128_ok(q, k, causal, window, impl):
        res_p = (_pad128(q), _pad128(k), _pad128(v), kv_lengths,
                 _pad128(o), lse)
        dq, dk, dv, _ = _varlen_vjp_bwd(causal, scale, block_q, block_k,
                                        impl, window, res_p, _pad128(do))
        return dq[..., :d], dk[..., :d], dv[..., :d], None
    dq, dk, dv = _flash_bwd(q, k, v, o, lse, do, causal=causal,
                            sm_scale=scale, block_q=blocks[0],
                            block_k=blocks[1], kv_lengths=kv_lengths,
                            window=window)
    return dq, dk, dv, None


flash_attention_varlen.defvjp(_varlen_vjp_fwd, _varlen_vjp_bwd)


def flash_attention_with_lse(
    q: Array, k: Array, v: Array, causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K,
    impl: str = "auto", window: Optional[int] = None,
):
    """Forward-only flash attention returning ``(o, lse)`` with lse shaped
    (b, h, n_q, 1).

    The log-sum-exp residual is what ring attention / context parallelism
    needs to merge partial results across sequence shards (guide §15-16) --
    the same (m, l) statistics the reference writes back to HBM
    (flashattention_kernel.cu:107-108), in FA-2 combined form.
    """
    return _flash_fwd_entry(q, k, v, causal, sm_scale, block_q, block_k,
                            impl, window)


def mha_attention(q, k, v, causal: bool = False, use_flash: bool = True) -> Array:
    """Multi-head attention entry matching reference MultiHeadAttention
    dispatch (modules_transfomer.py:109-202): flash path or op-graph path."""
    if use_flash:
        return flash_attention(q, k, v, causal)
    return flash_attention_reference(q, k, v, causal)

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

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024
# Strip width for mask-crossing tiles (0 = full-tile dots).  Flip after the
# on-chip sweep if a strip config wins: every default-config caller (models,
# serving, benches) picks it up.
DEFAULT_DIAG_SUBTILE = 0
# Below this sequence length the plain fused-softmax op-graph is faster than
# the flash schedule; the wrapper falls back to the jnp path.
_MIN_BLOCK = 8

# A/B toggle for on-chip measurement: set FLASH_NO_INTERIOR_SKIP=1 to mask
# every running tile unconditionally (no needs_mask branch) -- used to
# isolate the cost/benefit of pl.when tile branching vs always-iota+where.
import os as _os
_INTERIOR_SKIP = _os.environ.get("FLASH_NO_INTERIOR_SKIP", "") != "1"


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr,
                *, causal: bool, sm_scale: float, block_q: int, block_k: int,
                num_kv: int, window: Optional[int] = None,
                diag_subtile: int = 0):
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
            # Mask only tiles that actually contain masked elements
            # (diagonal crossings / window edges / varlen boundary blocks).
            # Interior tiles skip the iota+where entirely -- at the default
            # blocks the mask is a sizeable share of per-tile VPU time and
            # most running tiles are interior.
            row_min = qi * block_q
            row_max = row_min + block_q - 1
            col_min = ki * block_k
            col_max = col_min + block_k - 1
            needs_mask = False
            if causal:
                needs_mask |= col_max > row_min
            if window is not None:
                needs_mask |= row_max - window >= col_min
            if len_ref is not None:
                needs_mask |= col_min + block_k > row_len

            def mask_and_update(s, c0, width, v_blk):
                rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + row_min
                cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + c0
                keep = jnp.ones(s.shape, jnp.bool_)
                if causal:
                    keep &= cols <= rows
                if window is not None:
                    keep &= cols > rows - window
                if len_ref is not None:  # per-batch valid KV prefix
                    keep &= cols < row_len
                update(jnp.where(keep, s, DEFAULT_MASK_VALUE), keep, v_blk)

            if not _INTERIOR_SKIP:
                # A/B path: unconditional iota+where on every running tile
                # (round-1 schedule; keeps the dot un-predicated for Mosaic).
                mask_and_update(score(k), col_min, block_k, v)
                return

            @pl.when(needs_mask)
            def _masked():
                if not diag_subtile or diag_subtile >= block_k:
                    mask_and_update(score(k), col_min, block_k, v)
                    return
                # Sub-tile the boundary block: the diagonal crossing leaves
                # up to half of a (block_q, block_k) score tile fully masked
                # — MXU flops the grid-level skip can't recover because the
                # block is coarse.  Issue the dot per (block_q, diag_subtile)
                # column strip instead, skipping strips with no live element
                # (for causal at block_k=1024, subtile=256 this cuts the
                # causal overcompute from N*512 to N*128 score elements while
                # interior tiles keep the full-width dot's MXU efficiency).
                # Online-softmax updates are associative, so strip-wise
                # updates are exact.  Each strip re-checks whether IT crosses
                # a boundary: fully-live strips skip the iota+where too.
                ds = diag_subtile
                for j in range(block_k // ds):
                    c0 = col_min + j * ds
                    c_max = c0 + ds - 1
                    live = True
                    if causal:
                        live &= c0 <= row_max
                    if window is not None:
                        live &= c_max >= row_min - (window - 1)
                    if len_ref is not None:
                        live &= c0 < row_len

                    @pl.when(live)
                    def _strip(j=j, c0=c0, c_max=c_max):
                        k_sub = k[j * ds:(j + 1) * ds]
                        v_sub = v[j * ds:(j + 1) * ds]
                        s_sub = score(k_sub)
                        strip_masked = False
                        if causal:
                            strip_masked |= c_max > row_min
                        if window is not None:
                            strip_masked |= row_max - window >= c0
                        if len_ref is not None:
                            strip_masked |= c0 + ds > row_len

                        @pl.when(strip_masked)
                        def _m():
                            mask_and_update(s_sub, c0, ds, v_sub)

                        @pl.when(jnp.logical_not(strip_masked))
                        def _i():
                            update(s_sub, None, v_sub)

            @pl.when(jnp.logical_not(needs_mask))
            def _interior():
                update(score(k), None, v)
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
               kv_lengths=None, window=None, diag_subtile=0):
    if diag_subtile:
        if diag_subtile % 128:
            raise ValueError(
                f"diag_subtile ({diag_subtile}) must be a multiple of 128")
        if block_k % diag_subtile or diag_subtile >= block_k:
            # blocks may have been auto-shrunk for short seqs — strips that
            # don't tile the picked block_k are disabled, not an error
            diag_subtile = 0
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
            diag_subtile=diag_subtile,
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
        diag_subtile=diag_subtile,
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
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_dkv_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                    dk_ref, dv_ref,
                    dk_scr, dv_scr,
                    *, causal: bool, sm_scale: float, block_q: int, block_k: int,
                    num_q: int, group: int = 1,
                    window: Optional[int] = None,
                    diag_subtile: int = 0):
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
            # Interior-tile skip (same inequalities as the fwd kernel):
            # only diagonal-crossing / window-edge / varlen-boundary tiles
            # pay the iota+where mask.
            row_min = qi * block_q
            row_max = row_min + block_q - 1
            col_min = ki * block_k
            col_max = col_min + block_k - 1
            needs_mask = False
            if causal:
                needs_mask |= col_min + block_k - 1 > row_min
            if window is not None:
                needs_mask |= row_max - window >= col_min
            if len_ref is not None:
                needs_mask |= col_min + block_k > row_len

            def mask_and_accum(s, r0, q_blk, do_blk, lse_blk, di_blk):
                rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + r0
                cols = jax.lax.broadcasted_iota(
                    jnp.int32, s.shape, 1) + col_min
                keep = jnp.ones(s.shape, jnp.bool_)
                if causal:
                    keep &= cols <= rows
                if window is not None:
                    keep &= cols > rows - window
                if len_ref is not None:
                    keep &= cols < row_len
                accum(jnp.where(keep, s, DEFAULT_MASK_VALUE), keep,
                      q_blk, do_blk, lse_blk, di_blk)

            if not _INTERIOR_SKIP:
                mask_and_accum(score(q), row_min, q, do, lse, di)
                return

            @pl.when(needs_mask)
            def _masked():
                if not diag_subtile:
                    mask_and_accum(score(q), row_min, q, do, lse, di)
                    return
                # strip-wise boundary dots over the Q ROWS of the tile (the
                # kv block is the output here, so the diagonal crossing runs
                # along q): q strips wholly above the diagonal / past the
                # window contribute nothing and skip all four MXU dots;
                # dK/dV scratch accumulation is additive so strip-wise
                # updates are exact
                ds_w = diag_subtile
                for j in range(block_q // ds_w):
                    r0 = row_min + j * ds_w
                    r_max = r0 + ds_w - 1
                    live = True
                    if causal:
                        live &= r_max >= col_min
                    if window is not None:
                        live &= col_max >= r0 - (window - 1)

                    @pl.when(live)
                    def _strip(j=j, r0=r0, r_max=r_max):
                        sl = slice(j * ds_w, (j + 1) * ds_w)
                        q_sub, do_sub = q[sl], do[sl]
                        lse_sub, di_sub = lse[sl], di[sl]
                        strip_masked = False
                        if causal:
                            strip_masked |= col_max > r0
                        if window is not None:
                            strip_masked |= r_max - window >= col_min
                        if len_ref is not None:
                            strip_masked |= col_min + block_k > row_len

                        @pl.when(strip_masked)
                        def _m():
                            mask_and_accum(score(q_sub), r0, q_sub, do_sub,
                                           lse_sub, di_sub)

                        @pl.when(jnp.logical_not(strip_masked))
                        def _i():
                            accum(score(q_sub), None, q_sub, do_sub,
                                  lse_sub, di_sub)

            @pl.when(jnp.logical_not(needs_mask))
            def _interior():
                accum(score(q), None, q, do, lse, di)
        else:
            accum(score(q), None, q, do, lse, di)

    @pl.when(jnp.logical_and(gi == group - 1, qi == num_q - 1))
    def _finalize():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                   dq_ref, dq_scr,
                   *, causal: bool, sm_scale: float, block_q: int, block_k: int,
                   num_kv: int, window: Optional[int] = None,
                   diag_subtile: int = 0):
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
            # interior-tile skip, same inequalities as fwd/dKV
            row_min = qi * block_q
            row_max = row_min + block_q - 1
            col_min = ki * block_k
            needs_mask = False
            if causal:
                needs_mask |= col_min + block_k - 1 > row_min
            if window is not None:
                needs_mask |= row_max - window >= col_min
            if len_ref is not None:
                needs_mask |= col_min + block_k > row_len

            def mask_and_accum(s, c0, k_blk, v_blk):
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, s.shape, 0) + row_min
                cols = jax.lax.broadcasted_iota(
                    jnp.int32, s.shape, 1) + c0
                keep = jnp.ones(s.shape, jnp.bool_)
                if causal:
                    keep &= cols <= rows
                if window is not None:
                    keep &= cols > rows - window
                if len_ref is not None:
                    keep &= cols < row_len
                accum(jnp.where(keep, s, DEFAULT_MASK_VALUE), keep,
                      k_blk, v_blk)

            if not _INTERIOR_SKIP:
                mask_and_accum(score(k), col_min, k, v)
                return

            @pl.when(needs_mask)
            def _masked():
                if not diag_subtile:
                    mask_and_accum(score(k), col_min, k, v)
                    return
                # strip-wise boundary dots (see the fwd kernel): all three
                # MXU dots shrink to the live column strips; dq_scr
                # accumulation is additive so strip-wise updates are exact
                ds_w = diag_subtile
                for j in range(block_k // ds_w):
                    c0 = col_min + j * ds_w
                    c_max = c0 + ds_w - 1
                    live = True
                    if causal:
                        live &= c0 <= row_max
                    if window is not None:
                        live &= c_max >= row_min - (window - 1)
                    if len_ref is not None:
                        live &= c0 < row_len

                    @pl.when(live)
                    def _strip(j=j, c0=c0, c_max=c_max):
                        k_sub = k[j * ds_w:(j + 1) * ds_w]
                        v_sub = v[j * ds_w:(j + 1) * ds_w]
                        strip_masked = False
                        if causal:
                            strip_masked |= c_max > row_min
                        if window is not None:
                            strip_masked |= row_max - window >= c0
                        if len_ref is not None:
                            strip_masked |= c0 + ds_w > row_len

                        @pl.when(strip_masked)
                        def _m():
                            mask_and_accum(score(k_sub), c0, k_sub, v_sub)

                        @pl.when(jnp.logical_not(strip_masked))
                        def _i():
                            accum(score(k_sub), None, k_sub, v_sub)

            @pl.when(jnp.logical_not(needs_mask))
            def _interior():
                accum(score(k), None, k, v)
        else:
            accum(score(k), None, k, v)

    @pl.when(ki == num_kv - 1)
    def _finalize():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _flash_bwd(q, k, v, o, lse, do, *, causal, sm_scale, block_q, block_k,
               kv_lengths=None, window=None, diag_subtile=0):
    # Strip width applies per kernel where it divides the stripped block
    # axis (dQ strips block_k columns, dKV strips block_q rows).
    ds_dq = ds_dkv = 0
    if diag_subtile:
        if diag_subtile % 128:
            raise ValueError(
                f"diag_subtile ({diag_subtile}) must be a multiple of 128")
        if block_k % diag_subtile == 0 and diag_subtile < block_k:
            ds_dq = diag_subtile
        if block_q % diag_subtile == 0 and diag_subtile < block_q:
            ds_dkv = diag_subtile
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
             window=window, diag_subtile=ds_dkv),
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
             block_q=block_q, block_k=block_k, num_kv=num_kv, window=window,
             diag_subtile=ds_dq),
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


def _pick_blocks(n_q: int, n_kv: int, block_q: int, block_k: int):
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
    diag_subtile: int = DEFAULT_DIAG_SUBTILE,
) -> Array:
    """softmax(Q K^T / sqrt(d)) V without materialising the scores matrix.

    Args:
      q, k, v: (batch, heads, seq, head_dim).  kv seq may differ from q seq.
      causal: apply the triangular future mask (reference
        ``flash_attention_causal``, tensor_functions.py:501-516).
      sm_scale: score scale; defaults to 1/sqrt(head_dim)
        (flashattention_kernel.cu:278).
      impl: "auto" uses the Pallas kernel at kv_len >= 1024 and XLA's fused
        op-graph below (where the kernel's grid overhead loses to XLA —
        measured, PERF.md); "pallas" / "reference" force a path.
      window: sliding-window (local) attention — row i attends cols
        (i - window, i].  Requires ``causal=True``.  KV blocks wholly
        outside the window are skipped at the GRID level with their DMAs
        elided, so compute AND memory traffic are O(seq * window), in
        forward and both backward kernels.
      diag_subtile: 0 (off) or a multiple of 128 — issue mask-crossing
        (diagonal/window-edge/varlen-boundary) tiles' MXU dots in strips of
        this width, skipping strips with no live element.  Cuts the causal
        overcompute from max(block_q, block_k)/2 to diag_subtile/2 score
        columns per row while interior tiles keep the full-width dot.
        Applies to the forward kernel (column strips, when it divides
        block_k), the dQ kernel (column strips, ditto) and the dKV kernel
        (row strips, when it divides block_q).

    Returns: (batch, heads, seq_q, head_dim).
    """
    o, _ = _flash_fwd_entry(q, k, v, causal, sm_scale, block_q, block_k,
                            impl, window, diag_subtile)
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


def _use_kernel(q, k, block_q, block_k, impl):
    if impl == "reference":
        return None
    bq, bk = _pick_blocks(q.shape[2], k.shape[2], block_q, block_k)
    if bq is None or bk is None:   # not tileable at all
        return None
    if impl == "auto" and k.shape[2] < MIN_KERNEL_KV_LEN:
        return None
    return bq, bk


def _flash_fwd_entry(q, k, v, causal, sm_scale, block_q, block_k,
                     impl="auto", window=None, diag_subtile=0):
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
    return _flash_fwd(q, k, v, causal=causal, sm_scale=scale,
                      block_q=blocks[0], block_k=blocks[1], window=window,
                      diag_subtile=diag_subtile)


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
                   window, diag_subtile):
    o, lse = _flash_fwd_entry(q, k, v, causal, sm_scale, block_q, block_k,
                              impl, window, diag_subtile)
    return o, (q, k, v, o, lse)


def _flash_vjp_bwd(causal, sm_scale, block_q, block_k, impl, window,
                   diag_subtile, res, do):
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
    dq, dk, dv = _flash_bwd(q, k, v, o, lse, do, causal=causal, sm_scale=scale,
                            block_q=blocks[0], block_k=blocks[1],
                            window=window, diag_subtile=diag_subtile)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def flash_attention_varlen(
    q: Array, k: Array, v: Array, kv_lengths: Array,
    causal: bool = False, sm_scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K,
    impl: str = "auto", window: Optional[int] = None,
    diag_subtile: int = DEFAULT_DIAG_SUBTILE,
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
                       block_k, impl, window, diag_subtile)
    return o


def _varlen_fwd(q, k, v, kv_lengths, causal, sm_scale, block_q, block_k,
                impl, window=None, diag_subtile=0):
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
    return _flash_fwd(q, k, v, causal=causal, sm_scale=scale,
                      block_q=blocks[0], block_k=blocks[1],
                      kv_lengths=kv_lengths, window=window,
                      diag_subtile=diag_subtile)


def _varlen_vjp_fwd(q, k, v, kv_lengths, causal, sm_scale, block_q, block_k,
                    impl, window, diag_subtile):
    o, lse = _varlen_fwd(q, k, v, kv_lengths, causal, sm_scale, block_q,
                         block_k, impl, window, diag_subtile)
    return o, (q, k, v, kv_lengths, o, lse)


def _varlen_vjp_bwd(causal, sm_scale, block_q, block_k, impl, window,
                    diag_subtile, res, do):
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
    dq, dk, dv = _flash_bwd(q, k, v, o, lse, do, causal=causal,
                            sm_scale=scale, block_q=blocks[0],
                            block_k=blocks[1], kv_lengths=kv_lengths,
                            window=window, diag_subtile=diag_subtile)
    return dq, dk, dv, None


flash_attention_varlen.defvjp(_varlen_vjp_fwd, _varlen_vjp_bwd)


def flash_attention_with_lse(
    q: Array, k: Array, v: Array, causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K,
    impl: str = "auto", window: Optional[int] = None,
    diag_subtile: int = DEFAULT_DIAG_SUBTILE,
):
    """Forward-only flash attention returning ``(o, lse)`` with lse shaped
    (b, h, n_q, 1).

    The log-sum-exp residual is what ring attention / context parallelism
    needs to merge partial results across sequence shards (guide §15-16) --
    the same (m, l) statistics the reference writes back to HBM
    (flashattention_kernel.cu:107-108), in FA-2 combined form.
    """
    return _flash_fwd_entry(q, k, v, causal, sm_scale, block_q, block_k,
                            impl, window, diag_subtile)


def mha_attention(q, k, v, causal: bool = False, use_flash: bool = True) -> Array:
    """Multi-head attention entry matching reference MultiHeadAttention
    dispatch (modules_transfomer.py:109-202): flash path or op-graph path."""
    if use_flash:
        return flash_attention(q, k, v, causal)
    return flash_attention_reference(q, k, v, causal)

"""Compiled-mode smoke battery: every Pallas kernel at adversarial shapes.

The pytest suite runs on the virtual CPU mesh in interpret mode
(tests/conftest.py), which skips Mosaic lowering — block-shape constraint
violations only surface when compiling on a real chip (this caught
attn_softmax/layernorm failing at unaligned shapes).  Run this ON TPU after
touching any kernel:

    python kernel_bench/compile_smoke.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def check(name, got, want, tol):
    """tol bounds max|diff| / max|want| — relative, so bf16 output rounding
    (1 ulp = 0.8% of magnitude) doesn't read as kernel error."""
    w = jnp.asarray(want, jnp.float32)
    d = float(jnp.max(jnp.abs(jnp.asarray(got, jnp.float32) - w)))
    rel = d / (float(jnp.max(jnp.abs(w))) + 1e-9)
    status = "OK " if rel < tol else "FAIL"
    print(f"{status} {name}: max|diff|={d:.2e} rel={rel:.2e} (tol {tol})")
    return rel < tol


def main():
    import flashattn_tpu as ft
    from flashattn_tpu.ops.layernorm import layernorm
    from flashattn_tpu.ops.paged_attention import (
        paged_attention, paged_attention_reference)
    from flashattn_tpu.ops.quant import (
        QuantizedTensor, flash_attention_kv_int8, int8_weight_only_matmul,
        quantize_int8)
    from flashattn_tpu.ops.softmax import attn_softmax, attn_softmax_reference

    ok = True
    key = jax.random.PRNGKey(0)

    # -- flash attention: ragged/odd seqs, cross-attn, decode, dtypes ------
    for (nq, nkv, dtype, causal) in [
        (8, 8, jnp.float32, True),
        (37, 37, jnp.float32, True),        # non-tileable -> jnp fallback
        (327, 327, jnp.float32, True),      # full-dim blocks
        (654, 654, jnp.bfloat16, False),
        (2048, 2048, jnp.bfloat16, True),
        (128, 1024, jnp.float32, False),    # cross-attention
        (1, 512, jnp.bfloat16, False),      # single-query decode shape
    ]:
        q = jax.random.normal(key, (2, 4, nq, 64), dtype)
        k = jax.random.normal(key, (2, 4, nkv, 64), dtype)
        o = ft.flash_attention(q, k, k, causal, impl="pallas")
        ref = ft.flash_attention_reference(q, k, k, causal)
        ok &= check(f"flash fwd nq={nq} nkv={nkv} {dtype.__name__} c={causal}",
                    o, ref, 2e-2)
        if nq == nkv:
            g = jax.grad(lambda q: jnp.sum(
                ft.flash_attention(q, k, k, causal, impl="pallas").astype(jnp.float32)))(q)
            gr = jax.grad(lambda q: jnp.sum(
                ft.flash_attention_reference(q, k, k, causal).astype(jnp.float32)))(q)
            ok &= check(f"flash bwd nq={nq} {dtype.__name__}", g, gr, 5e-2)

    # q-major loop kernel (impl="loop"): manual double-buffered KV DMA with
    # a dynamic trip count + trace-time triangular diagonal strips.  Mosaic
    # lowering of the DMA slices and the strip writes into the f32 staging
    # tile only fails when compiling on-chip, hence the smoke coverage.
    # GATING: the loop kernel is a bench.py candidate and the intended
    # production causal path.
    for (dtype, nq, bq, hkv) in [(jnp.bfloat16, 2048, 1024, 4),
                                 (jnp.float32, 2048, 512, 4),
                                 (jnp.bfloat16, 4096, 1024, 2)]:  # GQA
        qs = jax.random.normal(key, (1, 4, nq, 128), dtype)
        ks = jax.random.normal(key, (1, hkv, nq, 128), dtype)
        o = ft.flash_attention(qs, ks, ks, True, impl="loop", block_q=bq)
        ref = ft.flash_attention_reference(qs, ks, ks, True)
        ok &= check(f"flash fwd loop {dtype.__name__} nq={nq} bq={bq} "
                    f"hkv={hkv}", o, ref, 2e-2)
    # non-causal loop variant (every chunk interior, last chunk piped),
    # incl. cross-attention with kv_len != q_len
    qs = jax.random.normal(key, (1, 4, 1024, 128), jnp.bfloat16)
    kcx = jax.random.normal(key, (1, 4, 2048, 128), jnp.bfloat16)
    o = ft.flash_attention(qs, kcx, kcx, False, impl="loop", block_q=1024)
    ref = ft.flash_attention_reference(qs, kcx, kcx, False)
    ok &= check("flash fwd loop non-causal cross", o, ref, 2e-2)
    # backward loop kernels (dq q-major + dkv transposed kv-major with
    # GQA group unroll and diagonal row groups) at the production config
    qs = jax.random.normal(key, (1, 4, 2048, 128), jnp.bfloat16)
    kg = jax.random.normal(key, (1, 2, 2048, 128), jnp.bfloat16)
    gl = jax.grad(lambda a, b: jnp.sum(ft.flash_attention(
        a, b, b, True, impl="loop").astype(jnp.float32)),
        argnums=(0, 1))(qs, kg)
    gr = jax.grad(lambda a, b: jnp.sum(ft.flash_attention_reference(
        a, b, b, True).astype(jnp.float32)), argnums=(0, 1))(qs, kg)
    ok &= check("flash bwd loop dq (GQA)", gl[0], gr[0], 5e-2)
    ok &= check("flash bwd loop dkv (GQA)", gl[1], gr[1], 5e-2)
    # auto dispatch routes eligible causal shapes through the r3 schedules
    # (subrow at this 2048/128 shape; loop at 4K+)
    o_auto = ft.flash_attention(qs, kg, kg, True)
    ok &= check("flash fwd auto->subrow", o_auto,
                ft.flash_attention_reference(qs, kg, kg, True), 2e-2)
    q4 = jax.random.normal(key, (1, 2, 4096, 128), jnp.bfloat16)
    ok &= check("flash fwd auto->subrow 4K (vmem100)",
                ft.flash_attention(q4, q4, q4, True),
                ft.flash_attention_reference(q4, q4, q4, True), 3e-2)
    ok &= check("flash fwd loop 4K",
                ft.flash_attention(q4, q4, q4, True, impl="loop"),
                ft.flash_attention_reference(q4, q4, q4, True), 3e-2)
    g4 = jax.grad(lambda a: jnp.sum(ft.flash_attention(
        a, a, a, True).astype(jnp.float32)))(q4)
    g4r = jax.grad(lambda a: jnp.sum(ft.flash_attention_reference(
        a, a, a, True).astype(jnp.float32)))(q4)
    ok &= check("flash bwd auto->subrow 4K (vmem100)", g4, g4r, 5e-2)
    # r5: f32 auto at 2-4K must compile — the subrow kernel and the
    # 1024-block loop both fail Mosaic for f32 (caught in r5: f32 training
    # at 2K had been broken since r3); auto now gives f32 subrow@1K only
    # and the 512-block loop beyond
    qf2 = jax.random.normal(key, (1, 2, 2048, 128), jnp.float32)
    of2 = ft.flash_attention(qf2, qf2, qf2, True)
    ok &= check("flash fwd auto f32 2K (loop512)", of2,
                ft.flash_attention_reference(qf2, qf2, qf2, True), 2e-2)
    gf2 = jax.grad(lambda a: jnp.sum(ft.flash_attention(a, a, a, True)))(qf2)
    gf2r = jax.grad(lambda a: jnp.sum(
        ft.flash_attention_reference(a, a, a, True)))(qf2)
    ok &= check("flash bwd auto f32 2K (loop512)", gf2, gf2r, 5e-2)
    # r4 fused subrow BACKWARD: auto routes group-1 2048/128 self-attention
    # grads through the one-kernel 5-dot schedule (_bwd_subrow_kernel)
    qs1 = jax.random.normal(key, (1, 2, 2048, 128), jnp.bfloat16)
    gs = jax.grad(lambda a: jnp.sum(ft.flash_attention(
        a, a, a, True).astype(jnp.float32)))(qs1)
    gsr = jax.grad(lambda a: jnp.sum(ft.flash_attention_reference(
        a, a, a, True).astype(jnp.float32)))(qs1)
    ok &= check("flash bwd auto->subrow fused", gs, gsr, 5e-2)
    # GQA group-4 at 1K stays inside the vmem gate
    kg1 = jax.random.normal(key, (1, 1, 1024, 128), jnp.bfloat16)
    qg1 = jax.random.normal(key, (1, 4, 1024, 128), jnp.bfloat16)
    gs = jax.grad(lambda b: jnp.sum(ft.flash_attention(
        qg1, b, b, True).astype(jnp.float32)))(kg1)
    gsr = jax.grad(lambda b: jnp.sum(ft.flash_attention_reference(
        qg1, b, b, True).astype(jnp.float32)))(kg1)
    ok &= check("flash bwd auto->subrow fused GQA dk", gs, gsr, 5e-2)
    # subrow fwd full-width-select mask variant (the 4K candidate)
    from flashattn_tpu.ops.flash_attention import _flash_fwd_subrow
    o_w, _ = _flash_fwd_subrow(qs1, qs1, qs1, sm_scale=128**-0.5,
                               sub=512, concat_mask=False)
    ok &= check("flash fwd subrow where-mask", o_w,
                ft.flash_attention_reference(qs1, qs1, qs1, True), 2e-2)
    # ... and the TP shim reaches the same path INSIDE shard_map (manual
    # DMA + semaphores under manual SPMD — verify it lowers on chip with a
    # 1-device mesh; multi-chip differs only in the collective-free split)
    from flashattn_tpu.parallel import create_mesh, sharded_flash_attention
    mesh1 = create_mesh((1, 1), ("data", "model"), jax.devices()[:1])
    o_sm = sharded_flash_attention(qs, kg, kg, True, mesh=mesh1)
    ok &= check("flash fwd loop under shard_map", o_sm,
                ft.flash_attention_reference(qs, kg, kg, True), 2e-2)

    # GQA: q heads grouped onto fewer kv heads (index-map folding)
    qg = jax.random.normal(key, (2, 8, 2048, 64), jnp.float32)
    kg = jax.random.normal(key, (2, 2, 2048, 64), jnp.float32)
    og = ft.flash_attention(qg, kg, kg, True, impl="pallas")
    refg = ft.flash_attention_reference(qg, kg, kg, True)
    ok &= check("GQA flash fwd 8q/2kv", og, refg, 2e-2)
    gg = jax.grad(lambda k: jnp.sum(ft.flash_attention(
        qg, k, k, True, impl="pallas")))(kg)
    ggr = jax.grad(lambda k: jnp.sum(ft.flash_attention_reference(
        qg, k, k, True)))(kg)
    ok &= check("GQA flash bwd dk", gg, ggr, 5e-2)

    # sliding window: block-skip + element mask, incl. fully-masked rows in
    # running blocks (window < block span) and window > seq (== full causal)
    for (n, win) in [(2048, 256), (2048, 1024), (1536, 100), (512, 8192)]:
        qw = jax.random.normal(key, (1, 4, n, 64), jnp.bfloat16)
        ow = ft.flash_attention(qw, qw, qw, True, impl="pallas", window=win)
        refw = ft.flash_attention_reference(qw, qw, qw, True, window=win)
        ok &= check(f"swa flash fwd n={n} w={win}", ow, refw, 2e-2)
    qw = jax.random.normal(key, (1, 4, 2048, 64), jnp.float32)
    gw = jax.grad(lambda q: jnp.sum(ft.flash_attention(
        q, q, q, True, impl="pallas", window=256)))(qw)
    gwr = jax.grad(lambda q: jnp.sum(ft.flash_attention_reference(
        q, q, q, True, window=256)))(qw)
    ok &= check("swa flash bwd", gw, gwr, 5e-2)

    # -- EXTERNAL oracle: jax.nn.dot_product_attention ----------------------
    # The repo's own jnp reference is the primary oracle; this cross-check
    # breaks the self-referential loop by agreeing with an implementation we
    # didn't write (VERDICT r1 item 8; mirrors the reference gating its
    # speed tests on torch, tests/test_flash_attention.py:75-77).
    def ext_oracle(q, k, v, causal, window=None):
        lws = (window - 1, 0) if window is not None else None
        out = jax.nn.dot_product_attention(
            q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2),
            is_causal=causal, local_window_size=lws)
        return out.swapaxes(1, 2)

    for (dtype, causal, window) in [(jnp.float32, True, None),
                                    (jnp.float32, False, None),
                                    (jnp.bfloat16, True, None),
                                    (jnp.bfloat16, True, 256)]:
        qx = jax.random.normal(key, (2, 4, 2048, 64), dtype)
        o = ft.flash_attention(qx, qx, qx, causal, impl="pallas",
                               window=window)
        ok &= check(
            f"EXT oracle {dtype.__name__} c={causal} w={window}",
            o, ext_oracle(qx, qx, qx, causal, window), 2e-2)

    # varlen flash: per-row KV-prefix masking, empty-row convention
    from flashattn_tpu.ops.flash_attention import flash_attention_varlen

    qv = jax.random.normal(key, (3, 2, 1024, 64), jnp.float32)
    lens = jnp.asarray([1024, 300, 0], jnp.int32)
    ov = flash_attention_varlen(qv, qv, qv, lens, True, impl="pallas")
    refv = ft.flash_attention_reference(qv, qv, qv, True, kv_lengths=lens)
    ok &= check("varlen flash fwd", ov[:2], refv[:2], 2e-2)
    ok &= check("varlen flash empty row", ov[2], jnp.zeros_like(ov[2]), 1e-9)
    gv = jax.grad(lambda q: jnp.sum(flash_attention_varlen(
        q, q, q, lens, True, impl="pallas")))(qv)
    gr = jax.grad(lambda q: jnp.sum(ft.flash_attention_reference(
        q, q, q, True, kv_lengths=lens)))(qv)
    ok &= check("varlen flash bwd", gv, gr, 5e-2)

    # r5: varlen SUBROW (serving-prefill champion route) — auto dispatches
    # causal d=128 bf16 through _flash_fwd_subrow_varlen, incl. the raised
    # vmem limit at 4K and a GQA case
    qsv = jax.random.normal(key, (2, 4, 2048, 128), jnp.bfloat16)
    ksv = jax.random.normal(key, (2, 2, 2048, 128), jnp.bfloat16)
    lens2 = jnp.asarray([2048, 700], jnp.int32)
    osv = flash_attention_varlen(qsv, ksv, ksv, lens2, True)
    refsv = ft.flash_attention_reference(qsv, ksv, ksv, True,
                                         kv_lengths=lens2)
    ok &= check("varlen subrow fwd GQA 2K", osv, refsv, 3e-2)
    qsv4 = jax.random.normal(key, (1, 1, 4096, 128), jnp.bfloat16)
    lens4 = jnp.asarray([3000], jnp.int32)
    osv4 = flash_attention_varlen(qsv4, qsv4, qsv4, lens4, True)
    refsv4 = ft.flash_attention_reference(qsv4, qsv4, qsv4, True,
                                          kv_lengths=lens4)
    ok &= check("varlen subrow fwd 4K (vmem32)", osv4, refsv4, 3e-2)

    # r5: small-head-dim pad128 tier (auto routes d<128 causal through
    # zero-pad -> subrow), fwd + the fused-subrow-backward grad interval
    qp64 = jax.random.normal(key, (2, 4, 1024, 64), jnp.bfloat16)
    op64 = ft.flash_attention(qp64, qp64, qp64, True)
    refp64 = ft.flash_attention_reference(qp64, qp64, qp64, True)
    ok &= check("pad128 fwd d=64 auto->subrow", op64, refp64, 3e-2)
    gp64 = jax.grad(lambda a: jnp.sum(
        ft.flash_attention(a, a, a, True).astype(jnp.float32)))(qp64)
    gp64r = jax.grad(lambda a: jnp.sum(
        ft.flash_attention_reference(a, a, a, True)
        .astype(jnp.float32)))(qp64)
    ok &= check("pad128 bwd d=64 auto->subrow", gp64, gp64r, 5e-2)
    qp32 = jax.random.normal(key, (1, 2, 2048, 32), jnp.bfloat16)
    op32 = ft.flash_attention(qp32, qp32, qp32, True)
    refp32 = ft.flash_attention_reference(qp32, qp32, qp32, True)
    ok &= check("pad128 fwd d=32 auto->subrow", op32, refp32, 3e-2)

    # r5: two-level 16K schedule (panels + online softmax across panels)
    from flashattn_tpu.ops.flash_attention import _flash_fwd_twolevel
    q2l = jax.random.normal(key, (1, 1, 8192, 128), jnp.bfloat16)
    o2l, _ = _flash_fwd_twolevel(q2l, q2l, q2l, sm_scale=128**-0.5,
                                 panel=2048, sub=256,
                                 vmem_limit=48 * 1024 * 1024)
    ref2l = ft.flash_attention_reference(q2l, q2l, q2l, True)
    ok &= check("two-level fwd 8K p2048", o2l, ref2l, 3e-2)

    # -- fused softmax (pallas path) at odd shapes --------------------------
    for shape in [(7, 8, 327, 327), (1, 1, 17, 33), (2, 2, 1, 2048),
                  (3, 8, 49, 49)]:
        x = jax.random.normal(key, shape) * 3.0
        o = attn_softmax(x, None, True, impl="pallas")
        ok &= check(f"softmax pallas {shape}", o,
                    attn_softmax_reference(x, None, True), 1e-5)
        g = jax.grad(lambda x: jnp.sum(
            attn_softmax(x, None, True, impl="pallas") ** 2))(x)
        gr = jax.grad(lambda x: jnp.sum(
            attn_softmax_reference(x, None, True) ** 2))(x)
        ok &= check(f"softmax pallas bwd {shape}", g, gr, 1e-4)

    # -- layernorm at odd rows/hidden (beyond reference envelopes) ----------
    for (n, h) in [(123, 517), (7, 4096 + 128), (2303, 1024), (8, 8)]:
        x = jax.random.normal(key, (n, h))
        gmm = jax.random.normal(jax.random.PRNGKey(2), (h,))
        bt = jax.random.normal(jax.random.PRNGKey(3), (h,))
        o = layernorm(x, gmm, bt)
        mu = x.mean(-1, keepdims=True)
        ref = (x - mu) / jnp.sqrt(x.var(-1, keepdims=True) + 1e-5) * gmm + bt
        ok &= check(f"layernorm {n}x{h}", o, ref, 1e-4)
        grads = jax.grad(lambda x, g, b: jnp.sum(layernorm(x, g, b) ** 2),
                         argnums=(0, 1, 2))(x, gmm, bt)
        ref_grads = jax.grad(
            lambda x, g, b: jnp.sum(
                ((x - x.mean(-1, keepdims=True))
                 / jnp.sqrt(x.var(-1, keepdims=True) + 1e-5) * g + b) ** 2),
            argnums=(0, 1, 2))(x, gmm, bt)
        for gg, rr, nm in zip(grads, ref_grads, "xgb"):
            ok &= check(f"layernorm bwd d{nm} {n}x{h}", gg, rr, 5e-3)

    # -- int8 weight-only matmul + int8 KV flash ----------------------------
    x = jax.random.normal(key, (256, 512), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(5), (512, 384), jnp.bfloat16)
    wq = quantize_int8(w, axis=0)
    o = int8_weight_only_matmul(x, wq)
    # f32 ground truth: dequantising to bf16 first would make the BASELINE
    # the lossy side (w rounds at 4e-3 relative).
    truth = jnp.dot(x.astype(jnp.float32),
                    wq.values.astype(jnp.float32) * wq.scales)
    rel = float(jnp.max(jnp.abs(o.astype(jnp.float32) - truth))
                / jnp.max(jnp.abs(truth)))
    print(("OK " if rel < 2e-2 else "FAIL") +
          f" int8 weight-only matmul: rel={rel:.2e} (tol 2e-2)")
    ok &= rel < 2e-2
    q = jax.random.normal(key, (2, 4, 327, 64), jnp.float32)
    kq = quantize_int8(q, axis=-1)
    o, _ = flash_attention_kv_int8(q, kq, kq, True)
    # the int8-MXU path also quantises q per row in-kernel; mirror it in the
    # oracle (rounding commutes with the scalar scale prefold)
    qd = quantize_int8(q, axis=-1).dequantize(jnp.float32)
    ref = ft.flash_attention_reference(qd, kq.dequantize(jnp.float32),
                                       kq.dequantize(jnp.float32), True)
    ok &= check("int8-KV flash odd seq", o, ref, 3e-2)

    # serving shape: D=128 bf16 activations over an int8 cache
    qb = jax.random.normal(key, (2, 4, 2048, 128), jnp.bfloat16)
    kqb = quantize_int8(qb.astype(jnp.float32), axis=-1)
    o, _ = flash_attention_kv_int8(qb, kqb, kqb, True)
    qbd = quantize_int8(qb.astype(jnp.float32), axis=-1).dequantize(jnp.float32)
    ref = ft.flash_attention_reference(qbd.astype(jnp.bfloat16),
                                       kqb.dequantize(jnp.float32),
                                       kqb.dequantize(jnp.float32), True)
    ok &= check("int8-KV flash D128 bf16", o, ref, 3e-2)

    # r4: the quantized subrow path at 4K rides the raised vmem limit
    qb4 = jax.random.normal(key, (1, 2, 4096, 128), jnp.bfloat16)
    kqb4 = quantize_int8(qb4.astype(jnp.float32), axis=-1)
    o, _ = flash_attention_kv_int8(qb4, kqb4, kqb4, True)
    qb4d = quantize_int8(qb4.astype(jnp.float32), axis=-1).dequantize(jnp.float32)
    ref = ft.flash_attention_reference(qb4d.astype(jnp.bfloat16),
                                       kqb4.dequantize(jnp.float32),
                                       kqb4.dequantize(jnp.float32), True)
    ok &= check("int8-KV subrow 4K (vmem100)", o, ref, 3e-2)

    # r5: 8K coverage — the bf16-tuned 64MB limit does NOT compile this
    # kernel (caught in r5 after the r4 limtune silently broke it); the
    # dispatch keeps 100MB at 8K
    qb8 = jax.random.normal(key, (1, 1, 8192, 128), jnp.bfloat16)
    kqb8 = quantize_int8(qb8.astype(jnp.float32), axis=-1)
    o, _ = flash_attention_kv_int8(qb8, kqb8, kqb8, True)
    qb8d = quantize_int8(qb8.astype(jnp.float32), axis=-1).dequantize(jnp.float32)
    ref = ft.flash_attention_reference(qb8d.astype(jnp.bfloat16),
                                       kqb8.dequantize(jnp.float32),
                                       kqb8.dequantize(jnp.float32), True)
    ok &= check("int8-KV subrow 8K (vmem100)", o, ref, 3e-2)

    # fp8 (e4m3) payloads through the same kernels
    from flashattn_tpu.ops.quant import quantize_fp8, quantize_int8_stochastic

    kq8 = quantize_fp8(q, axis=-1)
    o, _ = flash_attention_kv_int8(q, kq8, kq8, True)
    ref = ft.flash_attention_reference(q, kq8.dequantize(jnp.float32),
                                       kq8.dequantize(jnp.float32), True)
    ok &= check("fp8-KV flash odd seq", o, ref, 3e-2)
    # r5: fp8 at subrow-eligible shapes transcodes to int8 and rides the
    # int8-MXU subrow dots (110-158 TF vs 42-56 on the old loop route)
    kqb_f8 = quantize_fp8(qb.astype(jnp.float32), axis=-1)
    o, _ = flash_attention_kv_int8(qb, kqb_f8, kqb_f8, True)
    ref = ft.flash_attention_reference(qb, kqb_f8.dequantize(jnp.float32),
                                       kqb_f8.dequantize(jnp.float32), True)
    ok &= check("fp8-KV transcode->int8 subrow 2K", o, ref, 6e-2)
    wq8 = quantize_fp8(w, axis=0)
    o = int8_weight_only_matmul(x, wq8)
    truth8 = jnp.dot(x.astype(jnp.float32),
                     wq8.values.astype(jnp.float32) * wq8.scales)
    ok &= check("fp8 weight-only matmul", o, truth8, 2e-2)
    # stochastic quantisation at rows with no 8-aligned divisor
    xs = jax.random.normal(key, (654, 64))
    sq = quantize_int8_stochastic(xs, seed=3)
    ok &= check("stochastic int8 654 rows", sq.dequantize(), xs, 2e-2)

    # -- paged attention: GQA, short lengths, both variants, int8 pages -----
    Hq, Hkv, D, page = 8, 4, 64, 128
    kp = jax.random.normal(key, (Hkv, 64, page, D), jnp.bfloat16)
    qd = jax.random.normal(key, (4, Hq, D), jnp.bfloat16)
    lengths = jnp.asarray([1, 130, 128 * 7, 128 * 16], jnp.int32)
    pidx = jnp.arange(4 * 16, dtype=jnp.int32).reshape(4, 16)
    ref = paged_attention_reference(qd, kp, kp, lengths, pidx)
    for pipe in [True, False]:
        o = paged_attention(qd, kp, kp, lengths, pidx, pipelined=pipe)
        ok &= check(f"paged decode GQA pipelined={pipe}", o, ref, 2e-2)
    # D=128: the pipelined manual-DMA kernel is the default path for
    # lane-aligned head dims — it must be compiled and checked here (the
    # D=64 cases above silently take the grid path).
    kp128 = jax.random.normal(key, (Hkv, 64, page, 128), jnp.bfloat16)
    qd128 = jax.random.normal(key, (4, Hq, 128), jnp.bfloat16)
    ref128 = paged_attention_reference(qd128, kp128, kp128, lengths, pidx)
    o128 = paged_attention(qd128, kp128, kp128, lengths, pidx, pipelined=True)
    ok &= check("paged decode D=128 pipelined (manual DMA)", o128, ref128, 2e-2)

    # chunked (multi-token) decode: speculative verification primitive
    qc = jax.random.normal(key, (4, 4, Hq, 128), jnp.bfloat16)
    lens_c = jnp.asarray([45, 4, 130, 128 * 7], jnp.int32)  # incl. chunk
    refc = paged_attention_reference(qc, kp128, kp128, lens_c, pidx)
    for pipe in [True, False]:
        oc = paged_attention(qc, kp128, kp128, lens_c, pidx, pipelined=pipe)
        ok &= check(f"paged chunk=4 pipelined={pipe}", oc, refc, 2e-2)
    refcw = paged_attention_reference(qc, kp128, kp128, lens_c, pidx,
                                      window=64)
    ocw = paged_attention(qc, kp128, kp128, lens_c, pidx, window=64)
    ok &= check("paged chunk=4 window=64", ocw, refcw, 2e-2)
    # walk clamp: chunked-prefill padding can push lengths past the table
    # capacity — the pipelined walk must stop at the row's last page (an
    # unclamped pages_ref[b, 16] read is OOB on-chip) and stay correct
    lens_over = jnp.asarray([128 * 16 + 48, 40, 40, 40], jnp.int32)
    oco = paged_attention(qc, kp128, kp128, lens_over, pidx)
    refo = paged_attention_reference(qc, kp128, kp128, lens_over, pidx)
    ok &= check("paged chunk walk-clamp len>capacity", oco, refo, 2e-2)

    # sliding-window decode: pipelined walk starts mid-table (p0 > 0), grid
    # path skips out-of-window pages; window crossing a page boundary
    for win in (64, 300):
        refw = paged_attention_reference(qd128, kp128, kp128, lengths, pidx,
                                         window=win)
        for pipe in [True, False]:
            ow = paged_attention(qd128, kp128, kp128, lengths, pidx,
                                 pipelined=pipe, window=win)
            ok &= check(f"paged decode window={win} pipelined={pipe}",
                        ow, refw, 2e-2)

    ks = jnp.max(jnp.abs(kp.astype(jnp.float32)), -1, keepdims=True) / 127.0
    kp8 = jnp.round(kp.astype(jnp.float32) / ks).astype(jnp.int8)
    ref8 = paged_attention_reference(qd, kp8, kp8, lengths, pidx,
                                     k_scales=ks, v_scales=ks)
    o8 = paged_attention(qd, kp8, kp8, lengths, pidx, k_scales=ks, v_scales=ks)
    ok &= check("paged decode int8 pages (grid, D=64)", o8, ref8, 2e-2)
    # D=128 page=128 int8: rides the PIPELINED walk with scales streamed
    # alongside payload pages (the short-history bandwidth fix)
    ks128 = jnp.max(jnp.abs(kp128.astype(jnp.float32)), -1,
                    keepdims=True) / 127.0
    kp128_8 = jnp.round(kp128.astype(jnp.float32) / ks128).astype(jnp.int8)
    ref8p = paged_attention_reference(qd128, kp128_8, kp128_8, lengths, pidx,
                                      k_scales=ks128, v_scales=ks128)
    o8p = paged_attention(qd128, kp128_8, kp128_8, lengths, pidx,
                          k_scales=ks128, v_scales=ks128, pipelined=True)
    ok &= check("paged decode int8 pages pipelined", o8p, ref8p, 2e-2)
    refc8 = paged_attention_reference(qc, kp128_8, kp128_8, lens_c, pidx,
                                      k_scales=ks128, v_scales=ks128)
    oc8 = paged_attention(qc, kp128_8, kp128_8, lens_c, pidx,
                          k_scales=ks128, v_scales=ks128, pipelined=True)
    ok &= check("paged chunk=4 int8 pipelined", oc8, refc8, 2e-2)
    refw8 = paged_attention_reference(qd128, kp128_8, kp128_8, lengths, pidx,
                                      k_scales=ks128, v_scales=ks128,
                                      window=300)
    ow8 = paged_attention(qd128, kp128_8, kp128_8, lengths, pidx,
                          k_scales=ks128, v_scales=ks128, window=300)
    ok &= check("paged decode int8 window=300 pipelined", ow8, refw8, 2e-2)
    # fp8 pools ride the same quantized pipelined walk
    kp128_f8 = (kp128.astype(jnp.float32) / ks128).astype(jnp.float8_e4m3fn)
    reff8 = paged_attention_reference(qd128, kp128_f8, kp128_f8, lengths,
                                      pidx, k_scales=ks128, v_scales=ks128)
    of8 = paged_attention(qd128, kp128_f8, kp128_f8, lengths, pidx,
                          k_scales=ks128, v_scales=ks128, pipelined=True)
    ok &= check("paged decode fp8 pages pipelined", of8, reff8, 3e-2)

    # -- fused dropout (Pallas PRNG, r5 production op) -----------------------
    # Randomness means no oracle equality; check structure instead: every
    # output is either the kept value or the dropped one, keep fraction is
    # near 1-rate, and the BACKWARD regenerates the FORWARD's mask (the
    # zero-residual custom_vjp contract).
    from flashattn_tpu.ops.dropout import (
        fused_dropout, fused_dropout_act_bias, fused_dropout_res_bias)

    dkey = jax.random.PRNGKey(42)
    rate = 0.25
    n, dd = 1024, 512
    x = jax.random.normal(jax.random.PRNGKey(0), (n, dd), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (dd,), jnp.float32)
    r = jax.random.normal(jax.random.PRNGKey(2), (n, dd), jnp.float32)

    out = fused_dropout_res_bias(x, b, r, rate, dkey)
    kept_val = r + (x + b) / (1.0 - rate)
    is_kept = np.isclose(np.asarray(out), np.asarray(kept_val), atol=1e-5)
    is_drop = np.isclose(np.asarray(out), np.asarray(r), atol=1e-5)
    structural = bool(np.all(is_kept | is_drop))
    frac = float(is_kept.mean())
    ok &= check("fused dropout res_bias structure",
                jnp.float32(structural and abs(frac - 0.75) < 0.02),
                jnp.float32(1.0), 1e-6)
    # fwd/bwd mask agreement: dropped positions must have dx == 0, kept
    # dx == 1/(1-rate); dres == 1.  Positions with x+b ~ 0 can't be
    # classified kept/dropped from the output (a few per 512K normals) —
    # exclude them, like the act_bias check.
    clear_rb = np.abs(np.asarray(x + b)) / (1 - rate) > 1e-3
    g = jax.grad(lambda a, bb, rr: jnp.sum(
        fused_dropout_res_bias(a, bb, rr, rate, dkey)),
        argnums=(0, 1, 2))(x, b, r)
    dx = np.asarray(g[0])
    agree = bool(np.allclose(dx[clear_rb & ~is_kept], 0.0, atol=1e-6)
                 and np.allclose(dx[clear_rb & is_kept], 1.0 / (1 - rate),
                                 atol=1e-5))
    ok &= check("fused dropout mask fwd/bwd agreement",
                jnp.float32(agree), jnp.float32(1.0), 1e-6)
    ok &= check("fused dropout dbias = colsum dx",
                g[1], jnp.sum(jnp.asarray(dx), axis=0), 1e-3)
    ok &= check("fused dropout dresidual = ones",
                g[2], jnp.ones_like(r), 1e-6)

    # act_bias: recover the mask from the output, then check dx
    outa = fused_dropout_act_bias(x, b, rate, dkey, "gelu")
    u = np.asarray(x + b, np.float64)
    act = 0.5 * u * (1.0 + np.tanh(np.sqrt(2 / np.pi) * (u + 0.044715 * u**3)))
    kept_a = np.isclose(np.asarray(outa), act / (1 - rate),
                        atol=1e-4, rtol=1e-4)
    drop_a = np.isclose(np.asarray(outa), 0.0, atol=1e-6)
    ok &= check("fused dropout act_bias structure",
                jnp.float32(bool(np.all(kept_a | drop_a))
                            and abs(kept_a.mean() - 0.75) < 0.03),
                jnp.float32(1.0), 1e-6)
    ga = jax.grad(lambda a: jnp.sum(
        fused_dropout_act_bias(a, b, rate, dkey, "gelu")))(x)
    t = np.tanh(np.sqrt(2 / np.pi) * (u + 0.044715 * u**3))
    dact = 0.5 * (1 + t) + 0.5 * u * (1 - t * t) * np.sqrt(2 / np.pi) * (
        1 + 3 * 0.044715 * u * u)
    expect = np.where(kept_a, dact / (1 - rate), 0.0)
    # positions with act(u) ~ 0 (u near 0, where GELU' = 0.5) can't be
    # classified kept/dropped from the output — exclude them
    clear = np.abs(act) / (1 - rate) > 1e-3
    ok &= check("fused dropout act_bias dx",
                jnp.where(jnp.asarray(clear), ga, 0.0),
                jnp.asarray(np.where(clear, expect, 0.0), jnp.float32),
                2e-3)

    # plain fused dropout under bf16 (the production train dtype)
    xb = x.astype(jnp.bfloat16)
    ob = fused_dropout(xb, rate, dkey)
    kept_b = np.asarray(ob, np.float32) != 0.0
    ok &= check("fused dropout bf16 keep fraction",
                jnp.float32(abs(kept_b.mean() - 0.75) < 0.02),
                jnp.float32(1.0), 1e-6)

    print("\nALL OK" if ok else "\nFAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

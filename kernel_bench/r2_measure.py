"""Round-2 change measurements: mask-skip, int8-MXU, GQA bwd, int8 paged.

Runs the four VERDICT-r1 perf items' scoreboard numbers on the real chip.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u kernel_bench/r2_measure.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp

import flashattn_tpu as ft
from flashattn_tpu.utils.timing import device_loop_time

ROOFLINE = 175.0  # measured 8192^3 bf16 matmul TFLOP/s on this chip


def flash_block_sweep():
    print("== flash fwd causal bf16 B4 H8 D128: block sweep (mask-skip) ==")
    B, H, D = 4, 8, 128
    for N in (2048, 4096, 8192):
        q = jax.random.normal(jax.random.PRNGKey(0), (B, H, N, D), jnp.bfloat16)
        flops = 4 * B * H * N * N * D * 0.5
        raw_rows = []
        # causal overcompute ~= N*block_k/2 regardless of block_q, so small
        # block_k is the useful-fraction lever; large block_q keeps the MXU
        # fed and amortises the per-tile softmax update.  diag_subtile (ds)
        # keeps the big block_k on interior tiles and strips only the
        # boundary blocks — overcompute drops to ~N*ds/2 at full-width raw
        # efficiency.
        for (bq, bk, ds) in [(512, 1024, 0), (512, 512, 0), (256, 512, 0),
                             (1024, 1024, 0), (1024, 512, 0), (512, 256, 0),
                             (1024, 256, 0), (2048, 256, 0), (2048, 512, 0),
                             (256, 256, 0), (256, 128, 0),
                             (512, 1024, 256), (512, 1024, 128),
                             (1024, 1024, 256), (512, 512, 128),
                             (2048, 1024, 256), (1024, 512, 128)]:
            if bq > N or bk > N:
                continue
            try:
                t = device_loop_time(
                    lambda x: ft.flash_attention(x, x, x, True, block_q=bq,
                                                 block_k=bk, impl="pallas",
                                                 diag_subtile=ds),
                    (q,), iters=60)
            except Exception as e:
                print(f"  N={N} blocks=({bq},{bk}) ds={ds}: FAILED "
                      f"{type(e).__name__}: {e}")
                continue
            # raw = flops actually issued incl. masked-tile overcompute
            tf = flops / t / 1e12
            raw_rows.append((bq, bk, ds, t * 1e3, tf))
            print(f"  N={N} blocks=({bq},{bk}) ds={ds}: {t*1e3:7.3f} ms  "
                  f"{tf:6.1f} useful TFLOP/s ({tf/ROOFLINE*100:4.1f}% roof)")
        best = max(raw_rows, key=lambda r: r[4])
        print(f"  N={N} BEST blocks=({best[0]},{best[1]}) ds={best[2]} "
              f"{best[4]:.1f} TFLOP/s")

    # sliding window at long seq: strips cut BOTH edges' overcompute (the
    # PERF.md note: the gap to the O(n*w) ideal was diagonal-tile
    # granularity).  B=1 H=8 N=32768 w=1024, ms/call only.
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 32768, 128),
                          jnp.bfloat16)
    for (bq, bk, ds) in [(512, 1024, 0), (512, 1024, 256), (512, 512, 128),
                         (256, 256, 0)]:
        try:
            t = device_loop_time(
                lambda x: ft.flash_attention(x, x, x, True, block_q=bq,
                                             block_k=bk, impl="pallas",
                                             window=1024, diag_subtile=ds),
                (q,), iters=40)
            print(f"  N=32768 w=1024 blocks=({bq},{bk}) ds={ds}: "
                  f"{t*1e3:7.3f} ms")
        except Exception as e:
            print(f"  N=32768 w=1024 ({bq},{bk}) ds={ds}: FAILED "
                  f"{type(e).__name__}: {e}")


def int8_prefill():
    print("== int8-KV flash vs bf16 (prefill, causal, B4 H8 D128) ==")
    from flashattn_tpu.ops.quant import flash_attention_kv_int8, quantize_int8
    B, H, D = 4, 8, 128
    for N in (2048, 4096, 8192):
        q = jax.random.normal(jax.random.PRNGKey(0), (B, H, N, D), jnp.bfloat16)
        kq = quantize_int8(q.astype(jnp.float32), axis=-1)
        t_bf16 = device_loop_time(
            lambda x: ft.flash_attention(x, x, x, True, impl="pallas"),
            (q,), iters=60)
        t_int8 = device_loop_time(
            lambda x: flash_attention_kv_int8(x, kq, kq, True)[0],
            (q,), iters=60)
        flops = 4 * B * H * N * N * D * 0.5
        print(f"  N={N}: bf16 {t_bf16*1e3:7.3f} ms ({flops/t_bf16/1e12:5.1f} TF) "
              f"| int8-KV {t_int8*1e3:7.3f} ms ({flops/t_int8/1e12:5.1f} TF) "
              f"| int8/bf16 {t_bf16/t_int8:5.2f}x")


def gqa_bwd():
    print("== flash bwd TFLOP/s (causal bf16 D128): MHA vs GQA 8q/2kv ==")
    B, D = 4, 128
    for N in (2048, 4096):
        for (hq, hkv) in [(8, 8), (8, 2), (8, 1)]:
            q = jax.random.normal(jax.random.PRNGKey(0), (B, hq, N, D),
                                  jnp.bfloat16)
            kv = jax.random.normal(jax.random.PRNGKey(1), (B, hkv, N, D),
                                   jnp.bfloat16)

            def bwd(q, ds=0, bq=512, bk=1024):
                return jax.grad(lambda a, b: jnp.sum(
                    ft.flash_attention(a, b, b, True, None, bq, bk,
                                       "pallas", None, ds)
                    .astype(jnp.float32)), argnums=0)(q, kv)

            t = device_loop_time(jax.jit(bwd), (q,), iters=30)
            flops = 5 * 2 * B * hq * N * N * D * 0.5
            print(f"  N={N} {hq}q/{hkv}kv: {t*1e3:7.3f} ms  "
                  f"{flops/t/1e12:6.1f} TFLOP/s")
            # strip-dot backward variants (dQ col strips + dKV row strips)
            for (bq, bk, ds) in [(512, 1024, 256), (512, 512, 128)]:
                try:
                    t = device_loop_time(
                        jax.jit(functools.partial(bwd, ds=ds, bq=bq, bk=bk)),
                        (q,), iters=30)
                    print(f"  N={N} {hq}q/{hkv}kv ds={ds} ({bq},{bk}): "
                          f"{t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TFLOP/s")
                except Exception as e:
                    print(f"  N={N} {hq}q/{hkv}kv ds={ds}: FAILED "
                          f"{type(e).__name__}: {e}")


def paged_int8():
    print("== paged decode µs/step (B16 8kv D128 page128): int8 pipelined ==")
    from flashattn_tpu.ops.paged_attention import paged_attention
    B, Hq, Hkv, D, page = 16, 8, 8, 128, 128
    n_pages_total = B * 64
    kp = jax.random.normal(jax.random.PRNGKey(0),
                           (Hkv, n_pages_total, page, D), jnp.bfloat16)
    ks = jnp.max(jnp.abs(kp.astype(jnp.float32)), -1, keepdims=True) / 127.0
    kp8 = jnp.round(kp.astype(jnp.float32) / ks).astype(jnp.int8)
    pidx = jnp.arange(B * 64, dtype=jnp.int32).reshape(B, 64)
    q = jax.random.normal(jax.random.PRNGKey(1), (B, Hq, D), jnp.bfloat16)
    # page pools are passed through device_loop_time's args (jit ARGUMENTS)
    # rather than closed over: a closed-over 256MB pool embeds as an HLO
    # constant and the remote compile rejects the request (HTTP 413).
    for hist in (1024, 8192):
        lengths = jnp.full((B,), hist, jnp.int32)
        for label, pages, scales, pipe in [
            ("bf16 pipelined", kp, None, True),
            ("int8 pipelined", kp8, ks, True),
            ("int8 grid", kp8, ks, False),
        ]:
            t = device_loop_time(
                lambda x, p, pi, le: paged_attention(
                    x, k_pages=p, v_pages=p, lengths=le, page_indices=pi,
                    k_scales=scales, v_scales=scales, pipelined=pipe),
                (q, pages, pidx, lengths), iters=40)
            itemsize = pages.dtype.itemsize
            bw = 2 * Hkv * hist * D * B * itemsize / t / 1e9
            print(f"  hist={hist} {label:15s}: {t*1e6:7.1f} µs  "
                  f"({bw:5.0f} GB/s payload)")
        # windowed int8 (the serving config)
        t = device_loop_time(
            lambda x, p, pi, le: paged_attention(
                x, p, p, le, pi, k_scales=ks, v_scales=ks, window=1024),
            (q, kp8, pidx, lengths), iters=40)
        print(f"  hist={hist} int8 window=1024 : {t*1e6:7.1f} µs")


if __name__ == "__main__":
    for fn in (flash_block_sweep, int8_prefill, gqa_bwd, paged_int8):
        try:
            fn()
        except Exception as e:  # keep the remaining sections' measurements
            print(f"SECTION {fn.__name__} FAILED: {type(e).__name__}: {e}")

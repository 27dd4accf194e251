"""Quantized-path measurements: int8-KV prefill and int8 paged decode.

(The round-2 block sweep and GQA-backward sections were superseded by the
r3 loop-kernel harness, kernel_bench/r3_measure.py, when the diag_subtile
strip API they exercised was removed as a measured loss.)

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


def int8_prefill():
    print("== int8-KV flash vs bf16 (prefill, causal, B4 H8 D128) ==")
    # int8-KV now routes causal tileable shapes through the quantized loop
    # schedule (quant.py::_kv8_flash_loop); the honest denominator is the
    # BEST bf16 path (the bf16 loop kernel), not the old grid kernel.
    from flashattn_tpu.ops.quant import flash_attention_kv_int8, quantize_int8
    B, H, D = 4, 8, 128
    for N in (2048, 4096, 8192):
        q = jax.random.normal(jax.random.PRNGKey(0), (B, H, N, D), jnp.bfloat16)
        kq = quantize_int8(q.astype(jnp.float32), axis=-1)
        t_bf16 = device_loop_time(
            lambda x: ft.flash_attention(x, x, x, True, impl="loop"),
            (q,), iters=60)
        t_int8 = device_loop_time(
            lambda x: flash_attention_kv_int8(x, kq, kq, True)[0],
            (q,), iters=60)
        flops = 4 * B * H * N * N * D * 0.5
        print(f"  N={N}: bf16-loop {t_bf16*1e3:7.3f} ms "
              f"({flops/t_bf16/1e12:5.1f} TF) "
              f"| int8-KV-loop {t_int8*1e3:7.3f} ms "
              f"({flops/t_int8/1e12:5.1f} TF) "
              f"| int8/bf16 {t_bf16/t_int8:5.2f}x")


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
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="",
                    help="comma-separated section names to run")
    args = ap.parse_args()
    sections = (int8_prefill, paged_int8)
    if args.only:
        wanted = set(args.only.split(","))
        sections = [f for f in sections if f.__name__ in wanted]
    for fn in sections:
        try:
            fn()
        except Exception as e:  # keep the remaining sections' measurements
            print(f"SECTION {fn.__name__} FAILED: {type(e).__name__}: {e}")

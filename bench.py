"""Headline benchmark: Pallas flash-attention throughput on the real chip.

Mirrors the reference's own headline measurement -- naive op-graph attention
vs FlashAttention forward latency (tests/speed_test_flash_attention.py:10-87,
run on V100s) -- re-staged on TPU.  Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value        = achieved TFLOP/s of the flash-attention forward kernel
               (batch 4, 8 heads, seq 2048, head_dim 128, causal, bf16)
vs_baseline  = speedup over the XLA op-graph attention (softmax(qk^T)v, the
               reference's "naive minitorch path" equivalent) at the same
               shape/dtype on the same chip.

Timing methodology: the kernel is chained ``iters`` times inside ONE jitted
``lax.scan`` (each iteration data-depends on the last) and a single scalar is
pulled to host -- device wall time, immune to async-dispatch undercounting
(block_until_ready does not block through the axon relay) and to the slow
relay transfer path.  Reference points measured on this chip: XLA 8192^3
bf16 matmul = 121.5 TFLOP/s; jax.experimental's production flash kernel at
this exact shape = 27.3 TFLOP/s (ours: ~27).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def device_loop_time(fn, x, iters=30):
    """Median-free single measurement of fn chained iters times on device."""

    @jax.jit
    def loop(x):
        def body(c, _):
            return fn(c).astype(x.dtype), None

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out[(0,) * out.ndim].astype(jnp.float32)

    np.asarray(loop(x))  # compile + warm
    best = float("inf")
    for _ in range(3):  # best-of-3 to damp relay jitter
        t0 = time.perf_counter()
        np.asarray(loop(x))  # one device program, one scalar transfer
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import flashattn_tpu as ft

    B, H, N, D = 4, 8, 2048, 128
    causal = True
    dtype = jnp.bfloat16

    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, N, D), dtype)

    t_flash = device_loop_time(lambda x: ft.flash_attention(x, x, x, causal), q)
    t_naive = device_loop_time(
        lambda x: ft.flash_attention_reference(x, x, x, causal), q
    )

    # 2 matmuls x 2 flops, causal halves the useful work.
    flops = 4 * B * H * N * N * D * (0.5 if causal else 1.0)
    tflops = flops / t_flash / 1e12

    print(json.dumps({
        "metric": f"flash_attention fwd TFLOP/s (causal bf16 B{B} H{H} N{N} D{D}, {jax.devices()[0].device_kind})",
        "value": round(tflops, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(t_naive / t_flash, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())

"""Headline benchmark: Pallas flash-attention throughput on the real chip.

Mirrors the reference's own headline measurement -- naive op-graph attention
vs FlashAttention forward latency (tests/speed_test_flash_attention.py:10-87,
run on V100s) -- re-staged on TPU.  Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value        = achieved TFLOP/s of the flash-attention forward kernel
               (batch 4, 8 heads, seq 2048, head_dim 128, causal, bf16),
               counting useful (below-diagonal) flops only.
vs_baseline  = speedup over the XLA op-graph attention (softmax(qk^T)v, the
               reference's "naive minitorch path" equivalent) at the same
               shape/dtype on the same chip.

Timing methodology: the kernel is chained inside ONE jitted ``lax.scan``
(each iteration data-depends on the last) at two chain lengths (N and 3N);
per-call time is the slope (t_3N - t_N) / 2N.  A single total/N quotient is
wrong here: each dispatch through the axon relay carries a constant ~25ms
round-trip latency which would dominate and understate throughput ~3x.

Reference points measured on this chip with this methodology (v5e-1):
XLA 8192^3 bf16 matmul = 175 TFLOP/s; XLA naive attention at the bench
shape = 22.2 TFLOP/s; jax.experimental.pallas production flash kernel
(default blocks) = 17.4 TFLOP/s; this framework = ~130-134 TFLOP/s causal
at the bench shape (subrow schedule; 145-158 at 4-8K, 144-148 at 16-32K
via the loop kernels; ~144 non-causal; r5 headline re-run 131.65).
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp


def main():
    # Fail fast if the TPU relay is unreachable: backend init otherwise
    # hangs indefinitely on the first dispatch (no traceback), eating the
    # caller's entire timeout. Probe in a watchdog thread.
    import threading

    probed = threading.Event()

    def probe():
        jax.devices()
        probed.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    if not probed.wait(timeout=180):
        print(json.dumps({
            "metric": "flash_attention fwd TFLOP/s (causal bf16)",
            "value": None, "unit": "TFLOP/s", "vs_baseline": None,
            "error": "TPU relay unreachable (backend init timed out)",
        }))
        import os
        os._exit(1)

    import flashattn_tpu as ft
    from flashattn_tpu.utils.timing import device_loop_time

    B, H, N, D = 4, 8, 2048, 128
    causal = True
    dtype = jnp.bfloat16

    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, N, D), dtype)

    # Self-select among a small set of causal schedules (each candidate is
    # one extra remote compile; the winner is what a production config sweep
    # would pin).  r3 sweeps: the SUBROW schedule (whole K/V row resident,
    # single-pass softmax per q row group) wins at 2K (133.8 TF), the
    # q-major loop kernel at 4K+ (118-148 TF), grid (1024,1024) is the
    # fallback (battery_logs/r3_subrow.log, r3_measure_fwd*.log).
    candidates = [("subrow", 1024, 1024), ("loop", 1024, 1024),
                  ("pallas", 1024, 1024)]
    best = None
    for (impl, bq, bk) in candidates:
        try:
            t = device_loop_time(
                lambda x: ft.flash_attention(x, x, x, causal, block_q=bq,
                                             block_k=bk, impl=impl),
                (q,), iters=100)
        except Exception as e:  # a candidate failing to lower must not
            print(f"# candidate ({impl},{bq},{bk}) failed: {e}",
                  file=sys.stderr)  # kill the headline measurement
            continue
        if best is None or t < best[0]:
            best = (t, impl, bq, bk)
    if best is None:  # every candidate failed: still print ONE JSON line
        print(json.dumps({
            "metric": "flash_attention fwd TFLOP/s (causal bf16)",
            "value": None, "unit": "TFLOP/s", "vs_baseline": None,
            "error": "all flash candidates failed to compile/run",
        }))
        return 1
    t_flash, impl, bq, bk = best
    t_naive = device_loop_time(
        lambda x: ft.flash_attention_reference(x, x, x, causal), (q,), iters=40)

    # 2 matmuls x 2 flops, causal halves the useful work.
    flops = 4 * B * H * N * N * D * (0.5 if causal else 1.0)
    tflops = flops / t_flash / 1e12

    print(json.dumps({
        "metric": f"flash_attention fwd TFLOP/s (causal bf16 B{B} H{H} N{N} D{D}, {jax.devices()[0].device_kind})",
        "value": round(tflops, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(t_naive / t_flash, 3),
        "config": f"impl={impl} block_q={bq} block_k={bk}",
    }))


if __name__ == "__main__":
    sys.exit(main())

"""Follow-up to r2_measure: interior-skip A/B + unswept big-block configs.

The first sweep showed (1024,1024) ds=0 winning every causal N and every
diag_subtile strip variant losing badly -- and (512,1024) running 15-23%
slower than its round-1 measurement.  Hypothesis: the needs_mask pl.when
branch costs more than the iota+where it skips (predication around the
main dot interferes with Mosaic pipelining).  This script measures:

  leg A (interior-skip ON, current default): the big-block configs the
    sweep missed + a non-causal check;
  leg B (FLASH_NO_INTERIOR_SKIP=1 subprocess): the two leading configs,
    unconditional iota+where on every running tile (round-1 schedule).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u kernel_bench/r2_followup.py
"""

import os
import subprocess
import sys

_CHILD = os.environ.get("_R2F_CHILD", "")

if not _CHILD:
    print("=== leg A: interior-skip ON (current default) ===")
    sys.stdout.flush()
    rc = subprocess.call(
        [sys.executable, "-u", os.path.abspath(__file__)],
        env=dict(os.environ, _R2F_CHILD="A"))
    print("=== leg B: interior-skip OFF (unconditional mask) ===")
    sys.stdout.flush()
    rc |= subprocess.call(
        [sys.executable, "-u", os.path.abspath(__file__)],
        env=dict(os.environ, _R2F_CHILD="B", FLASH_NO_INTERIOR_SKIP="1"))
    sys.exit(rc)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import flashattn_tpu as ft
from flashattn_tpu.ops import flash_attention as fa_mod
from flashattn_tpu.utils.timing import device_loop_time

ROOFLINE = 175.0
print(f"interior_skip={fa_mod._INTERIOR_SKIP}")

B, H, D = 4, 8, 128
if _CHILD == "A":
    causal_configs = [(2048, 1024), (1024, 2048), (2048, 2048)]
else:
    causal_configs = [(512, 1024), (1024, 1024)]

for N in (2048, 8192):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, N, D), jnp.bfloat16)
    flops = 4 * B * H * N * N * D * 0.5
    for (bq, bk) in causal_configs:
        if bq > N or bk > N:
            continue
        try:
            t = device_loop_time(
                lambda x: ft.flash_attention(x, x, x, True, block_q=bq,
                                             block_k=bk, impl="pallas"),
                (q,), iters=60)
        except Exception as e:
            print(f"  N={N} ({bq},{bk}): FAILED {type(e).__name__}: {e}")
            continue
        tf = flops / t / 1e12
        print(f"  N={N} causal ({bq},{bk}): {t*1e3:7.3f} ms  {tf:6.1f} TF "
              f"({tf/ROOFLINE*100:4.1f}%)")

# non-causal checks: leg A at the sweep winner (vs r1's 126 TF @2K),
# leg B at the r1 default (pure regression check).
nc = (1024, 1024) if _CHILD == "A" else (512, 1024)
for N in (2048,):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, N, D), jnp.bfloat16)
    flops = 4 * B * H * N * N * D
    t = device_loop_time(
        lambda x: ft.flash_attention(x, x, x, False, block_q=nc[0],
                                     block_k=nc[1], impl="pallas"),
        (q,), iters=60)
    tf = flops / t / 1e12
    print(f"  N={N} full   {nc}: {t*1e3:7.3f} ms  {tf:6.1f} TF "
          f"({tf/ROOFLINE*100:4.1f}%)")

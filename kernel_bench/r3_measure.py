"""Round-3 flash measurement: q-major loop kernels vs grid kernels.

The r3_followup A/B root-caused round 2's regression (interior-skip
branching, ~18%) and showed a single big masked dot reaching ~95% of the
matmul roofline.  The loop kernels (ops/flash_attention.py) restructure
causal attention around that: no skipped grid steps, no branches, manual
double-buffered interior DMA, trace-time triangular diagonal handling.
Diagonal modes measured here: full-diag (ds=0, one masked full-width dot)
vs row groups (disjoint-slice updates, (G+1)/2G of the tile's MXU work).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u kernel_bench/r3_measure.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import flashattn_tpu as ft
from flashattn_tpu.ops import flash_attention as fa
from flashattn_tpu.utils.timing import device_loop_time

ROOFLINE = 175.0
B, H, D = 4, 8, 128

# -- on-chip correctness gate ------------------------------------------------
# bf16 at the bench shape carries ~3e-2 max-abs output rounding SHARED with
# the grid kernel (both are 0.03125 vs the oracle; loop-vs-grid agrees to
# 5e-7 in f32) — so gate on loop-vs-grid in f32, the schedule-equivalence
# check, not on the oracle's bf16 tail.  Row groups keep one update per row,
# so agreement stays tight.
# (f32 at bq=1024 exceeds the 16MB scoped-vmem compile limit; bq=512
# exercises identical code paths — multiple interior chunks + all diagonal
# row-group widths.)
qf = jax.random.normal(jax.random.PRNGKey(0), (B, H, 2048, D), jnp.float32)
grid_o = ft.flash_attention(qf, qf, qf, True, impl="pallas",
                            block_q=512, block_k=512)
for ds in (0, 256, 128):
    loop_o, _ = fa._flash_fwd_loop(qf, qf, qf, sm_scale=D**-0.5,
                                   block_q=512, diag_strip=ds)
    err = float(jnp.max(jnp.abs(loop_o - grid_o)))
    print(f"loop fwd bq512 ds={ds} on-chip f32 max err vs grid: {err:.3e}")
    if err > 2e-3:
        print("CORRECTNESS FAIL -- not measuring a wrong kernel")
        sys.exit(1)
# backward: loop dq/dk/dv vs grid backward, f32
dox = jnp.ones_like(qf)
o, lse = fa._flash_fwd_entry(qf, qf, qf, True, None, 512, 512, "pallas")
di = jnp.sum(o * dox, axis=-1, keepdims=True)
g_grid = fa._flash_bwd(qf, qf, qf, o, lse, dox, causal=True,
                       sm_scale=D**-0.5, block_q=512, block_k=512)
for ds in (0, 256):
    g_loop = fa._flash_bwd_loop(qf, qf, qf, lse, di, dox, sm_scale=D**-0.5,
                                block=512, diag_strip=ds)
    err = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(g_loop, g_grid))
    print(f"loop bwd bq512 ds={ds} on-chip f32 max err vs grid bwd: {err:.3e}")
    if err > 5e-3:
        print("BWD CORRECTNESS FAIL -- not measuring a wrong kernel")
        sys.exit(1)

print("== r3 flash fwd causal bf16 B4 H8 D128: loop (row groups) vs grid ==")
for N in (2048, 4096, 8192):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, N, D), jnp.bfloat16)
    flops = 4 * B * H * N * N * D * 0.5
    rows = []
    for (label, fn) in (
        [("grid (1024,1024)",
          lambda x: ft.flash_attention(x, x, x, True, block_q=1024,
                                       block_k=1024, impl="pallas"))]
        + [(f"loop bq1024 rg{ds}",
            (lambda ds_: lambda x: fa._flash_fwd_loop(
                x, x, x, sm_scale=D**-0.5, block_q=1024,
                diag_strip=ds_)[0])(ds))
           for ds in (0, 128)]
    ):
        try:
            t = device_loop_time(fn, (q,), iters=60)
        except Exception as e:
            print(f"  N={N} {label}: FAILED {type(e).__name__}: "
                  f"{str(e)[:140]}")
            continue
        tf = flops / t / 1e12
        rows.append((tf, label))
        print(f"  N={N} {label}: {t*1e3:7.3f} ms  {tf:6.1f} TF "
              f"({tf/ROOFLINE*100:4.1f}%)")
        sys.stdout.flush()
    if rows:
        best = max(rows)
        print(f"  N={N} BEST {best[1]} {best[0]:.1f} TF")

def _loop_fwd_bwd(block, chunk, ds):
    """grad fn: loop fwd (rg0, the fwd winner) + loop bwd at (block, chunk,
    diag_strip=ds)."""

    @jax.custom_vjp
    def f(x_):
        o, _ = fa._flash_fwd_loop(x_, x_, x_, sm_scale=D**-0.5,
                                  block_q=1024, diag_strip=0)
        return o.astype(jnp.float32)

    def fwd(x_):
        o, lse = fa._flash_fwd_loop(x_, x_, x_, sm_scale=D**-0.5,
                                    block_q=1024, diag_strip=0)
        return o.astype(jnp.float32), (x_, o, lse)

    def bwd(res, do):
        x_, o, lse = res
        di = jnp.sum(o.astype(jnp.float32) * do, axis=-1, keepdims=True)
        dq, dk, dv = fa._flash_bwd_loop(x_, x_, x_, lse, di,
                                        do.astype(x_.dtype),
                                        sm_scale=D**-0.5, block=block,
                                        diag_strip=ds, chunk=chunk)
        return (dq + dk + dv,)

    f.defvjp(fwd, bwd)
    return jax.grad(lambda x_: jnp.sum(f(x_)))


print("== r3 long-context causal bf16 B1 H8 D128: loop vs grid ==")
for N in (16384, 32768):
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 8, N, D), jnp.bfloat16)
    flops = 4 * 1 * 8 * N * N * D * 0.5
    for (label, fn) in [
        ("grid (1024,1024)",
         lambda x: ft.flash_attention(x, x, x, True, block_q=1024,
                                      block_k=1024, impl="pallas")),
        ("loop bq1024 rg0",
         lambda x: fa._flash_fwd_loop(x, x, x, sm_scale=D**-0.5,
                                      block_q=1024, diag_strip=0)[0]),
    ]:
        try:
            t = device_loop_time(fn, (q,), iters=20)
        except Exception as e:
            print(f"  N={N} {label}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}")
            continue
        tf = flops / t / 1e12
        print(f"  N={N} {label}: {t*1e3:7.3f} ms  {tf:6.1f} TF "
              f"({tf/ROOFLINE*100:4.1f}%)")
        sys.stdout.flush()

print("== r3 flash bwd causal bf16 B4 H8 D128: loop vs grid ==")
for N in (2048, 4096, 8192):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, N, D), jnp.bfloat16)
    flops = 5 * 2 * B * H * N * N * D * 0.5

    def bwd_grid(bq, bk):
        def f(x):
            return jax.grad(lambda x_: jnp.sum(ft.flash_attention(
                x_, x_, x_, True, block_q=bq, block_k=bk,
                impl="pallas").astype(jnp.float32)))(x)
        return f

    rows = []
    # grad-of-fwd for both paths, so the fwd cost cancels identically
    for (label, fn) in (
        [("grid (1024,1024)", bwd_grid(1024, 1024)),
         ("grid (512,1024)", bwd_grid(512, 1024))]
        + [(f"loop b{bl} c{ch} rg{ds}", _loop_fwd_bwd(bl, ch, ds))
           for (bl, ch, ds) in [(1024, 1024, 256), (1024, 512, 256),
                                (1024, 512, 0), (512, 512, 256),
                                (512, 512, 128), (1024, 512, 128)]]
    ):
        try:
            t = device_loop_time(fn, (q,), iters=30)
        except Exception as e:
            print(f"  N={N} {label}: FAILED {type(e).__name__}: "
                  f"{str(e)[:140]}")
            continue
        tf = flops / t / 1e12
        rows.append((tf, label))
        print(f"  N={N} bwd {label}: {t*1e3:7.3f} ms  {tf:6.1f} TF")
        sys.stdout.flush()
    if rows:
        best = max(rows)
        print(f"  N={N} bwd BEST {best[1]} {best[0]:.1f} TF")

"""Flash-attention BACKWARD throughput on the real chip.

The reference times only forwards (tests/speed_test_flash_attention.py:63-73)
but ships a full backward kernel (flashattention_kernel.cu:115-255); training
spends ~2/3 of its attention time there.  This measures grad(sum(flash*dy))
wrt (q, k, v) — the split dKV + dQ Pallas kernels plus the di pass — at the
PERF.md headline shapes, against the XLA op-graph backward.

Useful-FLOP accounting: bwd runs 5 score-shaped matmuls per (q, kv) tile pair
(s, dv, dp, dk, dq) vs 2 in fwd, so useful flops = 5 * B*H*Nq*Nkv*D * 2
(halved below the diagonal for causal).

    PYTHONPATH=.:/root/.axon_site python kernel_bench/bench_flash_bwd.py [--quick]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp

from flashattn_tpu import flash_attention, flash_attention_reference
from flashattn_tpu.utils.timing import device_loop_time


def bench_one(bs, nh, n, d, causal, dtype=jnp.bfloat16, impl="pallas"):
    ks = jax.random.split(jax.random.PRNGKey(n + nh), 4)
    q = jax.random.normal(ks[0], (bs, nh, n, d), dtype)
    k = jax.random.normal(ks[1], (bs, nh, n, d), dtype)
    v = jax.random.normal(ks[2], (bs, nh, n, d), dtype)
    dy = jax.random.normal(ks[3], (bs, nh, n, d), dtype)

    if impl in ("pallas", "auto"):
        att = lambda q, k, v: flash_attention(q, k, v, causal, impl=impl)
    else:
        att = lambda q, k, v: flash_attention_reference(q, k, v, causal)

    def bwd(q, k, v):
        dq, dk, dv = jax.grad(
            lambda q_, k_, v_: jnp.sum(att(q_, k_, v_).astype(jnp.float32)
                                       * dy.astype(jnp.float32)),
            argnums=(0, 1, 2))(q, k, v)
        # Fold ALL grads into the chained output: device_loop_time threads
        # only out[0] (dq), and with the split loop/grid schedules dk/dv come
        # from a SEPARATE pallas call that XLA dead-code-eliminates if its
        # outputs dangle — r1-r3 bwd rows measured fwd+di+dQ only (found in
        # r4; the "irreproducible" r1-vs-r3 grid numbers were this).
        return dq + 1e-12 * (jnp.sum(dk) + jnp.sum(dv))

    t = device_loop_time(bwd, (q, k, v))
    pairs = n * n * (0.5 if causal else 1.0)
    flops = 5 * 2 * bs * nh * pairs * d
    return t, flops / t / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    shapes = [(4, 8, 2048, 128), (4, 8, 4096, 128)]
    if not args.quick:
        shapes += [(4, 8, 8192, 128), (1, 8, 16384, 128)]

    print(f"{'shape':24s} {'causal':6s} {'auto ms':>9s} {'TF/s':>7s} "
          f"{'pallas ms':>10s} {'TF/s':>7s} "
          f"{'xla ms':>9s} {'TF/s':>7s} {'xla/auto':>8s} {'xla/grid':>8s}")
    for bs, nh, n, d in shapes:
        for causal in (True, False):
            # auto = the production dispatch (subrow/loop fwd + loop bwd at
            # eligible shapes); pallas = the grid kernels, kept as the
            # within-log schedule comparison.
            ta, fa = bench_one(bs, nh, n, d, causal, impl="auto")
            tp, fp = bench_one(bs, nh, n, d, causal, impl="pallas")
            # op-graph bwd materialises (B,H,N,N) f32 scores twice; OOMs
            # above 8k at B4 — guard.
            if bs * nh * n * n * 4 * 3 < 12e9:
                tx, fx = bench_one(bs, nh, n, d, causal, impl="xla")
                # xla/auto is the production speedup; xla/grid keeps the
                # within-log schedule comparison vs the forced grid kernels.
                xla = (f"{tx * 1e3:9.2f} {fx:7.1f} {tx / ta:8.2f} "
                       f"{tp and tx / tp:8.2f}")
            else:
                xla = f"{'—':>9s} {'—':>7s} {'—':>8s} {'—':>8s}"
            print(f"B{bs} H{nh} N{n} D{d}".ljust(24) +
                  f"{str(causal):6s} {ta * 1e3:9.2f} {fa:7.1f} "
                  f"{tp * 1e3:10.2f} {fp:7.1f} {xla}")


if __name__ == "__main__":
    main()

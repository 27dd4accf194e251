"""Naive-vs-flash attention sweep -> CSV.

TPU re-staging of the reference's perf harness
(``tests/speed_test_flash_attention.py:152-178``): sweep
batch x seq x n_embd x heads x causal, gate correctness against the oracle,
record seconds/call for the naive op-graph path and the Pallas flash path.

    PYTHONPATH=.:/root/.axon_site python kernel_bench/speed_test_flash_attention.py \
        [--quick] [--out speed_test.csv]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import csv
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from flashattn_tpu import flash_attention, flash_attention_reference
from flashattn_tpu.utils.timing import device_loop_time


def sweep(quick: bool, out_path: str, dtype=jnp.bfloat16):
    if quick == "quick":
        batches, seqs, embds, heads = [4], [512, 2048], [512], [8]
    elif quick == "medium":
        # representative slice of the reference grid, ~30 configs
        batches, seqs, embds, heads = [8], [128, 512, 2048, 4096], [256, 512], [4, 8]
    elif quick == "reference":
        # the reference's OWN envelope (tests/speed_test_flash_attention.py:
        # 152-156): batch 64, n_embd up to 2048, heads up to 16 — head dims
        # 32-256 including the sub-128 dims where Mosaic lane alignment
        # bites.  Naive timing is skipped where the materialised (B,H,N,N)
        # scores would exceed ~4GB of HBM (the reference's V100 sweep has
        # the same practical cap).
        batches = [64]
        seqs = [128, 512, 2048]
        embds = [64, 256, 512, 1024, 2048]
        heads = [2, 4, 8, 16]
    else:
        # reference grid scaled to one v5e chip's HBM (batch 8)
        batches = [8]
        seqs = [128, 256, 512, 1024, 2048, 4096]
        embds = [64, 256, 512, 1024]
        heads = [2, 4, 8, 16]

    rows = []
    for bs, n, embd, nh, causal in itertools.product(
            batches, seqs, embds, heads, [False, True]):
        if embd % nh:
            continue
        d = embd // nh
        if d > 256 or d < 32:
            continue
        ks = jax.random.split(jax.random.PRNGKey(n + embd + nh), 3)
        q = jax.random.normal(ks[0], (bs, nh, n, d), dtype)
        k = jax.random.normal(ks[1], (bs, nh, n, d), dtype)
        v = jax.random.normal(ks[2], (bs, nh, n, d), dtype)

        flash = lambda q, k, v: flash_attention(q, k, v, causal)
        naive = lambda q, k, v: flash_attention_reference(q, k, v, causal)

        # the op-graph path materialises (B,H,N,N) f32 scores (twice,
        # with the softmax intermediate): cap it to fit HBM
        naive_ok = bs * nh * n * n * 4 * 2 < 4e9

        err = float("nan")
        if naive_ok:
            # correctness gate (reference asserts vs torch at 1e-5 in fp32;
            # bf16 on MXU warrants the looser bound)
            err = float(jnp.max(jnp.abs(
                flash(q, k, v).astype(jnp.float32)
                - naive(q, k, v).astype(jnp.float32))))
            assert err < 3e-2, (bs, n, embd, nh, causal, err)

        t_flash = device_loop_time(flash, (q, k, v), iters=10, repeats=2)
        t_naive = (device_loop_time(naive, (q, k, v), iters=10, repeats=2)
                   if naive_ok else float("nan"))
        flops = 4 * bs * nh * n * n * d * (0.5 if causal else 1.0)
        row = dict(batch=bs, seq=n, n_embd=embd, n_head=nh, causal=causal,
                   naive_s=round(t_naive, 6) if naive_ok else "",
                   flash_s=round(t_flash, 6),
                   speedup=round(t_naive / t_flash, 3) if naive_ok else "",
                   flash_tflops=round(flops / t_flash / 1e12, 2),
                   max_err=f"{err:.2e}" if naive_ok else "")
        rows.append(row)
        print(row)

    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {len(rows)} rows to {out_path}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_const", const="quick",
                dest="preset", default="full")
    ap.add_argument("--medium", action="store_const", const="medium",
                dest="preset")
    ap.add_argument("--reference", action="store_const", const="reference",
                dest="preset")
    ap.add_argument("--out", default="speed_test.csv")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}")
    sweep(args.preset, args.out)

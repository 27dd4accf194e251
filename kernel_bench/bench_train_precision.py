"""Training-step throughput: f32 vs bf16-mixed-precision vs remat.

Measures the full train step (fwd + bwd + Adam) on a 4L/512 GPT at seq
512 via ``make_train_scan`` (the same device-side multi-step dispatch the
MT app uses), reporting tokens/sec for:

* f32 baseline (the MT app's historical default),
* make_mixed_precision_loss (bf16 compute over f32 master weights — the
  MXU runs bf16 at ~2x f32 MACs on v5e, so compute-bound steps approach 2x),
* remat=True at f32 and mixed (jax.checkpoint per block trades ~1/3 more
  forward flops for O(n_layer) fewer saved activations — the measured
  slowdown is the memory lever's price).

Timing: two-point slope over scan lengths N and 3N (cancels the ~25ms
per-dispatch relay round trip, PERF.md methodology).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u kernel_bench/bench_train_precision.py
Smoke (CPU): TRAIN_PREC_SMOKE=1 python kernel_bench/bench_train_precision.py
"""

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

if bool(int(_os.environ.get("TRAIN_PREC_SMOKE", "0"))):
    # CPU smoke: the axon TPU plugin registers via jax plugin
    # discovery even without PYTHONPATH, and its first dispatch
    # hangs when the relay is unreachable -- force CPU early.
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import flashattn_tpu as ft
from flashattn_tpu.training import (lm_loss, make_mixed_precision_loss,
                                    make_train_scan)


def time_scan(scan, model, state, tok, tgt, msk, n):
    """Wall seconds for one scan dispatch of length n (best of 3)."""
    stack = lambda x, k: jnp.broadcast_to(x[None], (k,) + x.shape)
    args = (stack(tok, n), stack(tgt, n), stack(msk, n))
    best = float("inf")
    for r in range(4):
        t0 = time.perf_counter()
        m2, s2, losses = scan(model, state, *args, jax.random.PRNGKey(r))
        jax.block_until_ready(losses)
        dt = time.perf_counter() - t0
        if r:  # first call pays compile
            best = min(best, dt)
    return best, float(losses[-1])


def main():
    smoke = bool(int(_os.environ.get("TRAIN_PREC_SMOKE", "0")))
    if smoke:
        n_vocab, n_embd, n_layer, batch, seq, n = 256, 64, 1, 2, 64, 2
        impl = "reference"  # interpret-mode Pallas is minutes/step on CPU
    else:
        n_vocab, n_embd, n_layer, batch, seq, n = 10240, 512, 4, 32, 512, 8
        impl = "flash"

    data = jax.random.randint(jax.random.PRNGKey(1), (batch, seq + 1),
                              0, n_vocab)
    tok, tgt = data[:, :-1], data[:, 1:]
    msk = jnp.ones(tgt.shape, jnp.float32)
    tokens_per_step = batch * seq

    results = {}
    for label, remat, mixed in [("f32", False, False),
                                ("mixed", False, True),
                                ("f32+remat", True, False),
                                ("mixed+remat", True, True)]:
        model = ft.DecoderLM(n_vocab, n_embd, 8, seq, p_dropout=0.0,
                             n_layer=n_layer, attn_impl=impl, remat=remat,
                             use_fused_layernorm=not smoke,
                             key=jax.random.PRNGKey(0))
        opt = ft.Adam(lr=1e-3)
        state = opt.init(model)
        loss_fn = make_mixed_precision_loss(lm_loss) if mixed else lm_loss
        scan = make_train_scan(opt, loss_fn=loss_fn, donate=False)

        t1, l1 = time_scan(scan, model, state, tok, tgt, msk, n)
        t3, _ = time_scan(scan, model, state, tok, tgt, msk, 3 * n)
        per_step = (t3 - t1) / (2 * n)
        results[label] = per_step
        base = results.get("f32", per_step)
        print(f"  {label:12s}: {per_step * 1e3:8.2f} ms/step  "
              f"{tokens_per_step / per_step:10.0f} tok/s  "
              f"({base / per_step:4.2f}x vs f32)  loss {l1:.3f}")

    if not smoke:
        print(f"mixed-precision speedup: "
              f"{results['f32'] / results['mixed']:.2f}x; remat cost at "
              f"f32: {results['f32+remat'] / results['f32']:.2f}x")


if __name__ == "__main__":
    main()

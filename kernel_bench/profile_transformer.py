"""Transformer profiling harness.

TPU-native equivalent of the reference's cProfile harness
(``tests/profile_transformers.py:112-149``: cProfile around single DecoderLM
forwards) and its per-batch fwd/bwd/step wall-clock segments
(``project/run_machine_translation.py:217-237``).  Here:

* per-phase device time (forward / backward / optimizer step / full train
  step) measured with the scan-chained device loop;
* optional ``--trace DIR`` writes a jax.profiler trace (open with
  TensorBoard / Perfetto) — the structured tracer the reference lacks
  (SURVEY.md §5).

Usage:  python kernel_bench/profile_transformer.py [--trace /tmp/trace]
"""




from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp

import flashattn_tpu as ft
from flashattn_tpu.utils.timing import device_loop_time


def build(attn_impl: str, n_vocab=10000, n_embd=256, n_head=8, n_layer=4,
          n_positions=512, dtype=jnp.float32):
    # reference config: run_machine_translation.py:397-407
    return ft.DecoderLM(n_vocab=n_vocab, n_embd=n_embd, n_head=n_head,
                        n_positions=n_positions, p_dropout=0.0,
                        n_layer=n_layer, attn_impl=attn_impl,
                        key=jax.random.PRNGKey(0), dtype=dtype)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--attn", default="flash", choices=["flash", "naive", "fused"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--trace", default=None, help="jax.profiler trace dir")
    args = ap.parse_args()

    model = build(args.attn)
    n_vocab = 10000
    opt = ft.Adam(lr=1e-3)
    state = opt.init(model)
    tokens = jax.random.randint(jax.random.PRNGKey(1),
                                (args.batch, args.seq), 0, n_vocab)
    targets = jax.random.randint(jax.random.PRNGKey(2),
                                 (args.batch, args.seq), 0, n_vocab)

    def loss_fn(m, idx, tgt):
        logits = m(idx)
        return jnp.mean(ft.F.softmax_loss(
            logits.reshape(-1, n_vocab), tgt.reshape(-1)))

    fwd = jax.jit(loss_fn)
    grad = jax.jit(jax.grad(loss_fn))

    @jax.jit
    def train_step(model, state, idx, tgt):
        loss, grads = jax.value_and_grad(loss_fn)(model, idx, tgt)
        model, state = opt.step(model, grads, state)
        return model, state, loss

    # warm compiles
    fwd(model, tokens, targets).block_until_ready()
    jax.block_until_ready(grad(model, tokens, targets))
    jax.block_until_ready(train_step(model, state, tokens, targets))

    # phase timings: the device loop threads a float32 carry; tokens are
    # derived from it on device so each iteration data-depends on the last.
    carry0 = tokens.astype(jnp.float32)

    def with_tokens(phase_fn):
        def run(c):
            idx = jnp.abs(c).astype(jnp.int32) % n_vocab
            return c + phase_fn(idx) * 1e-12

        return run

    t_f = device_loop_time(with_tokens(lambda idx: fwd(model, idx, targets)),
                           (carry0,), iters=args.iters)
    t_b = device_loop_time(
        with_tokens(lambda idx: jnp.sum(jax.tree_util.tree_leaves(
            grad(model, idx, targets))[0])),
        (carry0,), iters=args.iters)
    def full_step(idx):
        # depend on the UPDATED params, not just the loss — otherwise XLA
        # dead-code-eliminates the backward pass and optimizer update and
        # this phase times a forward-only program
        m2, s2, loss = train_step(model, state, idx, targets)
        return loss + jnp.sum(jax.tree_util.tree_leaves(m2)[0]) * 1e-12

    t_s = device_loop_time(with_tokens(full_step), (carry0,), iters=args.iters)

    toks = args.batch * args.seq
    print(f"attn={args.attn} batch={args.batch} seq={args.seq} "
          f"device={jax.devices()[0].device_kind}")
    print(f"forward        : {t_f*1e3:9.3f} ms   {toks/t_f:12.0f} tok/s")
    print(f"forward+back   : {t_b*1e3:9.3f} ms   {toks/t_b:12.0f} tok/s")
    print(f"full train step: {t_s*1e3:9.3f} ms   {toks/t_s:12.0f} tok/s")

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                model, state, loss = train_step(model, state, tokens, targets)
            jax.block_until_ready(loss)
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()

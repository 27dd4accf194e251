"""End-to-end speculative decoding win: trained target + distilled draft.

VERDICT r1 item 4: the machinery was verified at the acceptance ceiling
(self-draft 4.00/4, token-identical to greedy) but no configuration had
beaten plain chunked greedy.  This bench constructs the configuration the
scheme exists for:

* a TARGET big enough that its decode step dwarfs the draft's
  (16L / 1024 embd / 8 heads, D=128 -> the pipelined paged-decode path),
* a 2L / 256 DRAFT distilled from the target (``make_distill_loss``) on the
  framework's MT corpus, so greedy acceptance is earned, not self-drafted,
* engine throughput measured for plain chunked greedy vs speculative with
  the SAME target weights.

Run: PYTHONPATH=/root/repo:/root/.axon_site python kernel_bench/bench_speculative.py
"""

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

if bool(int(_os.environ.get("SPEC_SMOKE", "0"))):
    # CPU smoke: the axon TPU plugin registers via jax plugin
    # discovery even without PYTHONPATH, and its first dispatch
    # hangs when the relay is unreachable -- force CPU early.
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import flashattn_tpu as ft
from flashattn_tpu.serving import ContinuousBatchingEngine
from flashattn_tpu.training import (
    lm_loss, make_distill_loss, make_train_scan)
from flashattn_tpu.training.translation import make_synthetic_dataset

# SEQ must cover prompt + NEW_TOKENS: generation PAST the trained row
# length lands on untrained learned-position embeddings where target and
# draft argmax-disagree on noise (measured: acceptance 1.50/4 at SEQ=64
# with ~72-position generations; the r2 run's SEQ=24 had the same flaw)
SEQ = 128           # packed multi-example rows (long-form LM)
BATCH = 64
N_REQ = 64
NEW_TOKENS = 96
SPEC_LEN = 4


def build_corpus(n_examples=6000, seed=0):
    """PACKED word-level token stream over the synthetic MT corpus (no BPE:
    the lexicon IS the vocabulary).

    Examples concatenate back-to-back (src <eos_de> tgt <eos_en> src ...)
    into SEQ-token rows with no padding, so the model learns long-form
    continuation: after finishing a translation it starts the next source
    sentence.  A served 64-token generation therefore stays ON-distribution
    end-to-end — the regime speculative decoding exists for (the per-example
    variant's generations either ran off-distribution past <eos_en>,
    acceptance 1.31/4, or stopped after ~12 tokens with no decode runway to
    amortise the waves)."""
    examples = make_synthetic_dataset(n_examples, seed)
    vocab = {"<pad>": 0, "<eos_de>": 1, "<eos_en>": 2}
    for ex in examples:
        for w in ex["de"].split() + ex["en"].split():
            vocab.setdefault(w, len(vocab))
    # DETERMINISTIC chain: examples concatenate in sorted order, so the
    # continuation after <eos_en> (the next source sentence) is learnable.
    # With random order, every generated source token is a pure-entropy
    # argmax over noise where target and draft necessarily disagree —
    # measured acceptance 1.38/4 with BOTH models converged.  A predictable
    # continuation emulates the serving regimes speculation exists for
    # (templated documents, code completion).
    examples = sorted(examples, key=lambda ex: ex["de"])
    stream, starts = [], []
    for ex in examples:
        starts.append(len(stream))
        stream += ([vocab[w] for w in ex["de"].split()] + [vocab["<eos_de>"]]
                   + [vocab[w] for w in ex["en"].split()]
                   + [vocab["<eos_en>"]])
    # rows are SEQ-token windows ANCHORED at example starts (cyclic wrap):
    # served prompts begin at position 0, so training must show every
    # example start at position 0 too (learned absolute positions)
    cyc = stream + stream[:SEQ]
    rows = np.asarray([cyc[o:o + SEQ] for o in starts], np.int32)
    masks = np.ones_like(rows, np.float32)
    return rows, masks, vocab, examples


def stack_batches(rows, masks, n_steps, seed):
    rng = np.random.default_rng(seed)
    need = n_steps * BATCH
    # cycle shuffled epochs when the corpus is smaller than the step budget
    reps = -(-need // len(rows))
    idx = np.concatenate([rng.permutation(len(rows))
                          for _ in range(reps)])[:need]
    tok = rows[idx].reshape(n_steps, BATCH, SEQ)
    msk = masks[idx].reshape(n_steps, BATCH, SEQ)
    return (jnp.asarray(tok[:, :, :-1]), jnp.asarray(tok[:, :, 1:]),
            jnp.asarray(msk[:, :, 1:]))


def train(model, loss_fn, rows, masks, n_steps, lr, seed, label, ctx=None):
    opt = ft.Adam(lr=lr)
    state = opt.init(model)
    scan = make_train_scan(opt, loss_fn=loss_fn, grad_clip=1.0)
    tok, tgt, msk = stack_batches(rows, masks, n_steps, seed)
    t0 = time.perf_counter()
    chunk = 50
    losses = []
    for s in range(0, n_steps, chunk):
        # ctx (the distillation teacher) rides as a call argument so its
        # params stay out of the compiled executable (CLAUDE.md: closed-over
        # >100MB arrays embed as HLO constants and the remote compile 413s)
        model, state, ls = scan(model, state, tok[s:s + chunk],
                                tgt[s:s + chunk], msk[s:s + chunk],
                                jax.random.PRNGKey(seed + s), ctx)
        losses.append(float(ls[-1]))
    print(f"  {label}: {n_steps} steps in {time.perf_counter() - t0:.1f}s, "
          f"loss {losses[0]:.3f} -> {losses[-1]:.3f}")
    return model.eval()


def bench(target, draft, prompts, label, temperature=0.0, eos_id=None,
          **kw):
    eng = ContinuousBatchingEngine(
        target, max_batch=16, page_size=128, pages_per_seq=3,
        steps_per_dispatch=8, draft_model=draft, spec_len=SPEC_LEN, **kw)
    # warm a FULL request pass: the wave scheduler walks a power-of-2
    # ladder of wave counts down each request's tail, and every count is
    # its own compiled executable — steady-state serving throughput is the
    # honest metric, so all compiles happen before the timed pass
    for p in prompts[:16]:
        eng.submit(p, NEW_TOKENS, temperature=temperature, eos_id=eos_id)
    eng.run()
    eng.finished.clear()
    reqs = [eng.submit(p, NEW_TOKENS, temperature=temperature,
                       eos_id=eos_id)
            for p in prompts]
    t0 = time.perf_counter()
    eng.run()
    dt = time.perf_counter() - t0
    toks = sum(len(r.generated) for r in reqs)
    extra = ""
    if eng.spec_stats[1]:
        acc, waves = eng.spec_stats
        extra = f"  acceptance {acc / waves:.2f}/{SPEC_LEN}"
    if eng.lookup_stats[1]:
        acc, waves = eng.lookup_stats
        extra += (f"  lookup acceptance {acc / waves:.2f}"
                  f"/{eng.prompt_lookup + 1} over {waves} waves")
    print(f"  {label:30s} {toks / dt:8.0f} new tok/s ({dt * 1e3:6.0f} ms)"
          f"{extra}")
    return toks / dt, [r.generated for r in reqs]


def main():
    smoke = bool(int(_os.environ.get("SPEC_SMOKE", "0")))  # tiny CPU check
    rows, masks, vocab, examples = build_corpus(600 if smoke else 1500)
    n_vocab = ((len(vocab) + 127) // 128) * 128
    print(f"corpus: {len(rows)} examples, vocab {len(vocab)} -> {n_vocab}")

    t_embd, t_layer, d_embd = (128, 2, 64) if smoke else (1024, 16, 256)
    # the round-2 battery measured acceptance 1.25/4 from a 400-step draft
    # (distill loss 1.31 vs target 0.54) -- an undertrained draft turns the
    # whole scheme into overhead, so the draft gets 5x the budget
    n_steps = 8 if smoke else 1200
    d_steps = 8 if smoke else 3600
    target = ft.DecoderLM(n_vocab, t_embd, 8, 2048, p_dropout=0.0,
                          n_layer=t_layer, attn_impl="flash",
                          key=jax.random.PRNGKey(0))
    draft = ft.DecoderLM(n_vocab, d_embd, 2, 2048, p_dropout=0.0, n_layer=2,
                         attn_impl="flash", key=jax.random.PRNGKey(1))

    print(f"training target ({t_layer}L/{t_embd}) on the MT corpus ...")
    target = train(target, lm_loss, rows, masks, n_steps, 5e-4, 2, "target")
    print(f"distilling draft (2L/{d_embd}) from the target ...")
    draft = train(draft, make_distill_loss(), rows, masks, d_steps,
                  1e-3, 3, "draft", ctx=target)

    rng = np.random.default_rng(7)
    pick = rng.permutation(len(examples))[:N_REQ]
    prompts = []
    for i in pick:
        ids = [vocab[w] for w in examples[i]["de"].split()] + [vocab["<eos_de>"]]
        prompts.append(ids)
    # the packed corpus makes 64-token continuations on-distribution
    # (translate, emit <eos_en>, start the next source sentence), so no
    # eos stop: every request generates the full budget -- the long-form
    # regime speculation exists for
    print(f"serving {N_REQ} requests x {NEW_TOKENS} tokens (long-form):")
    t_plain, out_plain = bench(target, None, prompts, "greedy, 8 steps/dispatch")
    t_spec, out_spec = bench(target, draft, prompts,
                             f"speculative (distilled, k={SPEC_LEN}, "
                             f"4 waves/dispatch)")
    t_spec1, _ = bench(target, draft, prompts,
                       f"speculative (distilled, 1 wave/dispatch)",
                       spec_waves_per_dispatch=1)
    t_spec8, _ = bench(target, draft, prompts,
                       f"speculative (distilled, 8 waves/dispatch)",
                       spec_waves_per_dispatch=8)
    t_look, out_look = bench(target, None, prompts, "prompt-lookup (k=3)",
                             prompt_lookup=3)
    # sampled speculation: the exact accept/residual wave on a trained
    # model (peaked distributions -> high acceptance even at t=0.7)
    t_ps, _ = bench(target, None, prompts, "plain sampled t=0.7",
                    temperature=0.7)
    t_ls, _ = bench(target, None, prompts, "lookup sampled t=0.7 (k=3)",
                    temperature=0.7, prompt_lookup=3)
    print(f"  outputs identical to greedy: spec={out_plain == out_spec} "
          f"lookup={out_plain == out_look}")
    print(f"  SPEEDUP: distilled {t_spec / t_plain:.2f}x "
          f"(1 wave {t_spec1 / t_plain:.2f}x, "
          f"8 waves {t_spec8 / t_plain:.2f}x), "
          f"prompt-lookup {t_look / t_plain:.2f}x, "
          f"sampled lookup {t_ls / t_ps:.2f}x (vs plain sampled)")


if __name__ == "__main__":
    main()

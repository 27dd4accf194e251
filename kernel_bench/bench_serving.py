"""Continuous-batching engine throughput on the real chip.

Reproduces the PERF.md serving table: 16 requests x 64 new tokens through a
2-layer 512-embd model (D=128 heads -> the pipelined paged decode path),
64-token prompts, measured wall-clock through the ~25ms/dispatch relay.

Modes compared:
  * greedy   (temperature 0)   -- the static all_greedy flag skips sampling
  * sampled  (temperature 0.8) -- full top-k sort + categorical per step

Run: PYTHONPATH=/root/repo:/root/.axon_site python kernel_bench/bench_serving.py
"""

import time

import jax
import numpy as np

import flashattn_tpu as ft
from flashattn_tpu.serving import ContinuousBatchingEngine

N_REQ = 16
NEW_TOKENS = 64
PROMPT_LEN = 64


def run(model, *, steps_per_dispatch, temperature=0.0, label="",
        draft_model=None, spec_len=4, **kw):
    rng = np.random.default_rng(0)
    eng = ContinuousBatchingEngine(
        model, max_batch=N_REQ, page_size=128, pages_per_seq=8,
        steps_per_dispatch=steps_per_dispatch,
        draft_model=draft_model, spec_len=spec_len, **kw)
    prompts = [list(rng.integers(1, 999, size=PROMPT_LEN))
               for _ in range(N_REQ)]
    # warmup: jit-compile prefill + every decode-chunk variant on a
    # throwaway request of the same length
    eng.submit(prompts[0], NEW_TOKENS, temperature=temperature)
    eng.run()
    eng.finished.clear()

    reqs = [eng.submit(p, NEW_TOKENS, temperature=temperature)
            for p in prompts]
    t0 = time.perf_counter()
    eng.run()
    dt = time.perf_counter() - t0
    toks = sum(len(r.generated) for r in reqs)
    total = toks + N_REQ * PROMPT_LEN
    extra = ""
    if eng.spec_stats[1]:
        acc, waves = eng.spec_stats
        extra = f"  acc {acc / waves:.2f}/{spec_len}"
    if eng.lookup_stats[1]:
        acc, waves = eng.lookup_stats
        extra += f"  lookup acc {acc / waves:.2f}/{eng.prompt_lookup + 1}"
    print(f"{label:34s} {toks / dt:8.0f} new tok/s   "
          f"({total / dt:8.0f} incl. prompts, {dt * 1e3:7.0f} ms){extra}")
    return toks / dt


def prefill_bench(plen=2048, n_req=4, force_grid=False, label="",
                  L=2, E=512, H=4):
    """Engine-PREFILL throughput at serving-scale prompts (r5: the varlen
    subrow route, VERDICT item 1).  Prompts all ``plen`` long so admission
    runs one batched prefill dispatch at (n_req, plen); NEW_TOKENS=1 makes
    the run prefill-dominated.  ``force_grid`` disables the subrow gate for
    the A/B (same engine, same log, only the kernel route differs).

    At the small 2L/512E model the engine prefill is DISPATCH-bound (~60ms
    TTFT against ~0.5 TF of attention) and the routes tie; the larger
    config puts real attention work in the dispatch so the kernel choice
    shows at the engine level."""
    import flashattn_tpu.ops.flash_attention as fa

    model = ft.DecoderLM(1000, E, H, 2 * plen, p_dropout=0.0, n_layer=L,
                         attn_impl="flash", key=jax.random.PRNGKey(0)).eval()
    orig = fa._subrow_ok
    if force_grid:
        fa._subrow_ok = lambda *a, **k: False
    try:
        eng = ContinuousBatchingEngine(
            model, max_batch=n_req, page_size=128,
            pages_per_seq=(plen + 256) // 128, steps_per_dispatch=1,
            prefill_chunk=plen)
        rng = np.random.default_rng(0)
        prompts = [list(rng.integers(1, 999, size=plen))
                   for _ in range(n_req)]
        eng.submit(prompts[0], 1)
        eng.run()
        eng.finished.clear()
        reqs = [eng.submit(p, 1) for p in prompts]
        t0 = time.perf_counter()
        eng.run()
        dt = time.perf_counter() - t0
        assert all(len(r.generated) >= 1 for r in reqs)
        D = E // H
        attn_fl = L * n_req * H * (plen * plen / 2) * D * 2 * 2
        print(f"{label:40s} {n_req * plen / dt:8.0f} prompt tok/s   "
              f"TTFT {dt * 1e3 / 1:7.0f} ms  attn {attn_fl/dt/1e12:5.1f} "
              f"TF-useful")
    finally:
        fa._subrow_ok = orig


def northstar():
    """BASELINE configs[2-3] literally: seq-8K prompts, FP8/INT8 paged KV,
    int8 weight-only Linears, continuous batching, single chip.  Measures
    TTFT (prefill-dominated) and steady-state decode tok/s at 8K history."""
    from flashattn_tpu.ops.quant import quantize_model_weights
    import jax.numpy as jnp

    plen, new, n_req = 8192, 64, 4
    L, E, H = 4, 1024, 8
    base = ft.DecoderLM(1000, E, H, 2 * plen, p_dropout=0.0, n_layer=L,
                        attn_impl="flash", key=jax.random.PRNGKey(0)).eval()
    for label, model, dtype in [
        ("bf16 weights + bf16 KV", base, None),
        ("int8 weights + int8 KV pages", quantize_model_weights(base, jnp.int8),
         jnp.int8),
        ("int8 weights + fp8 KV pages", quantize_model_weights(base, jnp.int8),
         jnp.float8_e4m3fn),
    ]:
        kw = dict(dtype=dtype) if dtype is not None else {}
        eng = ContinuousBatchingEngine(
            model, max_batch=n_req, page_size=128,
            pages_per_seq=(plen + 256) // 128, steps_per_dispatch=8,
            prefill_chunk=plen, **kw)
        rng = np.random.default_rng(0)
        prompts = [list(rng.integers(1, 999, size=plen))
                   for _ in range(n_req)]
        eng.submit(prompts[0], new)
        eng.run()
        eng.finished.clear()
        reqs = [eng.submit(p, new) for p in prompts]
        t0 = time.perf_counter()
        eng.run()
        dt = time.perf_counter() - t0
        toks = sum(len(r.generated) for r in reqs)
        print(f"northstar 8K {label:28s}: {toks/dt:7.0f} new tok/s  "
              f"({(toks + n_req*plen)/dt:8.0f} incl. prompts, "
              f"{dt*1e3:6.0f} ms total)")


def main():
    import sys
    if "northstar" in sys.argv:
        northstar()
        return
    if "prefill" in sys.argv:
        for plen in (2048, 4096):
            prefill_bench(plen, force_grid=True,
                          label=f"prefill {plen} x4 2L/512 (grid)")
            prefill_bench(plen, force_grid=False,
                          label=f"prefill {plen} x4 2L/512 (subrow)")
        # attention-heavy config: 8L x 8 heads of D=128 at 8K prompts
        for grid in (True, False):
            prefill_bench(8192, n_req=2, force_grid=grid, L=8, E=1024, H=8,
                          label=f"prefill 8192 x2 8L/1024 "
                                f"({'grid' if grid else 'subrow'})")
        return
    model = ft.DecoderLM(1000, 512, 4, 4096, p_dropout=0.0, n_layer=2,
                         attn_impl="reference",
                         key=jax.random.PRNGKey(0)).eval()
    run(model, steps_per_dispatch=1, label="greedy, 1 step/dispatch")
    run(model, steps_per_dispatch=8, label="greedy, 8 steps/dispatch")
    run(model, steps_per_dispatch=8, temperature=0.8,
        label="sampled t=0.8 topk=0, 8 steps")
    # speculative: an UNTRAINED draft is a worst case for acceptance; the
    # self-draft row shows the ceiling (acceptance == spec_len)
    draft = ft.DecoderLM(1000, 128, 2, 4096, p_dropout=0.0, n_layer=1,
                         attn_impl="reference",
                         key=jax.random.PRNGKey(3)).eval()
    run(model, steps_per_dispatch=8, draft_model=draft, spec_len=4,
        label="speculative (1L/128 draft, k=4)")
    run(model, steps_per_dispatch=8, draft_model=model, spec_len=4,
        label="speculative (self draft ceiling)")
    # self-draft under SAMPLING: acceptance = p(argmax) per token; the
    # exact accept/residual wave must still beat per-token sampling when
    # the distribution is peaked
    run(model, steps_per_dispatch=8, draft_model=model, spec_len=4,
        temperature=0.8, label="spec sampled t=0.8 (self draft)")
    # prompt-lookup on random prompts is a worst case (no repeats) — the
    # trained-corpus case lives in bench_speculative.py
    run(model, steps_per_dispatch=8, prompt_lookup=3,
        label="prompt-lookup k=3 (random prompts)")
    # weight-only int8 + int8 KV pages: the full quantized serving config
    # (BASELINE configs[2-3]) -- decode is weight/KV bandwidth bound, so
    # halving both should show up directly in tok/s
    from flashattn_tpu.ops.quant import quantize_model_weights
    import jax.numpy as jnp
    qmodel = quantize_model_weights(model, jnp.int8)
    run(qmodel, steps_per_dispatch=8, label="int8 weights")
    run(qmodel, steps_per_dispatch=8, dtype=jnp.int8,
        label="int8 weights + int8 KV pages")


if __name__ == "__main__":
    main()

"""Speculative decoding: greedy acceptance makes the engine's output
token-for-token IDENTICAL to plain greedy decoding — the strongest possible
equivalence test, fuzzed over scheduler configurations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flashattn_tpu as ft
from flashattn_tpu.serving import ContinuousBatchingEngine

V = 64


@pytest.fixture(scope="module")
def target():
    return ft.DecoderLM(V, 32, 4, 512, p_dropout=0.0, n_layer=2,
                        attn_impl="reference",
                        key=jax.random.PRNGKey(0)).eval()


@pytest.fixture(scope="module")
def draft():
    # a different (smaller) model: proposals only partially match, so the
    # acceptance logic is genuinely exercised
    return ft.DecoderLM(V, 16, 2, 512, p_dropout=0.0, n_layer=1,
                        attn_impl="reference",
                        key=jax.random.PRNGKey(7)).eval()


def _run(target_model, prompts, maxnews, eoss, **kw):
    eng = ContinuousBatchingEngine(target_model, **kw)
    reqs = [eng.submit(p, m, eos_id=e)
            for p, m, e in zip(prompts, maxnews, eoss)]
    eng.run()
    assert eng.pool.n_free == eng.pool.total
    return {r.uid: (r.generated, r.truncated) for r in reqs}, eng


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_speculative_equals_greedy(target, draft, seed):
    rng = np.random.default_rng(seed)
    page_size = int(rng.choice([4, 8]))
    pages_per_seq = int(rng.integers(3, 6))
    max_batch = int(rng.integers(1, 4))
    capacity = page_size * pages_per_seq
    total_pages = int(rng.integers(max(3, max_batch),
                                   max_batch * pages_per_seq + 1))
    spec_len = int(rng.choice([2, 3, 4]))

    prompts, maxnews, eoss = [], [], []
    for _ in range(int(rng.integers(3, 7))):
        plen = int(rng.integers(1, capacity - 1))
        if -(-plen // page_size) > total_pages:
            continue
        prompts.append(list(rng.integers(1, 60, size=plen)))
        maxnews.append(int(rng.integers(1, capacity)))
        eoss.append(int(rng.integers(1, 60)) if rng.random() < 0.4 else None)
    if not prompts:
        return

    kw = dict(max_batch=max_batch, page_size=page_size,
              pages_per_seq=pages_per_seq, total_pages=total_pages)
    plain, _ = _run(target, prompts, maxnews, eoss,
                    steps_per_dispatch=1, **kw)
    spec, eng = _run(target, prompts, maxnews, eoss,
                     draft_model=draft, spec_len=spec_len, **kw)
    assert plain == spec, (
        f"speculative diverged: page={page_size} pps={pages_per_seq} "
        f"mb={max_batch} pool={total_pages} spec={spec_len}")
    assert eng.spec_stats[1] > 0  # the speculative path actually ran


def test_self_draft_accepts_everything(target):
    """Draft == target => every wave accepts all spec_len tokens."""
    eng = ContinuousBatchingEngine(target, max_batch=2, page_size=8,
                                   pages_per_seq=8, draft_model=target,
                                   spec_len=4)
    reqs = [eng.submit([3, 14, 15], 17), eng.submit([9, 2], 13)]
    eng.run()
    for r in reqs:
        assert r.done
    acc, waves = eng.spec_stats
    assert waves > 0
    # all-but-final waves accept the full chunk; the mean stays close to 4
    assert acc / waves > 3.0, eng.spec_stats


def test_speculative_with_rolling_window(draft):
    """Windowed target + draft: speculative, rolling release and the
    windowed kernels compose; output equals plain greedy."""
    wtarget = ft.DecoderLM(V, 32, 4, 512, p_dropout=0.0, n_layer=2,
                           window=8, attn_impl="reference",
                           key=jax.random.PRNGKey(1)).eval()
    wdraft = ft.DecoderLM(V, 16, 2, 512, p_dropout=0.0, n_layer=1,
                          window=8, attn_impl="reference",
                          key=jax.random.PRNGKey(8)).eval()
    prompts = [[3, 14, 15, 9, 2, 6], [27, 1, 8]]
    kw = dict(max_batch=2, page_size=4, pages_per_seq=8)
    plain, _ = _run(wtarget, prompts, [20, 24], [None, None],
                    steps_per_dispatch=1, **kw)
    spec, eng = _run(wtarget, prompts, [20, 24], [None, None],
                     draft_model=wdraft, spec_len=3, **kw)
    assert plain == spec
    assert eng.spec_stats[1] > 0


def test_speculative_with_tp_serving(target, draft):
    """Speculative + TP serving composed: draft sharded over the same
    (mesh, head_axis) as the target; output identical to the plain
    unsharded greedy engine."""
    from flashattn_tpu.parallel import create_mesh

    mesh = create_mesh((2,), ("model",))
    rng = np.random.default_rng(11)
    prompts = [list(rng.integers(1, 60, size=n)) for n in (5, 12, 1)]
    maxnews, eoss = [10, 6, 8], [None, None, None]

    kw = dict(max_batch=3, page_size=8, pages_per_seq=4)
    plain, _ = _run(target, prompts, maxnews, eoss,
                    steps_per_dispatch=1, **kw)
    spec, eng = _run(target, prompts, maxnews, eoss,
                     draft_model=draft, spec_len=3, mesh=mesh, **kw)
    assert plain == spec
    assert eng.spec_stats[1] > 0  # speculative waves actually ran

"""Beam-search generation: equivalence with greedy at beam=1, batch-row
independence, EOS freezing, and hypothesis-score sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flashattn_tpu as ft
from flashattn_tpu.training.generate import (
    beam_search_generate,
    greedy_generate,
)

V = 50


@pytest.fixture(scope="module")
def model():
    return ft.DecoderLM(V, 32, 4, 64, p_dropout=0.0, n_layer=2,
                        attn_impl="reference",
                        key=jax.random.PRNGKey(0)).eval()


@pytest.fixture(scope="module")
def prompts():
    rng = np.random.default_rng(0)
    return (jnp.asarray(rng.integers(3, V, (3, 6)), jnp.int32),
            jnp.asarray([6, 4, 2], jnp.int32))


def test_beam1_equals_greedy(model, prompts):
    prompt, plen = prompts
    g = greedy_generate(model, prompt, plen, 10, eos_id=jnp.asarray(1))
    b = beam_search_generate(model, prompt, plen, 10, beam_size=1, eos_id=1)
    # compare the generated region of each row (prompt tails differ: greedy
    # leaves pad tokens, beam rewrites from its buffer — both keep prompts)
    for r in range(3):
        p = int(plen[r])
        np.testing.assert_array_equal(np.asarray(g[r, :p]),
                                      np.asarray(b[r, :p]))
        ge = np.asarray(g[r, p:])
        be = np.asarray(b[r, p:])
        # up to first EOS the continuations must match exactly
        stop = np.where(ge == 1)[0]
        n = stop[0] + 1 if stop.size else len(ge)
        np.testing.assert_array_equal(ge[:n], be[:n])


def test_rows_independent(model, prompts):
    prompt, plen = prompts
    full = beam_search_generate(model, prompt, plen, 8, beam_size=4, eos_id=1)
    solo = beam_search_generate(model, prompt[1:2], plen[1:2], 8,
                                beam_size=4, eos_id=1)
    np.testing.assert_array_equal(np.asarray(full[1]), np.asarray(solo[0]))


def test_eos_freezes_and_pads(model, prompts):
    prompt, plen = prompts
    out = np.asarray(beam_search_generate(model, prompt, plen, 12,
                                          beam_size=4, eos_id=1))
    for r in range(out.shape[0]):
        gen = out[r, int(plen[r]):]
        hits = np.where(gen == 1)[0]
        if hits.size:
            assert np.all(gen[hits[0]:] == 1)


def test_beam_score_at_least_greedy(model, prompts):
    """With no reachable EOS and length_penalty=0, hypotheses all have the
    same length and beam-4's best joint log-prob must be >= greedy's (greedy
    is the depth-first path; beam keeps 4 candidates per step, and with
    beam >= 1 its RETURNED best is the max over a superset of searched
    completions only in general heuristically — so allow exact ties but
    fail on regressions where beam returns something WORSE)."""
    prompt, plen = prompts

    def joint_logprob(seq_row, p):
        toks = jnp.asarray(seq_row[None], jnp.int32)
        logits = model(toks)[0]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        idx = np.arange(p - 1, seq_row.shape[0] - 1)
        return float(sum(logp[i, seq_row[i + 1]] for i in idx))

    g = np.asarray(greedy_generate(model, prompt, plen, 8,
                                   eos_id=jnp.asarray(V + 5)))
    b = np.asarray(beam_search_generate(model, prompt, plen, 8, beam_size=4,
                                        eos_id=V + 5, length_penalty=0.0))
    for r in range(3):
        p = int(plen[r])
        tot = p + 8
        sg = joint_logprob(g[r, :tot], p)
        sb = joint_logprob(b[r, :tot], p)
        assert sb >= sg - 1e-4, (r, sg, sb)

"""KV-cached decode correctness: step-by-step decode must match the full
forward pass (the invariant that makes caching exact), and greedy_generate
must reproduce the reference-style no-cache greedy loop."""

import jax
import jax.numpy as jnp
import numpy as np

import flashattn_tpu as ft
from flashattn_tpu.training.generate import greedy_generate


def _model(seed=0, n_vocab=64, n_embd=32, n_head=4, n_pos=24, n_layer=2):
    return ft.DecoderLM(n_vocab, n_embd, n_head, n_pos, p_dropout=0.0,
                        n_layer=n_layer, attn_impl="reference",
                        key=jax.random.PRNGKey(seed)).eval()


def test_decode_matches_forward():
    model = _model()
    idx = jax.random.randint(jax.random.PRNGKey(1), (3, 10), 0, 64)
    full_logits = model(idx)  # (3, 10, 64)

    caches = model.init_cache(3, 10)
    outs = []
    for i in range(10):
        logits, caches = model.forward_decode(idx[:, i:i + 1], caches, i)
        outs.append(logits[:, 0])
    step_logits = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(step_logits, full_logits, atol=1e-4, rtol=1e-4)


def test_greedy_generate_matches_nocache_loop():
    model = _model(seed=2)
    prompt = jax.random.randint(jax.random.PRNGKey(3), (2, 6), 0, 64)
    out = greedy_generate(model, prompt, 6, 8)
    assert out.shape == (2, 14)
    np.testing.assert_array_equal(np.asarray(out[:, :6]), np.asarray(prompt))

    # reference-style loop: full forward per token, argmax of last position
    ids = prompt
    for _ in range(8):
        logits = model(ids)
        nxt = jnp.argmax(logits[:, -1], axis=-1)[:, None]
        ids = jnp.concatenate([ids, nxt.astype(jnp.int32)], axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ids))


def test_greedy_generate_eos_padding():
    model = _model(seed=4)
    prompt = jax.random.randint(jax.random.PRNGKey(5), (1, 4), 0, 64)
    out = greedy_generate(model, prompt, 4, 10, jnp.asarray(7))
    seq = np.asarray(out[0, 4:])
    hits = np.where(seq == 7)[0]
    if len(hits):  # everything after first eos must stay eos
        assert (seq[hits[0]:] == 7).all()


def test_generate_engine_matches_generate():
    """The serving-engine eval path (`--decode engine`) produces the exact
    sentences of the batched KV-cached greedy path — continuous batching
    and prompt-lookup are throughput optimisations, not semantics."""
    from flashattn_tpu.training.translation import generate, generate_engine

    class _Tok:
        """Minimal tokenizer double over integer 'words'."""
        vocab = {"<pad>": 0, "<eos_de>": 1, "<eos_en>": 2}

        def __call__(self, text):
            ids = []
            for w in text.replace("<eos_de>", " <eos_de> ").split():
                ids.append(self.vocab.setdefault(w, len(self.vocab)))
            return {"input_ids": ids}

        def decode(self, ids):
            inv = {v: k for k, v in self.vocab.items()}
            return " ".join(inv.get(i, "?") for i in ids)

    tok = _Tok()
    model = _model(seed=7, n_pos=48)
    examples = [{"de": "w3 w4 w5", "en": ""},
                {"de": "w6 w7", "en": ""},
                {"de": "w3 w4 w3 w4 w3", "en": ""}]
    base = generate(model, examples, "de", "en", tok, 16)
    eng = generate_engine(model, examples, "de", "en", tok, 16, max_batch=2)
    assert eng == base, (eng, base)

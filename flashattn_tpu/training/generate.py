"""KV-cached autoregressive generation.

Replaces the reference's generate loop (run_machine_translation.py:271-328),
which re-runs the full model per produced token with no cache (O(len^2) model
invocations, one example at a time).  Here: one jitted ``lax.scan`` over
decode steps with a static-shape KV cache -- batched, variable-length
prompts, device-resident, compiled once per (batch, length) configuration.
"""

from __future__ import annotations

import functools
from typing import Optional, Union

import jax
import jax.numpy as jnp

Array = jax.Array


@functools.partial(jax.jit, static_argnums=(3,))
def _generate_scan(model, buf: Array, plen: Array, total: int,
                   eos_id: Optional[Array]) -> Array:
    b = buf.shape[0]
    caches = model.init_cache(b, total)
    done = jnp.zeros((b,), bool)

    def step(carry, i):
        buf, caches, done = carry
        tok = jax.lax.dynamic_slice_in_dim(buf, i, 1, axis=1)   # (B, 1)
        logits, caches = model.forward_decode(tok, caches, i)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)

        in_gen = (i + 1) >= plen                                 # (B,) bool
        if eos_id is not None:
            eos = jnp.asarray(eos_id, jnp.int32)
            nxt = jnp.where(done, eos, nxt)
            done = done | (in_gen & (nxt == eos))

        nxt_pos = jnp.minimum(i + 1, total - 1)
        cur = jax.lax.dynamic_slice_in_dim(buf, nxt_pos, 1, axis=1)[:, 0]
        new_tok = jnp.where(in_gen, nxt, cur)
        buf = jax.lax.dynamic_update_slice_in_dim(
            buf, new_tok[:, None], nxt_pos, axis=1
        )
        return (buf, caches, done), None

    (buf, _, _), _ = jax.lax.scan(step, (buf, caches, done), jnp.arange(total - 1))
    return buf


def greedy_generate(model, prompt: Array,
                    prompt_len: Union[int, Array], max_new_tokens: int,
                    eos_id: Optional[Array] = None) -> Array:
    """Greedy decode with per-example prompt lengths.

    prompt:     (B, max_prompt) int ids, padded arbitrarily past each
                example's ``prompt_len``.
    prompt_len: scalar or (B,) actual prompt lengths.
    Returns (B, max_prompt + max_new_tokens); past ``eos_id`` the output is
    padded with eos.
    """
    b, max_prompt = prompt.shape
    total = max_prompt + max_new_tokens
    model = model.eval()
    plen = jnp.broadcast_to(jnp.asarray(prompt_len, jnp.int32), (b,))
    buf = jnp.concatenate(
        [prompt.astype(jnp.int32), jnp.zeros((b, max_new_tokens), jnp.int32)],
        axis=1,
    )
    return _generate_scan(model, buf, plen, total, eos_id)


# ---------------------------------------------------------------------------
# Encoder-decoder generation
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(3,))
def _seq2seq_scan(model, src: Array, src_lens: Array, max_new: int,
                  bos_id: Array, eos_id: Optional[Array]) -> Array:
    b = src.shape[0]
    memory = model.encode(src, src_lens)
    cross_kvs = model.precompute_cross(memory)
    caches = model.init_cache(b, max_new)
    done = jnp.zeros((b,), bool)
    tok = jnp.full((b, 1), bos_id, jnp.int32)

    def step(carry, i):
        tok, caches, done = carry
        logits, caches = model.forward_decode(tok, caches, cross_kvs, i,
                                              src_lens)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        if eos_id is not None:
            eos = jnp.asarray(eos_id, jnp.int32)
            nxt = jnp.where(done, eos, nxt)
            done = done | (nxt == eos)
        return (nxt[:, None], caches, done), nxt

    _, out = jax.lax.scan(step, (tok, caches, done), jnp.arange(max_new))
    return out.T                                            # (B, max_new)


def greedy_generate_seq2seq(model, src: Array, src_lens, max_new_tokens: int,
                            bos_id: int, eos_id: Optional[int] = None) -> Array:
    """Greedy decode from an :class:`EncoderDecoderLM`.

    One encoder pass + one cross-K/V projection, then ``max_new_tokens``
    cached decode steps in a single jitted ``lax.scan`` — vs the reference's
    full-model re-run per token (run_machine_translation.py:300-323).
    Returns (B, max_new_tokens) ids, padded with ``eos_id`` once emitted.
    """
    b = src.shape[0]
    model = model.eval()
    lens = jnp.broadcast_to(jnp.asarray(src_lens, jnp.int32), (b,))
    return _seq2seq_scan(model, src.astype(jnp.int32), lens, max_new_tokens,
                         jnp.asarray(bos_id, jnp.int32), eos_id)


# ---------------------------------------------------------------------------
# Beam search
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(3, 4, 6))
def _beam_scan(model, buf, plen, total: int, beam: int, eos_id,
               length_penalty: float):
    """buf: (B*beam, total) with prompts replicated per beam."""
    bb = buf.shape[0]
    b = bb // beam
    caches = model.init_cache(bb, total)
    neg = jnp.float32(-1e30)
    # only beam 0 live initially, so the first expansion draws `beam`
    # DISTINCT tokens from it instead of `beam` copies of the argmax
    scores = jnp.tile(jnp.concatenate(
        [jnp.zeros((1,)), jnp.full((beam - 1,), neg)])[None], (b, 1))
    done = jnp.zeros((b, beam), bool)
    gen_len = jnp.zeros((b, beam), jnp.int32)
    eos = jnp.asarray(eos_id, jnp.int32)
    beam_iota = jnp.arange(beam, dtype=jnp.int32)[None]          # (1, beam)

    def step(carry, i):
        buf, caches, scores, done, gen_len = carry
        tok = jax.lax.dynamic_slice_in_dim(buf, i, 1, axis=1)    # (BB, 1)
        logits, caches = model.forward_decode(tok, caches, i)
        logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), -1)
        v = logp.shape[-1]
        logp = logp.reshape(b, beam, v)

        # finished beams may only extend with EOS, at unchanged score
        eos_only = jnp.full((v,), neg).at[eos].set(0.0)
        cand = scores[:, :, None] + jnp.where(done[:, :, None],
                                              eos_only[None, None], logp)
        top_s, top_i = jax.lax.top_k(cand.reshape(b, beam * v), beam)
        parent = (top_i // v).astype(jnp.int32)                  # (B, beam)
        new_tok = (top_i % v).astype(jnp.int32)

        # prompt phase (per row): follow the prompt verbatim, keep state
        in_gen = (i + 1) >= plen.reshape(b, beam)[:, :1]         # (B, 1)
        nxt_pos = jnp.minimum(i + 1, total - 1)
        cur = jax.lax.dynamic_slice_in_dim(buf, nxt_pos, 1, 1)   # (BB, 1)
        parent = jnp.where(in_gen, parent, beam_iota)
        new_tok = jnp.where(in_gen, new_tok, cur.reshape(b, beam))
        scores = jnp.where(in_gen, top_s, scores)

        # reorder every per-beam state by parent (flat gather on axis 0)
        flat = (jnp.arange(b, dtype=jnp.int32)[:, None] * beam
                + parent).reshape(-1)
        caches = jax.tree_util.tree_map(lambda c: c[flat], caches)
        buf = buf[flat]
        done = done.reshape(-1)[flat].reshape(b, beam)
        gen_len = gen_len.reshape(-1)[flat].reshape(b, beam)

        gen_len = gen_len + (in_gen & ~done)
        done = done | (in_gen & (new_tok == eos))
        buf = jax.lax.dynamic_update_slice_in_dim(
            buf, new_tok.reshape(-1, 1), nxt_pos, axis=1)
        return (buf, caches, scores, done, gen_len), None

    (buf, _, scores, done, gen_len), _ = jax.lax.scan(
        step, (buf, caches, scores, done, gen_len),
        jnp.arange(total - 1))

    # length-normalised selection (GNMT-style denominator)
    denom = ((5.0 + jnp.maximum(gen_len, 1)) / 6.0) ** length_penalty
    best = jnp.argmax(scores / denom, axis=1)                    # (B,)
    buf = buf.reshape(b, beam, total)
    return jnp.take_along_axis(buf, best[:, None, None], 1)[:, 0], scores


def beam_search_generate(model, prompt: Array,
                         prompt_len: Union[int, Array],
                         max_new_tokens: int, beam_size: int,
                         eos_id: int, length_penalty: float = 0.6) -> Array:
    """Beam-search decode with a KV cache, one jitted ``lax.scan``.

    The (batch, beam) axes fold into one device batch; each step expands
    every live beam over the vocab, takes the per-row top ``beam_size``
    continuations, and REORDERS the KV caches by the parent-beam gather —
    the standard beam bookkeeping, kept device-side.  Finished beams freeze
    (EOS self-loop at unchanged score); selection divides by the GNMT
    length penalty.  The reference's generate is greedy one-by-one with no
    cache (run_machine_translation.py:271-328).

    Known cost: the prompt phase runs with beams already replicated (they
    stay in lockstep via the identity parent), paying beam_size x the
    prompt FLOPs.  Fine for MT-scale prompts; for long prompts, prefill at
    batch B and tile the caches before calling (ragged per-row prompt ends
    make the in-scan handoff the simpler correct choice here).

    Returns (B, max_prompt + max_new_tokens): each row's best hypothesis.
    """
    b, max_prompt = prompt.shape
    total = max_prompt + max_new_tokens
    model = model.eval()
    plen = jnp.broadcast_to(jnp.asarray(prompt_len, jnp.int32), (b,))
    buf = jnp.concatenate(
        [prompt.astype(jnp.int32), jnp.zeros((b, max_new_tokens), jnp.int32)],
        axis=1)
    # replicate rows per beam: (B, total) -> (B*beam, total)
    buf = jnp.repeat(buf, beam_size, axis=0)
    plen = jnp.repeat(plen, beam_size)
    out, _ = _beam_scan(model, buf, plen, total, beam_size, eos_id,
                        length_penalty)
    return out

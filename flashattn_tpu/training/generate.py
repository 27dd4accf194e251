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

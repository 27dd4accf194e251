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

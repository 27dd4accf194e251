"""Continuous-batching decode engine over a paged KV cache.

Serving-path capability with no reference equivalent (the reference's
generation re-runs the full model per token per example,
run_machine_translation.py:300-323).  BASELINE.json configs[3] names it:
"paged KV-cache + continuous batching".

Design (vLLM-style scheduling, TPU-shaped execution):

* the DEVICE step is one static-shape jitted program: every slot of a fixed
  max_batch decodes one token against per-layer page pools
  (``DecoderLM.forward_decode_paged`` → the Pallas paged-attention kernel,
  whose dynamic length loop means empty/short slots cost only the pages they
  actually have);
* the HOST scheduler (this module, plain numpy — no device sync beyond the
  sampled tokens) admits queued requests into free slots mid-flight, allocates
  physical pages from a free list as sequences cross page boundaries, and
  retires finished sequences, returning their pages to the pool;
* prefill feeds prompt tokens through the same decode step (teacher-forced),
  so admission never recompiles — one program serves every mix of prefill
  and decode.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class PagePool:
    """Host-side free list of physical page ids."""

    def __init__(self, total_pages: int):
        self.free: List[int] = list(range(total_pages - 1, -1, -1))
        self.total = total_pages

    def alloc(self) -> int:
        if not self.free:
            raise RuntimeError("page pool exhausted")
        return self.free.pop()

    def release(self, pages: List[int]) -> None:
        self.free.extend(pages)

    @property
    def n_free(self) -> int:
        return len(self.free)


@dataclasses.dataclass
class Request:
    """One generation request."""

    prompt: List[int]
    max_new_tokens: int
    eos_id: Optional[int] = None
    # filled by the engine:
    uid: int = -1
    generated: List[int] = dataclasses.field(default_factory=list)
    # per-step next-token logits (engine built with collect_logits=True):
    # one row per consumed position, prefill included
    logits: List[np.ndarray] = dataclasses.field(default_factory=list)
    done: bool = False


@dataclasses.dataclass
class _Slot:
    request: Request
    pages: List[int]
    length: int = 0          # tokens already in the KV cache
    next_input: int = 0      # token id to feed at position `length`
    prompt_cursor: int = 1   # prompt tokens consumed (first fed at admit)


class ContinuousBatchingEngine:
    """Greedy continuous-batching decoder for a :class:`DecoderLM`."""

    def __init__(self, model, *, max_batch: int = 8, page_size: int = 128,
                 pages_per_seq: int = 16, total_pages: Optional[int] = None,
                 dtype=jnp.float32, collect_logits: bool = False):
        self.model = model.eval()
        self.max_batch = max_batch
        self.page_size = page_size
        self.pages_per_seq = pages_per_seq
        total_pages = total_pages or max_batch * pages_per_seq
        self.pool = PagePool(total_pages)

        # One extra physical page (id = total_pages) absorbs the K/V writes
        # of INACTIVE slots: the device step is static-shape, so empty slots
        # still scatter their dummy token somewhere — without a trash page
        # they'd stomp physical page 0, which belongs to a live request.
        self._trash_page = total_pages
        self.pools = self.model.init_page_pools(total_pages + 1, page_size,
                                                dtype)
        self.page_table = np.full((max_batch, pages_per_seq),
                                  self._trash_page, np.int32)
        self.slots: List[Optional[_Slot]] = [None] * max_batch
        self.queue: List[Request] = []
        self.finished: List[Request] = []
        self._uid = 0

        self.collect_logits = collect_logits

        @jax.jit
        def _step(model, pools, tokens, table, lengths):
            logits, pools = model.forward_decode_paged(
                tokens[:, None], pools, table, lengths)
            out = logits[:, 0] if collect_logits else None
            return pools, jnp.argmax(logits[:, 0], axis=-1), out

        self._jit_step = _step

    # -- public API ----------------------------------------------------------

    def submit(self, prompt: List[int], max_new_tokens: int,
               eos_id: Optional[int] = None) -> Request:
        req = Request(list(prompt), max_new_tokens, eos_id, uid=self._uid)
        self._uid += 1
        self.queue.append(req)
        return req

    def run(self, max_steps: int = 10_000) -> List[Request]:
        """Drive until every submitted request finishes; returns them."""
        for _ in range(max_steps):
            if not self.step():
                break
        return self.finished

    # -- scheduler ------------------------------------------------------------

    def _admit(self) -> None:
        for i in range(self.max_batch):
            if self.slots[i] is not None or not self.queue:
                continue
            if self.pool.n_free == 0:
                break
            req = self.queue.pop(0)
            first = self.pool.alloc()
            self.page_table[i, 0] = first
            self.slots[i] = _Slot(req, [first], length=0,
                                  next_input=req.prompt[0], prompt_cursor=1)

    def _retire(self, i: int) -> None:
        slot = self.slots[i]
        slot.request.done = True
        self.finished.append(slot.request)
        self.pool.release(slot.pages)
        self.slots[i] = None
        self.page_table[i, 0] = self._trash_page  # idle writes go to trash

    def step(self) -> bool:
        """One engine iteration: admit, decode one token per active slot,
        advance/retire.  Returns False when idle (nothing queued or active)."""
        self._admit()
        active = [i for i, s in enumerate(self.slots) if s is not None]
        if not active:
            return bool(self.queue)

        tokens = np.zeros((self.max_batch,), np.int32)
        lengths = np.zeros((self.max_batch,), np.int32)
        for i in active:
            tokens[i] = self.slots[i].next_input
            lengths[i] = self.slots[i].length

        self.pools, sampled, step_logits = self._jit_step(
            self.model, self.pools, jnp.asarray(tokens),
            jnp.asarray(self.page_table), jnp.asarray(lengths))
        sampled = np.asarray(sampled)
        if self.collect_logits:
            step_logits = np.asarray(step_logits)
            for i in active:
                self.slots[i].request.logits.append(step_logits[i])

        for i in active:
            slot = self.slots[i]
            req = slot.request
            slot.length += 1
            # allocate the next page just-in-time
            if (slot.length % self.page_size == 0
                    and slot.length // self.page_size < self.pages_per_seq
                    and not (req.done)):
                page = self.pool.alloc()
                slot.pages.append(page)
                self.page_table[i, len(slot.pages) - 1] = page

            if slot.prompt_cursor < len(req.prompt):
                # still prefilling: force the next prompt token
                slot.next_input = req.prompt[slot.prompt_cursor]
                slot.prompt_cursor += 1
                continue

            tok = int(sampled[i])
            req.generated.append(tok)
            slot.next_input = tok
            hit_eos = req.eos_id is not None and tok == req.eos_id
            out_of_room = slot.length + 1 >= self.pages_per_seq * self.page_size
            if (len(req.generated) >= req.max_new_tokens or hit_eos
                    or out_of_room):
                self._retire(i)
        return True

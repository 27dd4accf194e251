"""Paged attention decode kernel vs dense oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattn_tpu.ops.paged_attention import paged_attention, paged_attention_reference
from flashattn_tpu.ops.quant import quantize_int8


def _setup(b=3, hq=4, hkv=2, d=32, page=16, n_pages=12, pages_per_seq=4, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (b, hq, d))
    k_pages = jax.random.normal(ks[1], (hkv, n_pages, page, d))
    v_pages = jax.random.normal(ks[2], (hkv, n_pages, page, d))
    # non-contiguous page tables, disjoint-ish per sequence
    page_indices = jax.random.permutation(
        ks[3], jnp.arange(n_pages))[: b * pages_per_seq].reshape(b, pages_per_seq)
    lengths = jnp.asarray([page * pages_per_seq, page * 2 + 5, 1], jnp.int32)[:b]
    return q, k_pages, v_pages, lengths, page_indices


def test_paged_attention_matches_oracle():
    q, kp, vp, lengths, pidx = _setup()
    out = paged_attention(q, kp, vp, lengths, pidx_arg(pidx))
    ref = paged_attention_reference(q, kp, vp, lengths, pidx_arg(pidx))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def pidx_arg(p):
    return p.astype(jnp.int32)


def test_paged_attention_gqa_grouping():
    # 8 query heads share 2 kv heads
    q, kp, vp, lengths, pidx = _setup(hq=8, hkv=2)
    out = paged_attention(q, kp, vp, lengths, pidx)
    ref = paged_attention_reference(q, kp, vp, lengths, pidx)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_paged_attention_short_lengths():
    # length=1: only the first token of the first page attends
    q, kp, vp, _, pidx = _setup()
    lengths = jnp.asarray([1, 1, 1], jnp.int32)
    out = paged_attention(q, kp, vp, lengths, pidx)
    ref = paged_attention_reference(q, kp, vp, lengths, pidx)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_paged_attention_int8_pages():
    q, kp, vp, lengths, pidx = _setup(seed=3)
    hkv, n_pages, page, d = kp.shape
    kq = quantize_int8(kp.reshape(-1, d)).values.reshape(kp.shape)
    ksc = quantize_int8(kp.reshape(-1, d)).scales.reshape(hkv, n_pages, page, 1)
    vq = quantize_int8(vp.reshape(-1, d)).values.reshape(vp.shape)
    vsc = quantize_int8(vp.reshape(-1, d)).scales.reshape(hkv, n_pages, page, 1)
    out = paged_attention(q, kq, vq, lengths, pidx, k_scales=ksc, v_scales=vsc)
    ref = paged_attention_reference(q, kq, vq, lengths, pidx, ksc, vsc)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-3)


def test_paged_attention_jit():
    q, kp, vp, lengths, pidx = _setup(seed=5)
    out = jax.jit(paged_attention)(q, kp, vp, lengths, pidx)
    ref = paged_attention_reference(q, kp, vp, lengths, pidx)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)

"""Pallas flash attention vs jnp oracle.

Mirrors the reference's test strategy (tests/test_flash_attention.py:24-186):
sweep (batch, seq, heads, head_dim) x {causal, non-causal}, forward and
backward against a full-softmax oracle, plus central-difference grad checks.
The oracle plays the role torch plays in the reference.  Shapes are scaled
down vs the reference's V100 sweep because tests run interpreted on CPU; the
full-size sweep runs compiled in bench.py / kernel_bench on the real chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import functools

from flashattn_tpu import flash_attention as _flash_attention, flash_attention_reference

# pin the Pallas kernel: this file tests the kernel (auto dispatches small
# seqs to the XLA path)
flash_attention = functools.partial(_flash_attention, impl="pallas")
from flashattn_tpu.autodiff import grad_check

# (batch, heads, seq, head_dim); the 48/33 cases exercise the
# non-tileable fallback path
SHAPES = [
    (1, 1, 16, 16),
    (2, 4, 64, 32),
    (1, 2, 128, 64),
    (2, 2, 256, 16),
    (1, 1, 48, 24),
    (1, 2, 33, 16),
]


def _qkv(shape, seed=0, kv_len=None):
    b, h, n, d = shape
    key = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, n, d))
    nk = kv_len or n
    k = jax.random.normal(kk, (b, h, nk, d))
    v = jax.random.normal(kv, (b, h, nk, d))
    return q, k, v


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("causal", [False, True])
def test_forward_matches_oracle(shape, causal):
    q, k, v = _qkv(shape, seed=sum(shape))
    out = flash_attention(q, k, v, causal)
    ref = flash_attention_reference(q, k, v, causal)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_cross_attention_lengths(causal):
    # kv longer than q (generation-style shapes)
    q, k, v = _qkv((1, 2, 32, 16), seed=5, kv_len=128)
    if causal:
        pytest.skip("causal cross-attention alignment is ambiguous; not in reference")
    np.testing.assert_allclose(
        flash_attention(q, k, v, causal),
        flash_attention_reference(q, k, v, causal),
        atol=1e-5, rtol=1e-5,
    )


@pytest.mark.parametrize("shape", [(2, 2, 64, 32), (1, 2, 128, 16)])
@pytest.mark.parametrize("causal", [False, True])
def test_backward_matches_oracle(shape, causal):
    q, k, v = _qkv(shape, seed=11)
    dy = jax.random.normal(jax.random.PRNGKey(3), q.shape)

    def fused(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal) * dy)

    def oracle(q, k, v):
        return jnp.sum(flash_attention_reference(q, k, v, causal) * dy)

    g = jax.grad(fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g, gr, ["dq", "dk", "dv"]):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4, err_msg=name)


def test_grad_check_numerical():
    q, k, v = _qkv((1, 1, 16, 8), seed=13)
    grad_check(lambda q, k, v: flash_attention(q, k, v, True), q, k, v,
               n_samples=6, tol=2e-2, epsilon=1e-3)


def test_sm_scale_and_jit():
    q, k, v = _qkv((1, 2, 64, 32), seed=17)
    out = jax.jit(lambda q, k, v: flash_attention(q, k, v, False, 0.5))(q, k, v)
    ref = flash_attention_reference(q, k, v, False, 0.5)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_block_sizes_do_not_change_result():
    q, k, v = _qkv((1, 2, 256, 32), seed=19)
    base = flash_attention(q, k, v, True)
    for bq, bk in [(64, 64), (128, 32), (32, 128)]:
        out = flash_attention(q, k, v, True, None, bq, bk)
        np.testing.assert_allclose(out, base, atol=1e-5, rtol=1e-5)


def test_causal_first_row_attends_only_self():
    q, k, v = _qkv((1, 1, 32, 16), seed=23)
    out = flash_attention(q, k, v, True)
    np.testing.assert_allclose(out[0, 0, 0], v[0, 0, 0], atol=1e-5)


class TestVarlen:
    """flash_attention_varlen: per-row KV-prefix masking fused in-kernel."""

    def _args(self, b=3, h=2, n=128, d=32, seed=0):
        ks = jax.random.split(jax.random.PRNGKey(seed), 3)
        q = jax.random.normal(ks[0], (b, h, n, d))
        k = jax.random.normal(ks[1], (b, h, n, d))
        v = jax.random.normal(ks[2], (b, h, n, d))
        lengths = jnp.asarray([n, n // 2, 17], jnp.int32)
        return q, k, v, lengths

    @pytest.mark.parametrize("causal", [False, True])
    def test_forward(self, causal):
        from flashattn_tpu.ops.flash_attention import flash_attention_varlen

        q, k, v, lengths = self._args()
        got = flash_attention_varlen(q, k, v, lengths, causal, impl="pallas")
        want = flash_attention_reference(q, k, v, causal, kv_lengths=lengths)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    def test_backward(self):
        from flashattn_tpu.ops.flash_attention import flash_attention_varlen

        q, k, v, lengths = self._args(seed=1)
        dy = jax.random.normal(jax.random.PRNGKey(9), q.shape)

        def loss_k(q, k, v):
            return jnp.sum(flash_attention_varlen(
                q, k, v, lengths, True, impl="pallas") * dy)

        def loss_r(q, k, v):
            return jnp.sum(flash_attention_reference(
                q, k, v, True, kv_lengths=lengths) * dy)

        g = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
        for a, b_, nm in zip(g, gr, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-4, rtol=1e-3,
                                       err_msg=f"d{nm}")
        # grads w.r.t. masked-out K/V positions are zero
        dk = np.asarray(g[1])
        assert np.abs(dk[2, :, 17:]).max() == 0.0

    def test_zero_length_row(self):
        from flashattn_tpu.ops.flash_attention import flash_attention_varlen

        q, k, v, _ = self._args(seed=2)
        lengths = jnp.asarray([128, 1, 0], jnp.int32)
        out = flash_attention_varlen(q, k, v, lengths, False, impl="pallas")
        assert bool(jnp.isfinite(out).all())
        # a zero-length row attends nothing -> zeros (empty-softmax guard)
        np.testing.assert_array_equal(np.asarray(out[2]), 0.0)

    def test_auto_dispatch_small_seq(self):
        from flashattn_tpu.ops.flash_attention import flash_attention_varlen

        q, k, v, lengths = self._args(n=64, seed=3)
        lengths = jnp.asarray([64, 30, 5], jnp.int32)
        got = flash_attention_varlen(q, k, v, lengths, True)  # auto -> jnp
        want = flash_attention_reference(q, k, v, True, kv_lengths=lengths)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


class TestGQA:
    """Grouped-query attention: Hq > Hkv, kv heads shared per group
    (kernel maps heads in the index maps — no k/v repeat materialised)."""

    def _args(self, hq=8, hkv=2, n=128, d=32, seed=0):
        ks = jax.random.split(jax.random.PRNGKey(seed), 3)
        q = jax.random.normal(ks[0], (2, hq, n, d))
        k = jax.random.normal(ks[1], (2, hkv, n, d))
        v = jax.random.normal(ks[2], (2, hkv, n, d))
        return q, k, v

    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("hq,hkv", [(8, 2), (4, 1)])
    def test_forward(self, causal, hq, hkv):
        # module-level partial pins impl="pallas": at seq 128 "auto" would
        # dispatch to the jnp path and compare the oracle against itself,
        # never running the kernel's GQA index-map folding.
        q, k, v = self._args(hq, hkv)
        got = flash_attention(q, k, v, causal)
        want = flash_attention_reference(q, k, v, causal)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    @pytest.mark.parametrize("impl", ["auto", "pallas"])
    def test_backward(self, impl):
        # "pallas" forces the kernel path (incl. the dK/dV group-sum);
        # "auto" covers the jnp-fallback vjp at this sub-threshold seq.
        q, k, v = self._args(seed=1)
        dy = jax.random.normal(jax.random.PRNGKey(9), q.shape)

        g = jax.grad(lambda q, k, v: jnp.sum(
            _flash_attention(q, k, v, True, impl=impl) * dy),
            argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda q, k, v: jnp.sum(
            flash_attention_reference(q, k, v, True) * dy),
            argnums=(0, 1, 2))(q, k, v)
        for a, b, nm in zip(g, gr, "qkv"):
            assert a.shape == b.shape, nm  # dk/dv in the ORIGINAL kv shape
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-3,
                                       err_msg=f"d{nm}")

    def test_bad_head_counts_raise(self):
        q, k, v = self._args(hq=6, hkv=4)
        with pytest.raises(ValueError, match="multiple of kv heads"):
            flash_attention(q, k, v)
        with pytest.raises(ValueError, match="multiple of kv heads"):
            flash_attention_reference(q, k, v)
        with pytest.raises(ValueError, match="must match"):
            flash_attention(q, k[:, :2], v)

    def test_varlen_gqa(self):
        from flashattn_tpu.ops.flash_attention import flash_attention_varlen

        q, k, v = self._args(seed=2)
        lengths = jnp.asarray([128, 40], jnp.int32)
        got = flash_attention_varlen(q, k, v, lengths, True, impl="pallas")
        want = flash_attention_reference(q, k, v, True, kv_lengths=lengths)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


class TestDiagSubtile:
    """diag_subtile strips the boundary tiles' score dot: exactness vs the
    oracle across causal / window / varlen, and argument validation."""

    def test_causal_matches_oracle(self):
        q, k, v = _qkv((1, 2, 512, 32), seed=41)
        out = flash_attention(q, k, v, True, None, 128, 256,
                              diag_subtile=128)
        ref = flash_attention_reference(q, k, v, True)
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)

    def test_window_matches_oracle(self):
        q, k, v = _qkv((1, 1, 512, 32), seed=43)
        out = flash_attention(q, k, v, True, None, 128, 256, window=200,
                              diag_subtile=128)
        ref = flash_attention_reference(q, k, v, True, window=200)
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)

    def test_varlen_matches_oracle(self):
        from flashattn_tpu.ops.flash_attention import (
            _reference_fwd_with_lse, flash_attention_varlen)
        q, k, v = _qkv((3, 1, 512, 32), seed=47)
        lens = jnp.asarray([512, 300, 32], jnp.int32)
        out = flash_attention_varlen(q, k, v, lens, True, block_q=128,
                                     block_k=256, impl="pallas",
                                     diag_subtile=128)
        ref, _ = _reference_fwd_with_lse(q, k, v, True, 1.0 / 32**0.5,
                                         kv_lengths=lens)
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)

    def test_gradients_match_plain_backward(self):
        """Strip-wise dQ (column strips) and dKV (row strips) must equal the
        full-tile backward: strip accumulation is additive, so only float
        reduction order differs."""
        q, k, v = _qkv((1, 1, 512, 32), seed=53)

        def f(sub):
            def g(q_, k_, v_):
                return jnp.sum(flash_attention(q_, k_, v_, True, None, 128,
                                               256, diag_subtile=sub))
            return jax.grad(g, argnums=(0, 1, 2))(q, k, v)

        for a, b in zip(f(128), f(0)):
            np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)

    def test_gqa_gradients_match_oracle(self):
        """Row-strip dKV composes with the GQA group grid axis."""
        b, hq, hkv, n, d = 1, 4, 1, 512, 32
        key = jax.random.PRNGKey(61)
        kq, kk, kv_ = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, hq, n, d))
        k = jax.random.normal(kk, (b, hkv, n, d))
        v = jax.random.normal(kv_, (b, hkv, n, d))

        def g(fn):
            return jax.grad(lambda q_, k_, v_: jnp.sum(fn(q_, k_, v_)),
                            argnums=(0, 1, 2))(q, k, v)

        got = g(lambda q_, k_, v_: flash_attention(
            q_, k_, v_, True, None, 256, 256, diag_subtile=128))
        want = g(lambda q_, k_, v_: flash_attention_reference(
            q_, k_, v_, True))
        for a, b_ in zip(got, want):
            np.testing.assert_allclose(a, b_, atol=1e-5, rtol=1e-5)

    def test_invalid_subtile_raises(self):
        q, k, v = _qkv((1, 1, 512, 32), seed=59)
        with pytest.raises(ValueError):
            flash_attention(q, k, v, True, None, 128, 256, diag_subtile=64)

    def test_non_dividing_subtile_falls_back(self):
        """A strip width that doesn't tile the (possibly auto-shrunk)
        block_k silently disables stripping instead of erroring."""
        q, k, v = _qkv((1, 1, 512, 32), seed=59)
        out = flash_attention(q, k, v, True, None, 128, 256,
                              diag_subtile=384)
        ref = flash_attention_reference(q, k, v, True)
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


class TestDiagSubtileBackwardMasks:
    """Backward strip conditions under window and varlen — the trickiest
    inequalities (dKV row strips see the window from the kv side, dQ column
    strips from the q side)."""

    def _grads(self, fn, q, k, v):
        return jax.grad(lambda a, b, c: jnp.sum(fn(a, b, c)),
                        argnums=(0, 1, 2))(q, k, v)

    def test_window_gradients_match_oracle(self):
        q, k, v = _qkv((1, 2, 512, 32), seed=71)
        got = self._grads(
            lambda a, b, c: flash_attention(a, b, c, True, None, 128, 256,
                                            window=200, diag_subtile=128),
            q, k, v)
        want = self._grads(
            lambda a, b, c: flash_attention_reference(a, b, c, True,
                                                      window=200),
            q, k, v)
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, atol=1e-5, rtol=1e-5)

    def test_varlen_gradients_match_oracle(self):
        from flashattn_tpu.ops.flash_attention import (
            _reference_fwd_with_lse, flash_attention_varlen)
        q, k, v = _qkv((3, 1, 512, 32), seed=73)
        lens = jnp.asarray([512, 300, 64], jnp.int32)
        got = self._grads(
            lambda a, b, c: flash_attention_varlen(
                a, b, c, lens, True, block_q=128, block_k=256,
                impl="pallas", diag_subtile=128), q, k, v)
        want = self._grads(
            lambda a, b, c: _reference_fwd_with_lse(
                a, b, c, True, 1.0 / 32**0.5, kv_lengths=lens)[0], q, k, v)
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, atol=1e-5, rtol=1e-5)

"""Rematerialisation (jax.checkpoint) through the model families.

The brief's memory lever for long-sequence training: wrap each transformer
block in ``jax.checkpoint`` so the backward pass recomputes layer
intermediates instead of saving them (saved residuals otherwise scale with
B*S*E*n_layer).  Remat must be semantics-preserving: identical logits,
identical gradients, and actually present in the jaxpr.
"""

import jax
import jax.numpy as jnp
import pytest

import flashattn_tpu as ft


def _tree_allclose(a, b, tol=1e-6):
    fa, _ = jax.tree_util.tree_flatten(a)
    fb, _ = jax.tree_util.tree_flatten(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        assert jnp.allclose(x, y, atol=tol, rtol=tol), float(
            jnp.max(jnp.abs(x - y)))


@pytest.mark.parametrize("policy", ["nothing", "dots"])
def test_decoder_remat_matches_plain(policy):
    kw = dict(n_vocab=128, n_embd=64, n_head=4, n_positions=64,
              p_dropout=0.1, n_layer=3, attn_impl="reference")
    base = ft.DecoderLM(**kw, key=jax.random.PRNGKey(0))
    rem = ft.DecoderLM(**kw, remat=True, remat_policy=policy,
                       key=jax.random.PRNGKey(0))
    # same init key -> same weights; only the remat flag differs
    data = jax.random.randint(jax.random.PRNGKey(1), (4, 32), 0, 128)
    drop_key = jax.random.PRNGKey(2)

    def loss(m):
        lg = m(data[:, :-1], key=drop_key)
        return jnp.mean(ft.F.softmax_loss(
            lg.reshape(-1, 128), data[:, 1:].reshape(-1)))

    l0, g0 = jax.value_and_grad(loss)(base)
    l1, g1 = jax.value_and_grad(loss)(rem)
    assert jnp.allclose(l0, l1, atol=1e-6)
    _tree_allclose(g0, g1, tol=1e-5)


def test_decoder_remat_in_jaxpr():
    model = ft.DecoderLM(n_vocab=64, n_embd=32, n_head=2, n_positions=32,
                         p_dropout=0.0, n_layer=2, attn_impl="reference",
                         remat=True, key=jax.random.PRNGKey(0))
    data = jnp.zeros((2, 16), jnp.int32)
    jaxpr = str(jax.make_jaxpr(
        lambda m: jnp.sum(m(data)))(model))
    assert "remat" in jaxpr  # checkpoint regions survive tracing
    plain = ft.DecoderLM(n_vocab=64, n_embd=32, n_head=2, n_positions=32,
                         p_dropout=0.0, n_layer=2, attn_impl="reference",
                         key=jax.random.PRNGKey(0))
    assert "remat" not in str(jax.make_jaxpr(
        lambda m: jnp.sum(m(data)))(plain))


def test_seq2seq_remat_matches_plain():
    kw = dict(n_vocab=96, n_embd=64, n_head=4, n_positions=48,
              p_dropout=0.0, n_encoder_layer=2, n_decoder_layer=2,
              attn_impl="reference")
    base = ft.EncoderDecoderLM(**kw, key=jax.random.PRNGKey(0))
    rem = ft.EncoderDecoderLM(**kw, remat=True, key=jax.random.PRNGKey(0))
    src = jax.random.randint(jax.random.PRNGKey(1), (3, 20), 0, 96)
    tgt = jax.random.randint(jax.random.PRNGKey(2), (3, 16), 0, 96)
    lens = jnp.asarray([20, 7, 1], jnp.int32)

    def loss(m):
        lg = m(src, tgt, src_lens=lens)
        return jnp.mean(ft.F.softmax_loss(
            lg.reshape(-1, 96), tgt.reshape(-1)))

    l0, g0 = jax.value_and_grad(loss)(base)
    l1, g1 = jax.value_and_grad(loss)(rem)
    assert jnp.allclose(l0, l1, atol=1e-6)
    _tree_allclose(g0, g1, tol=1e-5)


def test_remat_with_flash_kernel_and_moe():
    """checkpoint must compose with the custom_vjp flash kernel and the MoE
    aux-loss path (the production training configuration)."""
    model = ft.DecoderLM(n_vocab=64, n_embd=64, n_head=4, n_positions=256,
                         p_dropout=0.0, n_layer=2, attn_impl="flash",
                         n_experts=4, remat=True, key=jax.random.PRNGKey(0))
    data = jax.random.randint(jax.random.PRNGKey(1), (2, 256), 0, 64)

    def loss(m):
        lg, aux = m.forward_with_aux(data[:, :-1])
        return jnp.mean(ft.F.softmax_loss(
            lg.reshape(-1, 64), data[:, 1:].reshape(-1))) + 0.01 * aux

    l, g = jax.value_and_grad(loss)(model)
    assert jnp.isfinite(l)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)

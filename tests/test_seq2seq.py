"""Encoder-decoder (seq2seq) model family.

No reference equivalent to mirror (the reference is decoder-only); the
invariants tested here are the structural ones that define the architecture:
decoder causality, encoder pad invariance, cached-decode consistency with
teacher forcing, and end-to-end learnability on a copy task.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flashattn_tpu as ft
from flashattn_tpu.training.generate import greedy_generate_seq2seq

V, E, H, P = 50, 32, 4, 64


@pytest.fixture(scope="module")
def model():
    return ft.EncoderDecoderLM(
        V, E, H, P, p_dropout=0.0, n_encoder_layer=2, n_decoder_layer=2,
        middle_dim=64, attn_impl="reference",
        key=jax.random.PRNGKey(0)).eval()


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(1, V, (3, 12)), jnp.int32)
    tgt = jnp.asarray(rng.integers(1, V, (3, 10)), jnp.int32)
    src_lens = jnp.asarray([12, 7, 4], jnp.int32)
    return src, tgt, src_lens


def test_decoder_causality(model, batch):
    src, tgt, src_lens = batch
    base = model(src, tgt, src_lens)
    perturbed = tgt.at[:, 6].set((tgt[:, 6] + 1) % V)
    out = model(src, perturbed, src_lens)
    np.testing.assert_allclose(base[:, :6], out[:, :6], atol=1e-6)
    assert not np.allclose(base[:, 6:], out[:, 6:])


def test_encoder_pad_invariance(model, batch):
    src, tgt, src_lens = batch
    base = model(src, tgt, src_lens)
    # scribble over every src position past each row's length
    pos = jnp.arange(src.shape[1])[None, :]
    garbage = jnp.where(pos < src_lens[:, None], src, (src * 7 + 3) % V)
    out = model(garbage, tgt, src_lens)
    np.testing.assert_allclose(base, out, atol=1e-5, rtol=1e-5)
    # ...but valid src positions DO matter
    changed = src.at[:, 0].set((src[:, 0] + 1) % V)
    assert not np.allclose(base, model(changed, tgt, src_lens))


@pytest.mark.parametrize("impl", ["reference", "flash", "fused_softmax"])
def test_attn_impls_agree(batch, impl):
    src, tgt, src_lens = batch
    ref = ft.EncoderDecoderLM(
        V, E, H, P, p_dropout=0.0, n_encoder_layer=1, n_decoder_layer=1,
        middle_dim=64, attn_impl="reference", key=jax.random.PRNGKey(3)).eval()
    other = ft.EncoderDecoderLM(
        V, E, H, P, p_dropout=0.0, n_encoder_layer=1, n_decoder_layer=1,
        middle_dim=64, attn_impl=impl, key=jax.random.PRNGKey(3)).eval()
    np.testing.assert_allclose(ref(src, tgt, src_lens),
                               other(src, tgt, src_lens),
                               atol=2e-5, rtol=1e-4)


def test_cached_decode_matches_teacher_forcing(model, batch):
    src, tgt, src_lens = batch
    b, s_tgt = tgt.shape
    want = model(src, tgt, src_lens)                     # (B, S, V)

    memory = model.encode(src, src_lens)
    cross = model.precompute_cross(memory)
    caches = model.init_cache(b, s_tgt)
    got = []
    for i in range(s_tgt):
        logits, caches = model.forward_decode(tgt[:, i:i + 1], caches, cross,
                                              i, src_lens)
        got.append(logits[:, 0])
    np.testing.assert_allclose(np.stack(got, 1), want, atol=1e-4, rtol=1e-4)


def test_grads_flow(model, batch):
    src, tgt, src_lens = batch

    def loss(m):
        logits = m(src, tgt, src_lens)
        return jnp.mean(ft.F.softmax_loss(
            logits[:, :-1].reshape(-1, V), tgt[:, 1:].reshape(-1)))

    grads = jax.grad(loss)(model)
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.all(np.isfinite(g)) for g in leaves)
    # both stacks receive gradient
    assert float(jnp.abs(grads.encoder_layers[0].attention
                         .q_projection.weights).sum()) > 0
    assert float(jnp.abs(grads.decoder_layers[0].cross_attention
                         .q_projection.weights).sum()) > 0


def test_greedy_generate_shape_and_eos(model, batch):
    src, _, src_lens = batch
    out = greedy_generate_seq2seq(model, src, src_lens, 8, bos_id=1,
                                  eos_id=2)
    assert out.shape == (3, 8)
    out = np.asarray(out)
    for row in out:
        hits = np.where(row == 2)[0]
        if hits.size:  # once EOS appears, everything after is EOS
            assert np.all(row[hits[0]:] == 2)


def test_copy_task_learns():
    """5-token copy task: loss must fall sharply in 60 full-batch steps."""
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.integers(3, 20, (64, 5)), jnp.int32)
    bos = jnp.full((64, 1), 1, jnp.int32)
    tgt_in = jnp.concatenate([bos, src[:, :-1]], 1)
    model = ft.EncoderDecoderLM(
        20, 32, 4, 16, p_dropout=0.0, n_encoder_layer=1, n_decoder_layer=1,
        middle_dim=64, attn_impl="reference", key=jax.random.PRNGKey(5))
    opt = ft.Adam(lr=1e-2)
    state = opt.init(model)

    @jax.jit
    def step(m, s):
        def loss_fn(m):
            logits = m(src, tgt_in)
            return jnp.mean(ft.F.softmax_loss(
                logits.reshape(-1, 20), src.reshape(-1)))
        l, g = jax.value_and_grad(loss_fn)(m)
        m, s = opt.step(m, g, s)
        return m, s, l

    model, state, l0 = step(model, state)
    for _ in range(60):
        model, state, l = step(model, state)
    assert float(l) < float(l0) * 0.2, (float(l0), float(l))


def test_mt_app_seq2seq_smoke(tmp_path):
    """End-to-end wiring of --arch seq2seq through the MT app: BPE tokenizer,
    seq2seq collate, scan-dispatched training, eval loss, batched cached
    generation, BLEU."""
    from flashattn_tpu.training.translation import MTConfig, run

    cfg = MTConfig(
        arch="seq2seq", n_epochs=1, samples_per_epoch=192, batch_size=32,
        n_vocab=300, n_embd=64, n_head=4, n_layer=1, model_max_length=24,
        synthetic_size=400, save_checkpoints=False, use_native_loader=False,
        p_dropout=0.0, steps_per_dispatch=4, workdir=str(tmp_path),
    )
    results = run(cfg)
    assert np.isfinite(results["train_loss"])
    assert np.isfinite(results["validation_loss"])
    assert "bleu" in results


def test_mt_app_mixed_precision_remat_smoke(tmp_path):
    """--mixed-precision + --remat through the MT app: bf16 compute over f32
    master weights with per-block checkpointing still learns."""
    from flashattn_tpu.training.translation import MTConfig, run

    cfg = MTConfig(
        n_epochs=1, samples_per_epoch=192, batch_size=32,
        n_vocab=300, n_embd=64, n_head=4, n_layer=1, model_max_length=24,
        synthetic_size=400, save_checkpoints=False, use_native_loader=False,
        p_dropout=0.0, steps_per_dispatch=4, workdir=str(tmp_path),
        mixed_precision=True, remat=True,
    )
    results = run(cfg)
    assert np.isfinite(results["train_loss"])
    assert np.isfinite(results["validation_loss"])

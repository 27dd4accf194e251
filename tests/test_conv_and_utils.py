"""conv1d/conv2d vs naive numpy oracle (mirrors reference tests/test_conv.py),
toy datasets, checkpointing, and the timing harness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flashattn_tpu.ops.conv import conv1d, conv2d
from flashattn_tpu.utils import datasets as toy
from flashattn_tpu.autodiff import grad_check


def _naive_conv1d(x, w):
    b, ic, width = x.shape
    oc, _, kw = w.shape
    out = np.zeros((b, oc, width), np.float32)
    for bi in range(b):
        for o in range(oc):
            for p in range(width):
                for i in range(ic):
                    for k in range(kw):
                        if p + k < width:
                            out[bi, o, p] += x[bi, i, p + k] * w[o, i, k]
    return out


def _naive_conv2d(x, w):
    b, ic, h, width = x.shape
    oc, _, kh, kw = w.shape
    out = np.zeros((b, oc, h, width), np.float32)
    for bi in range(b):
        for o in range(oc):
            for ph in range(h):
                for pw in range(width):
                    for i in range(ic):
                        for dh in range(kh):
                            for dw in range(kw):
                                if ph + dh < h and pw + dw < width:
                                    out[bi, o, ph, pw] += (
                                        x[bi, i, ph + dh, pw + dw] * w[o, i, dh, dw])
    return out


def test_conv1d_matches_naive():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 10))
    w = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 3))
    np.testing.assert_allclose(
        conv1d(x, w), _naive_conv1d(np.asarray(x), np.asarray(w)),
        atol=1e-4, rtol=1e-4)


def test_conv2d_matches_naive():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 6, 7))
    w = jax.random.normal(jax.random.PRNGKey(3), (3, 2, 2, 3))
    np.testing.assert_allclose(
        conv2d(x, w), _naive_conv2d(np.asarray(x), np.asarray(w)),
        atol=1e-4, rtol=1e-4)


def test_conv_grads():
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 2, 6))
    w = jax.random.normal(jax.random.PRNGKey(5), (2, 2, 3))
    grad_check(conv1d, x, w, n_samples=5, tol=2e-2, epsilon=1e-3)


def test_toy_datasets():
    for name, fn in toy.datasets.items():
        g = fn(20)
        assert g.N == 20 and len(g.X) == 20 and len(g.y) == 20
        assert set(g.y) <= {0, 1}
    # deterministic labelling spot checks
    assert toy.simple(10).y == [1 if x < 0.5 else 0 for x, _ in toy.simple(10).X]
    assert toy.xor(10).y[0] in (0, 1)


def test_checkpoint_roundtrip(tmp_path):
    import flashattn_tpu as ft
    from flashattn_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    model = ft.DecoderLM(32, 16, 2, 8, p_dropout=0.0, n_layer=1,
                         attn_impl="reference", key=jax.random.PRNGKey(0))
    opt = ft.Adam(lr=1e-2)
    state = opt.init(model)
    save_checkpoint(str(tmp_path / "ckpt"), model, state, step=7)

    template = ft.DecoderLM(32, 16, 2, 8, p_dropout=0.0, n_layer=1,
                            attn_impl="reference", key=jax.random.PRNGKey(99))
    restored, rstate, step = restore_checkpoint(
        str(tmp_path / "ckpt"), template, opt.init(template))
    assert step == 7
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 32)
    np.testing.assert_allclose(model(idx), restored(idx), atol=1e-6)
    assert int(rstate.step) == int(state.step)


def test_kernel_bench_harness_runs_on_cpu():
    from flashattn_tpu.utils.timing import KernelBench
    from flashattn_tpu import layernorm, layernorm_reference

    kt = KernelBench(ntest=1, iters=2, max_batch_tokens=64, max_seq_len=16)

    @kt.case(name="ln")
    def _case(kt):
        bs, seq = kt.bs_sl()
        x = jax.random.normal(jax.random.PRNGKey(0), (bs * seq, 64))
        g, b = jnp.ones((64,)), jnp.zeros((64,))
        return (lambda x, g, b: layernorm(x, g, b)), (
            lambda x, g, b: layernorm_reference(x, g, b)), (x, g, b)

    results = kt.run("ln")
    assert len(results) == 1 and results[0].custom_ms > 0

def test_async_checkpoint_roundtrip(tmp_path):
    import flashattn_tpu as ft
    from flashattn_tpu.utils.checkpoint import (AsyncCheckpointManager,
                                                restore_checkpoint)

    model = ft.DecoderLM(32, 16, 2, 8, p_dropout=0.0, n_layer=1,
                         attn_impl="reference", key=jax.random.PRNGKey(0))
    opt = ft.Adam(lr=1e-2)
    state = opt.init(model)
    mgr = AsyncCheckpointManager()
    mgr.save(str(tmp_path / "ackpt"), model, state, step=3)
    mgr.wait()  # barrier before reading back
    template = ft.DecoderLM(32, 16, 2, 8, p_dropout=0.0, n_layer=1,
                            attn_impl="reference", key=jax.random.PRNGKey(9))
    restored, rstate, step = restore_checkpoint(
        str(tmp_path / "ackpt"), template, opt.init(template))
    assert step == 3
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 32)
    np.testing.assert_allclose(model(idx), restored(idx), atol=1e-6)
    mgr.close()

"""Quantization tier tests: int8 tensors, weight-only matmul, int8 KV attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattn_tpu.ops.flash_attention import flash_attention_reference
from flashattn_tpu.ops.quant import (
    QuantizedTensor,
    flash_attention_kv_int8,
    int8_weight_only_matmul,
    quantize_int8,
    quantize_int8_stochastic,
    quantize_kv,
)


def test_quantize_roundtrip_error_bound():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 3.0
    q = quantize_int8(x, axis=-1)
    assert q.values.dtype == jnp.int8
    err = np.abs(np.asarray(q.dequantize() - x))
    # max error is half a quantisation step = absmax/127/2 per row
    bound = np.asarray(jnp.max(jnp.abs(x), axis=-1, keepdims=True)) / 127.0
    assert (err <= bound * 0.5 + 1e-6).all()


def test_quantize_zero_row():
    x = jnp.zeros((4, 16))
    q = quantize_int8(x)
    np.testing.assert_array_equal(np.asarray(q.dequantize()), 0.0)


def test_stochastic_quantize_unbiased():
    x = jnp.full((8, 256), 0.37)
    qs = [quantize_int8_stochastic(x, seed=i).dequantize() for i in range(8)]
    mean = np.mean([np.asarray(q).mean() for q in qs])
    # stochastic rounding is unbiased in expectation
    np.testing.assert_allclose(mean, 0.37, rtol=0.02)


def test_int8_weight_only_matmul_matches_dequant():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (256, 512))
    w = jax.random.normal(jax.random.PRNGKey(2), (512, 256))
    wq = quantize_int8(w, axis=0)  # per-output-channel
    out = int8_weight_only_matmul(x, wq)
    ref = x @ wq.dequantize()
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-3)


def test_int8_weight_only_matmul_ragged_fallback():
    x = jax.random.normal(jax.random.PRNGKey(3), (33, 48))
    w = jax.random.normal(jax.random.PRNGKey(4), (48, 17))
    wq = quantize_int8(w, axis=0)
    out = int8_weight_only_matmul(x, wq)
    np.testing.assert_allclose(out, x @ wq.dequantize(), atol=1e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_kv_int8(causal):
    b, h, n, d = 1, 2, 128, 32
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks[0], (b, h, n, d))
    k = jax.random.normal(ks[1], (b, h, n, d))
    v = jax.random.normal(ks[2], (b, h, n, d))
    kq, vq = quantize_kv(k, v)
    o, lse = flash_attention_kv_int8(q, kq, vq, causal)
    # oracle: attention over the dequantised cache with q quantised the same
    # way the kernel does (per-row symmetric int8 before the int8 MXU dot;
    # rounding commutes with the scalar scale prefold, so quantising the raw
    # q reproduces the kernel's grid exactly) -- isolates kernel error from
    # quantisation error.
    q_deq = quantize_int8(q, axis=-1).dequantize()
    ref = flash_attention_reference(q_deq, kq.dequantize(), vq.dequantize(),
                                    causal)
    np.testing.assert_allclose(o, ref, atol=1e-4, rtol=1e-3)
    # and the total error vs the fp cache stays within int8 noise
    full = flash_attention_reference(q, k, v, causal)
    assert float(jnp.max(jnp.abs(o - full))) < 0.15


def test_flash_attention_kv_int8_loop_multichunk_gqa():
    """The quantized loop schedule with >1 interior DMA chunk and GQA
    grouping (kv heads < q heads) matches the dequantised oracle."""
    from flashattn_tpu.ops.quant import _kv8_flash_loop

    b, hq, hkv, n, d = 1, 4, 2, 512, 32
    ks = jax.random.split(jax.random.PRNGKey(9), 3)
    q = jax.random.normal(ks[0], (b, hq, n, d))
    k = jax.random.normal(ks[1], (b, hkv, n, d))
    v = jax.random.normal(ks[2], (b, hkv, n, d))
    kq, vq = quantize_kv(k, v)
    o, lse = _kv8_flash_loop(q, kq, vq, sm_scale=1.0 / d**0.5, block_q=128)
    q_deq = quantize_int8(q, axis=-1).dequantize()
    ref = flash_attention_reference(q_deq, kq.dequantize(), vq.dequantize(),
                                    True)
    np.testing.assert_allclose(o, ref, atol=1e-4, rtol=1e-3)


def test_flash_attention_kv_int8_subrow_gqa():
    """The quantized subrow schedule (whole row resident, single-pass
    softmax) matches the dequantised oracle, incl. GQA and fp8 payloads."""
    from flashattn_tpu.ops.quant import _kv8_flash_subrow, quantize_fp8

    b, hq, hkv, n, d = 1, 4, 2, 512, 32
    ks = jax.random.split(jax.random.PRNGKey(19), 3)
    q = jax.random.normal(ks[0], (b, hq, n, d))
    k = jax.random.normal(ks[1], (b, hkv, n, d))
    v = jax.random.normal(ks[2], (b, hkv, n, d))
    kq, vq = quantize_kv(k, v)
    o, lse = _kv8_flash_subrow(q, kq, vq, sm_scale=1.0 / d**0.5, sub=128)
    q_deq = quantize_int8(q, axis=-1).dequantize()
    ref = flash_attention_reference(q_deq, kq.dequantize(), vq.dequantize(),
                                    True)
    np.testing.assert_allclose(o, ref, atol=1e-4, rtol=1e-3)
    # loop-vs-subrow schedule equivalence on the same quantized cache
    from flashattn_tpu.ops.quant import _kv8_flash_loop

    o_l, lse_l = _kv8_flash_loop(q, kq, vq, sm_scale=1.0 / d**0.5,
                                 block_q=128)
    np.testing.assert_allclose(o, o_l, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(lse, lse_l, atol=1e-5, rtol=1e-5)
    # fp8 payloads flow through the same kernel (no int8-MXU path)
    kf, vf = quantize_fp8(k, axis=-1), quantize_fp8(v, axis=-1)
    o8, _ = _kv8_flash_subrow(q, kf, vf, sm_scale=1.0 / d**0.5, sub=128)
    ref8 = flash_attention_reference(q, kf.dequantize(), vf.dequantize(),
                                     True)
    np.testing.assert_allclose(o8, ref8, atol=2e-2, rtol=2e-2)


def test_flash_attention_kv_int8_alignment_fallbacks():
    """The quantized loop schedule needs 128-aligned blocks and head dims
    for its DMA slices; unaligned shapes must keep the grid kernel and stay
    correct (a 327-row int8 DMA slice fails Mosaic at compile)."""
    for (n, d) in ((320, 32), (256, 64)):   # n%128!=0 / d%128!=0
        q = jax.random.normal(jax.random.PRNGKey(10), (1, 2, n, d))
        kq, vq = quantize_kv(q, q)
        o, _ = flash_attention_kv_int8(q, kq, vq, True)
        q_deq = quantize_int8(q, axis=-1).dequantize()
        ref = flash_attention_reference(q_deq, kq.dequantize(),
                                        vq.dequantize(), True)
        np.testing.assert_allclose(o, ref, atol=1e-4, rtol=1e-3)


def test_flash_attention_kv_int8_ragged_fallback():
    b, h, n, d = 1, 1, 37, 16
    q = jax.random.normal(jax.random.PRNGKey(6), (b, h, n, d))
    kq, vq = quantize_kv(q, q)
    o, lse = flash_attention_kv_int8(q, kq, vq, True)
    assert o.shape == q.shape
    assert bool(jnp.isfinite(o).all())


def test_quantize_fp8_roundtrip():
    from flashattn_tpu.ops.quant import quantize_fp8

    x = jax.random.normal(jax.random.PRNGKey(7), (64, 128)) * 5.0
    xq = quantize_fp8(x, axis=-1)
    assert xq.values.dtype == jnp.float8_e4m3fn
    # e4m3 keeps ~2 significant digits; relative error bounded by ~6%
    err = jnp.max(jnp.abs(xq.dequantize() - x)) / jnp.max(jnp.abs(x))
    assert float(err) < 0.07


def test_flash_attention_kv_fp8():
    """fp8 payloads flow through the same quantised-KV kernel as int8."""
    from flashattn_tpu.ops.quant import quantize_fp8

    b, h, n, d = 1, 2, 128, 32
    ks = jax.random.split(jax.random.PRNGKey(8), 3)
    q = jax.random.normal(ks[0], (b, h, n, d))
    k = jax.random.normal(ks[1], (b, h, n, d))
    v = jax.random.normal(ks[2], (b, h, n, d))
    kq, vq = quantize_fp8(k, axis=-1), quantize_fp8(v, axis=-1)
    o, lse = flash_attention_kv_int8(q, kq, vq, True)
    ref = flash_attention_reference(q, kq.dequantize(), vq.dequantize(), True)
    np.testing.assert_allclose(o, ref, atol=5e-5, rtol=1e-3)
    full = flash_attention_reference(q, k, v, True)
    assert float(jnp.max(jnp.abs(o - full))) < 0.15


def test_fp8_transcode_rides_int8_subrow():
    """r5: fp8-stored caches at subrow-eligible shapes are requantized to
    int8 (one elementwise pass) and ride the int8-MXU subrow dots — the
    dispatch must stay within fp8's own storage error of the full-precision
    oracle."""
    from flashattn_tpu.ops.quant import quantize_fp8, requantize_fp8_to_int8

    b, h, n, d = 1, 2, 1024, 128
    ks = jax.random.split(jax.random.PRNGKey(12), 3)
    q = jax.random.normal(ks[0], (b, h, n, d))
    k = jax.random.normal(ks[1], (b, h, n, d))
    v = jax.random.normal(ks[2], (b, h, n, d))
    kq, vq = quantize_fp8(k, axis=-1), quantize_fp8(v, axis=-1)
    o, lse = flash_attention_kv_int8(q, kq, vq, True)
    assert bool(jnp.isfinite(o).all())
    full = flash_attention_reference(q, k, v, True)
    assert float(jnp.max(jnp.abs(o - full))) < 0.15
    # the transcode itself is error-bounded by fp8 storage
    ki = requantize_fp8_to_int8(kq)
    assert ki.values.dtype == jnp.int8
    err = jnp.max(jnp.abs(ki.dequantize() - kq.dequantize()))
    assert float(err) < 0.05


def test_fp8_weight_only_matmul():
    from flashattn_tpu.ops.quant import quantize_fp8

    x = jax.random.normal(jax.random.PRNGKey(9), (32, 64))
    w = jax.random.normal(jax.random.PRNGKey(10), (64, 128))
    wq = quantize_fp8(w, axis=0)
    out = int8_weight_only_matmul(x, wq)
    np.testing.assert_allclose(out, x @ wq.dequantize(), atol=1e-4, rtol=1e-4)


def test_quantize_int8_stochastic_unaligned_rows():
    """654 rows has no 8-aligned divisor <= 256: ragged-block regression."""
    from flashattn_tpu.ops.quant import quantize_int8_stochastic

    x = jax.random.normal(jax.random.PRNGKey(11), (654, 64))
    xq = quantize_int8_stochastic(x, seed=3)
    err = jnp.max(jnp.abs(xq.dequantize() - x))
    assert float(err) < 0.1


class TestWeightOnlyModel:
    """quantize_model_weights: serving-time Linear -> QuantizedLinear."""

    def _model(self):
        import flashattn_tpu as ft

        return ft.DecoderLM(64, 32, 4, 128, p_dropout=0.0, n_layer=2,
                            attn_impl="reference",
                            key=jax.random.PRNGKey(0)).eval()

    @pytest.mark.parametrize("dtype", [jnp.int8, jnp.float8_e4m3fn])
    def test_forward_close_to_fp(self, dtype):
        from flashattn_tpu.ops.quant import quantize_model_weights

        model = self._model()
        qmodel = quantize_model_weights(model, dtype)
        toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 64)
        full = np.asarray(model(toks))
        quant = np.asarray(qmodel(toks))
        rel = np.max(np.abs(quant - full)) / np.max(np.abs(full))
        assert rel < 0.05, rel
        # argmax agreement stays high
        agree = np.mean(np.argmax(quant, -1) == np.argmax(full, -1))
        assert agree > 0.85

    def test_weights_are_quantized(self):
        from flashattn_tpu.nn.basic import QuantizedLinear
        from flashattn_tpu.ops.quant import quantize_model_weights

        qmodel = quantize_model_weights(self._model(), jnp.int8)
        lin = qmodel.layers[0].attention.q_projection
        assert isinstance(lin, QuantizedLinear)
        assert lin.values.dtype == jnp.int8
        assert qmodel.lm_head.values.dtype == jnp.int8

    def test_quantized_model_serves(self):
        from flashattn_tpu.ops.quant import quantize_model_weights
        from flashattn_tpu.serving import ContinuousBatchingEngine

        model = self._model()
        qmodel = quantize_model_weights(model, jnp.int8)
        rng = np.random.default_rng(2)
        t = list(rng.integers(1, 60, size=10))
        eng = ContinuousBatchingEngine(qmodel, max_batch=2, page_size=8,
                                       pages_per_seq=4, collect_logits=True)
        r = eng.submit(t, 3)
        eng.run()
        want = np.asarray(model(jnp.asarray([t], jnp.int32))[0])
        got = np.stack(r.logits)[:len(t)]
        rel = np.max(np.abs(got - want)) / np.max(np.abs(want))
        assert rel < 0.05, rel

"""Functional nn ops vs numpy oracles (mirrors reference tests/test_nn.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattn_tpu import F
from flashattn_tpu.autodiff import grad_check


def _rand(shape, seed=0, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape) * scale


def test_softmax_sums_to_one():
    x = _rand((4, 7), 1, 3.0)
    s = F.softmax(x, 1)
    np.testing.assert_allclose(np.sum(np.asarray(s), axis=1), 1.0, rtol=1e-5)
    # invariant under shift
    np.testing.assert_allclose(s, F.softmax(x + 100.0, 1), atol=1e-5)


def test_logsoftmax_matches_log_of_softmax():
    x = _rand((5, 6), 2, 2.0)
    np.testing.assert_allclose(
        F.logsoftmax(x, 1), jnp.log(F.softmax(x, 1)), atol=1e-5
    )


def test_logsumexp_keepdims_and_stability():
    x = _rand((3, 9), 3, 1.0) + 1000.0  # overflow for naive exp
    out = F.logsumexp(x, 1)
    assert out.shape == (3, 1)
    ref = np.log(np.sum(np.exp(np.asarray(x, np.float64) - 1000.0), axis=1, keepdims=True)) + 1000.0
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_softmax_loss_matches_manual():
    logits = _rand((8, 11), 4, 2.0)
    target = jax.random.randint(jax.random.PRNGKey(5), (8,), 0, 11)
    loss = F.softmax_loss(logits, target)
    assert loss.shape == (8,)
    lg = np.asarray(logits, np.float64)
    manual = np.log(np.exp(lg).sum(1)) - lg[np.arange(8), np.asarray(target)]
    np.testing.assert_allclose(loss, manual, rtol=1e-4)
    assert np.all(np.asarray(loss) >= 0.0)


def test_gelu_tanh_approx_values():
    x = jnp.asarray([-2.0, -1.0, 0.0, 0.5, 1.0, 3.0])
    got = np.asarray(F.GELU(x))
    # tanh-approx formula in float64 (reference nn.py:205-209)
    xd = np.asarray(x, np.float64)
    expected = 0.5 * xd * (1 + np.tanh(np.sqrt(2 / np.pi) * (xd + 0.044715 * xd**3)))
    np.testing.assert_allclose(got, expected, atol=1e-5)
    # monotone-ish sanity: gelu(0)=0, gelu(x)->x for large x
    assert got[2] == 0.0
    np.testing.assert_allclose(got[-1], 3.0, atol=5e-3)


def test_one_hot():
    idx = jnp.asarray([[0, 2], [1, 1]])
    oh = F.one_hot(idx, 3)
    assert oh.shape == (2, 2, 3)
    np.testing.assert_allclose(
        oh, np.eye(3)[np.asarray(idx)].astype(np.float32)
    )


def test_max_and_argmax():
    x = _rand((2, 3, 5), 6)
    m = F.max(x, 2)
    assert m.shape == (2, 3, 1)
    np.testing.assert_allclose(m, np.max(np.asarray(x), axis=2, keepdims=True))
    am = F.argmax(x, 2)
    assert np.asarray(am).sum(axis=2).min() >= 1


@pytest.mark.parametrize("pool", [F.avgpool2d, F.maxpool2d])
def test_pool2d(pool):
    x = _rand((2, 3, 8, 6), 7)
    out = pool(x, (2, 3))
    assert out.shape == (2, 3, 4, 2)
    xn = np.asarray(x).reshape(2, 3, 4, 2, 2, 3).transpose(0, 1, 2, 4, 3, 5)
    xn = xn.reshape(2, 3, 4, 2, 6)
    ref = xn.mean(-1) if pool is F.avgpool2d else xn.max(-1)
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_dropout_modes():
    x = jnp.ones((100, 100))
    key = jax.random.PRNGKey(0)
    # identity cases
    np.testing.assert_array_equal(F.dropout(x, 0.5, key, ignore=True), x)
    np.testing.assert_array_equal(F.dropout(x, 0.0, key), x)
    np.testing.assert_array_equal(F.dropout(x, 0.5, None), x)
    out = F.dropout(x, 0.3, key, scale=True)
    kept = np.asarray(out) > 0
    assert 0.6 < kept.mean() < 0.8
    np.testing.assert_allclose(np.asarray(out)[kept], 1.0 / 0.7, rtol=1e-5)


def test_grad_check_functionals():
    x = _rand((3, 4), 8)
    grad_check(lambda a: F.softmax(a, 1), x, n_samples=5, tol=1e-2, epsilon=1e-3)
    grad_check(F.GELU, x, n_samples=5, tol=1e-2, epsilon=1e-3)
    grad_check(lambda a: F.logsumexp(a, 1), x, n_samples=5, tol=1e-2, epsilon=1e-3)


def test_dropout_res_bias():
    """Fused residual+dropout(x+bias) (reference kernels.h:118-122 surface):
    matches the unfused composition with the same key; identity wiring at
    rate 0 / no key."""
    key = jax.random.PRNGKey(3)
    x = _rand((64, 32), 1)
    b = _rand((32,), 2)
    r = _rand((64, 32), 3)
    # no-dropout wiring
    np.testing.assert_allclose(F.dropout_res_bias(x, b, r, 0.0, key),
                               r + (x + b), rtol=1e-6)
    np.testing.assert_allclose(F.dropout_res_bias(x, b, r, 0.5, None),
                               r + (x + b), rtol=1e-6)
    # same-key agreement with the unfused ops
    want = r + F.dropout(x + b, 0.3, key)
    got = F.dropout_res_bias(x, b, r, 0.3, key)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # differentiable
    g = jax.grad(lambda x: jnp.sum(F.dropout_res_bias(x, b, r, 0.3, key) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("act", ["gelu", "relu"])
def test_dropout_act_bias(act):
    """Fused dropout(act(x+bias)) (reference kernels.h:123-126 surface)."""
    key = jax.random.PRNGKey(4)
    x = _rand((64, 32), 4)
    b = _rand((32,), 5)
    act_fn = F.GELU if act == "gelu" else (lambda y: jnp.maximum(y, 0.0))
    np.testing.assert_allclose(F.dropout_act_bias(x, b, 0.0, key, act=act),
                               act_fn(x + b), rtol=1e-6)
    want = F.dropout(act_fn(x + b), 0.25, key)
    got = F.dropout_act_bias(x, b, 0.25, key, act=act)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    g = jax.grad(lambda x: jnp.sum(F.dropout_act_bias(x, b, 0.25, key, act=act) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()

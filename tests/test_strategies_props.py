"""Hypothesis property tests driven by the shared strategies
(reference test_tensor.py/test_tensor_general.py hypothesis style)."""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings

from strategies import arrays, assert_close, shaped_arrays


@settings(max_examples=15, deadline=None)
@given(shaped_arrays(2))
def test_add_commutes_and_broadcast_identity(ts):
    a, b = ts
    assert_close(a + b, b + a)
    assert_close(a + jnp.zeros_like(a), a)


@settings(max_examples=15, deadline=None)
@given(arrays())
def test_double_negation(a):
    assert_close(-(-a), a)


@settings(max_examples=15, deadline=None)
@given(shaped_arrays(3))
def test_mul_distributes_over_add(ts):
    a, b, c = ts
    assert_close(a * (b + c), a * b + a * c, rtol=1e-3, atol=1e-3)


@settings(max_examples=10, deadline=None)
@given(arrays())
def test_jit_matches_eager(a):
    f = lambda x: jnp.tanh(x) * 2.0 + 1.0
    assert_close(jax.jit(f)(a), f(a), rtol=1e-6, atol=1e-6)


@settings(max_examples=10, deadline=None)
@given(arrays())
def test_sum_grad_is_ones(a):
    g = jax.grad(lambda x: jnp.sum(x))(a)
    np.testing.assert_array_equal(np.asarray(g), np.ones(a.shape, np.float32))

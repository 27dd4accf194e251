"""Property tests for the scalar prelude (mirrors reference tests/test_operators.py)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flashattn_tpu import operators

# allow_subnormal=False: XLA flushes denormals to zero
small_floats = st.floats(
    min_value=-100, max_value=100, allow_nan=False, width=32, allow_subnormal=False
)


@settings(max_examples=25, deadline=None)
@given(small_floats, small_floats)
def test_same_as_python(x: float, y: float) -> None:
    np.testing.assert_allclose(float(operators.mul(x, y)), x * y, rtol=1e-5)
    np.testing.assert_allclose(float(operators.add(x, y)), x + y, rtol=1e-5)
    np.testing.assert_allclose(float(operators.neg(x)), -x, rtol=1e-5)
    np.testing.assert_allclose(float(operators.max(x, y)), max(x, y), rtol=1e-5)
    if abs(x) > 1e-5:
        np.testing.assert_allclose(float(operators.inv(x)), 1.0 / x, rtol=1e-4)


@settings(max_examples=25, deadline=None)
@given(small_floats)
def test_relu(a: float) -> None:
    assert float(operators.relu(a)) == (a if a > 0 else 0.0)


@settings(max_examples=25, deadline=None)
@given(small_floats, small_floats)
def test_relu_back(a: float, b: float) -> None:
    expected = b if a > 0 else 0.0
    assert float(operators.relu_back(a, jnp.float32(b))) == pytest.approx(expected)


@settings(max_examples=25, deadline=None)
@given(small_floats)
def test_sigmoid(a: float) -> None:
    """sigmoid in [0,1], 1-sig(x)=sig(-x), sig(0)=0.5, monotone."""
    s = float(operators.sigmoid(a))
    assert 0.0 <= s <= 1.0
    np.testing.assert_allclose(1.0 - s, float(operators.sigmoid(-a)), atol=1e-5)
    assert float(operators.sigmoid(0.0)) == pytest.approx(0.5)


@settings(max_examples=25, deadline=None)
@given(st.floats(min_value=0.0625, max_value=80, width=32))  # exp(x) finite in f32
def test_log_exp(a: float) -> None:
    np.testing.assert_allclose(float(operators.log(operators.exp(a))), a, rtol=1e-4)


@settings(max_examples=25, deadline=None)
@given(small_floats, small_floats, small_floats)
def test_transitive(a: float, b: float, c: float) -> None:
    if float(operators.lt(a, b)) and float(operators.lt(b, c)):
        assert float(operators.lt(a, c)) == 1.0


def test_hofs_on_arrays() -> None:
    xs = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    ys = jnp.asarray([10.0, 20.0, 30.0, 40.0])
    np.testing.assert_allclose(operators.map(operators.neg)(xs), -np.asarray(xs))
    np.testing.assert_allclose(
        operators.zipWith(operators.add)(xs, ys), np.asarray(xs) + np.asarray(ys)
    )
    assert float(operators.sum(xs)) == pytest.approx(10.0)
    assert float(operators.prod(xs)) == pytest.approx(24.0)


def test_hofs_on_lists() -> None:
    assert operators.negList([1.0, -2.0]) == [-1.0, 2.0]
    assert operators.addLists([1.0, 2.0], [3.0, 4.0]) == [4.0, 6.0]
    assert operators.sum([1.0, 2.0, 3.0]) == pytest.approx(6.0)
    assert operators.prod([2.0, 3.0]) == pytest.approx(6.0)


def test_tanh_pow() -> None:
    np.testing.assert_allclose(float(operators.tanh(0.5)), math.tanh(0.5), rtol=1e-6)
    np.testing.assert_allclose(float(operators.pow(2.0, 10)), 1024.0)

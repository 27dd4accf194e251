"""Scalar autodiff twin tests (mirrors reference tests/test_scalar.py /
test_autodiff.py / test_scalar_autograd.py)."""

import math

import pytest

from flashattn_tpu.scalar import (
    Scalar,
    backpropagate,
    central_difference,
    derivative_check,
    topological_sort,
)


def test_forward_ops():
    a, b = Scalar(2.0), Scalar(3.0)
    assert (a + b).data == 5.0
    assert (a * b).data == 6.0
    assert (a - b).data == -1.0
    assert (a / b).data == pytest.approx(2 / 3)
    assert (-a).data == -2.0
    assert (a < b).data == 1.0
    assert (a > b).data == 0.0
    assert Scalar(1.0).exp().data == pytest.approx(math.e)
    assert Scalar(math.e).log().data == pytest.approx(1.0)
    assert Scalar(-1.0).relu().data == 0.0
    assert Scalar(0.0).sigmoid().data == 0.5


def test_simple_backward():
    a, b = Scalar(2.0), Scalar(3.0)
    out = a * b + a
    out.backward()
    assert a.derivative == pytest.approx(4.0)  # b + 1
    assert b.derivative == pytest.approx(2.0)  # a


def test_chain_backward():
    x = Scalar(0.5)
    out = (x * 2.0 + 1.0).sigmoid().log()
    out.backward()
    num = central_difference(lambda s: (s * 2.0 + 1.0).sigmoid().log(), 0.5)
    assert x.derivative == pytest.approx(num, rel=1e-3)


def test_diamond_graph_accumulates():
    x = Scalar(3.0)
    y = x * x  # dy/dx = 2x via two paths
    y.backward()
    assert x.derivative == pytest.approx(6.0)


def test_topological_sort_order():
    a = Scalar(1.0)
    b = a + 2.0
    c = b * b
    order = topological_sort(c)
    ids = [v.unique_id for v in order]
    assert ids.index(c.unique_id) < ids.index(b.unique_id) < ids.index(a.unique_id)


@pytest.mark.parametrize("fn", [
    lambda a, b: a + b,
    lambda a, b: a * b,
    lambda a, b: a / b,
    lambda a, b: (a * b).sigmoid(),
    lambda a, b: (a + b).relu() + a * b,
    lambda a, b: (a * a + b).log(),
])
def test_derivative_check_two_args(fn):
    derivative_check(fn, Scalar(0.7), Scalar(1.3))


def test_reused_subexpression():
    x = Scalar(1.5)
    h = x.sigmoid()
    out = h * h + h
    out.backward()
    num = central_difference(
        lambda s: (lambda t: t * t + t)(s.sigmoid()), 1.5)
    assert x.derivative == pytest.approx(num, rel=1e-3)

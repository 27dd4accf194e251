"""Tests for the numerical-debug utilities (the surface cuda_util.h:41-49
declares but never implements in the reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattn_tpu.utils.debug import (
    assert_finite,
    check_2norm,
    checkify_errors,
    find_nonfinite,
    tensor_stats,
)


def test_assert_finite_passes_clean():
    @checkify_errors
    def f(x):
        return jnp.sum(assert_finite(x, "x") * 2.0)

    assert float(f(jnp.ones((4,)))) == 8.0


def test_assert_finite_raises_on_nan():
    @checkify_errors
    def f(x):
        return jnp.sum(assert_finite(jnp.log(x), "logx"))

    with pytest.raises(Exception, match="NaN/Inf"):
        f(jnp.asarray([-1.0, 2.0]))  # log(-1) = nan


def test_assert_finite_inside_jit():
    from jax.experimental import checkify

    def f(x):
        return jnp.sum(assert_finite(x / x, "ratio"))

    checked = jax.jit(checkify.checkify(f, errors=checkify.user_checks))
    err, _ = checked(jnp.asarray([0.0, 1.0]))  # 0/0 = nan
    with pytest.raises(Exception, match="NaN/Inf"):
        err.throw()


def test_check_2norm_identity():
    x = jnp.asarray([3.0, 4.0])
    np.testing.assert_array_equal(np.asarray(check_2norm(x)), np.asarray(x))


def test_tensor_stats():
    s = tensor_stats(jnp.asarray([1.0, -2.0, jnp.nan]))
    assert s["nan"] == 1 and s["shape"] == (3,)
    assert s["max"] == 1.0 and s["min"] == -2.0


def test_find_nonfinite_pytree():
    tree = {"ok": jnp.ones((2,)),
            "bad": jnp.asarray([1.0, jnp.inf]),
            "ints": jnp.asarray([1, 2])}
    bad = find_nonfinite(tree)
    assert len(bad) == 1
    (path, counts), = bad.items()
    assert "bad" in path and counts["inf"] == 1 and counts["nan"] == 0

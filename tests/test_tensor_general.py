"""Table-driven property tests over the op tables in ``flashattn_tpu.testing``.

Mirrors the reference's ``tests/test_tensor_general.py:41-150``, which runs
``MathTestVariable._comp_testing()`` tables against every backend and
``grad_check``s each op.  Here the "backends" are jit/vmap/CPU-mesh sharding
of the same jnp function, and the float64 oracle is pure-python ``math``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattn_tpu.autodiff import grad_check
from flashattn_tpu.testing import ONE_ARG, RED_ARG, TWO_ARG

one_ids = [c.name for c in ONE_ARG]
two_ids = [c.name for c in TWO_ARG]
red_ids = [c.name for c in RED_ARG]

rng = np.random.default_rng(42)


def _sample(shape):
    return rng.uniform(-100, 100, size=shape).astype(np.float32)


@pytest.mark.parametrize("case", ONE_ARG, ids=one_ids)
def test_one_arg_vs_oracle(case):
    x = _sample((2, 3))
    got = np.asarray(jax.jit(case.fn)(jnp.asarray(x)))
    want = np.vectorize(case.oracle)(x.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("case", ONE_ARG, ids=one_ids)
def test_one_arg_derivative(case):
    if not case.differentiable:
        pytest.skip("comparison op")
    x = jnp.asarray(_sample((2, 3)))
    grad_check(case.fn, x, n_samples=4, tol=1e-2, epsilon=1e-3)


@pytest.mark.parametrize("case", TWO_ARG, ids=two_ids)
def test_two_arg_vs_oracle(case):
    a, b = _sample((2, 3)), _sample((2, 3))
    got = np.asarray(jax.jit(case.fn)(jnp.asarray(a), jnp.asarray(b)))
    want = np.vectorize(case.oracle)(a.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("case", TWO_ARG, ids=two_ids)
def test_two_arg_broadcast_grad(case):
    """Broadcast (2,3)x(3,) and check grads un-broadcast to the leaf shapes —
    the reference's ``Tensor.expand`` reduction (tensor.py:313) which jax.vjp
    performs automatically; reference test at test_tensor_general.py:106."""
    if not case.differentiable:
        pytest.skip("comparison op")
    a, b = jnp.asarray(_sample((2, 3))), jnp.asarray(_sample((3,)))
    out = case.fn(a, b)
    assert out.shape == (2, 3)
    ga, gb = jax.grad(lambda a, b: jnp.sum(case.fn(a, b)), argnums=(0, 1))(a, b)
    assert ga.shape == a.shape and gb.shape == b.shape
    grad_check(case.fn, a, b, n_samples=4, tol=1e-2, epsilon=1e-3)


@pytest.mark.parametrize("case", RED_ARG, ids=red_ids)
def test_reduce_vs_oracle(case):
    # keep magnitudes small so prod_red stays finite in f32
    x = rng.uniform(-3, 3, size=(5, 4)).astype(np.float32)
    got = np.asarray(jax.jit(case.fn)(jnp.asarray(x)))
    want = np.array([case.oracle(list(x[:, j].astype(np.float64)))
                     for j in range(x.shape[1])])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # reduce over a singleton dim is identity-shaped (reference :139-148)
    one = jnp.asarray(x[:1])
    np.testing.assert_allclose(
        np.asarray(case.fn(one)),
        np.array([case.oracle([float(v)]) for v in x[0]]), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("case", ONE_ARG, ids=one_ids)
def test_one_arg_matches_under_vmap(case):
    """jit(vmap(f)) must equal f on the batched array — the 'many backends,
    one graph' invariant the reference checks across SimpleOps/FastOps/CUDA
    (test_tensor_general.py:43-74)."""
    x = jnp.asarray(_sample((4, 5)))
    direct = case.fn(x)
    vmapped = jax.jit(jax.vmap(case.fn))(x)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(vmapped),
                               rtol=1e-6, atol=1e-6)


def test_permute_grad():
    """Permute/transpose round-trips values and gradients
    (reference test_cuda_permute, test_tensor_general.py:243-253)."""
    x = jnp.asarray(_sample((2, 3, 4)))
    perm = (2, 0, 1)
    y = jnp.transpose(x, perm)
    assert y.shape == (4, 2, 3)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(y, np.argsort(perm))), np.asarray(x))
    grad_check(lambda a: jnp.transpose(a, perm) * 2.0, x,
               n_samples=4, tol=1e-2, epsilon=1e-3)


@pytest.mark.parametrize("dims", [(2, 3, 4), (5, 7, 3), (1, 1, 1), (16, 16, 16)])
def test_matmul_vs_numpy(dims):
    """Matmul equals the numpy oracle (reference test_cuda_matmul_numpy_eq,
    test_tensor_general.py:205-213) — the combine.cu MatrixMultiply tier is
    XLA dot here."""
    m, n, p = dims
    a, b = _sample((m, n)), _sample((n, p))
    got = np.asarray(jax.jit(jnp.matmul)(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(
        got, a.astype(np.float64) @ b.astype(np.float64), rtol=1e-3, atol=1e-2)


def test_bmm_broadcast_and_transpose():
    """Batched matmul with broadcast batch dims + transposed operand
    (reference test_bmm:256-279, test_cuda_matmul_transpose:216-240)."""
    a = _sample((2, 1, 3, 4))
    b = _sample((1, 5, 4, 6))
    got = np.asarray(jnp.matmul(jnp.asarray(a), jnp.asarray(b)))
    want = np.matmul(a.astype(np.float64), b.astype(np.float64))
    assert got.shape == (2, 5, 3, 6)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2)

    at = jnp.swapaxes(jnp.asarray(a), -1, -2)  # strided view, no copy needed
    got_t = np.asarray(jnp.matmul(jnp.swapaxes(at, -1, -2), jnp.asarray(b)))
    np.testing.assert_allclose(got_t, want, rtol=1e-3, atol=1e-2)

    grad_check(lambda x, y: jnp.matmul(x, y),
               jnp.asarray(a[:, :, :2, :3]), jnp.asarray(b[:, :2, :3, :2]),
               n_samples=4, tol=1e-2, epsilon=1e-3)

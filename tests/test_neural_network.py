"""End-to-end toy classifier training (reference tests/test_neural_network.py
role: train Linear/Network end-to-end and check outputs/learning)."""

import jax
import jax.numpy as jnp
import numpy as np

from flashattn_tpu.nn.basic import Linear
from flashattn_tpu.training.classifier import Network, binary_nll, train_classifier


def test_linear_forward_shape_and_determinism():
    """Reference test_Linear_1/2 check Linear against golden values from a
    seeded init; here determinism comes from the PRNG key."""
    lin = Linear(50, 5, key=jax.random.PRNGKey(42))
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 50))
    out = lin(x)
    assert out.shape == (3, 5)
    lin2 = Linear(50, 5, key=jax.random.PRNGKey(42))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(lin2(x)))
    # init bound: U(-1/sqrt(in), 1/sqrt(in)) (reference modules_basic.py:107-157)
    bound = 1.0 / np.sqrt(50)
    assert float(jnp.max(jnp.abs(lin.weights))) <= bound + 1e-6


def test_network_forward_in_unit_interval():
    net = Network(8, key=jax.random.PRNGKey(1))
    x = jax.random.uniform(jax.random.PRNGKey(2), (17, 2))
    p = net(x)
    assert p.shape == (17,)
    assert float(jnp.min(p)) >= 0.0 and float(jnp.max(p)) <= 1.0


def test_binary_nll_gradient_direction():
    p = jnp.asarray([0.9, 0.1])
    y = jnp.asarray([1.0, 0.0])
    good = binary_nll(p, y)
    bad = binary_nll(1.0 - p, y)
    assert float(good) < float(bad)


def test_trains_simple_dataset():
    _, acc = train_classifier("Simple", n_points=60, hidden=6, lr=0.5,
                              epochs=250, seed=3)
    assert acc >= 0.95, f"Simple should be nearly separable, got {acc}"


def test_trains_xor_dataset():
    _, acc = train_classifier("Xor", n_points=60, hidden=12, lr=0.5,
                              epochs=600, seed=0)
    assert acc >= 0.85, f"Xor accuracy too low: {acc}"

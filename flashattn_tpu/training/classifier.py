"""Toy 2-D classifier training — the reference's "train a Network on the
minitorch datasets" workload (``minitorch/datasets.py:88-95`` consumed by
``tests/test_neural_network.py``'s Linear/Network and the minitorch course
apps).  A 3-layer ReLU MLP with a sigmoid head, trained full-batch by a
single jitted SGD step — the graph the reference builds per-op on CUDA is
one fused XLA program here.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..module import Module
from ..nn.basic import Linear
from ..optim import SGD
from ..utils.datasets import Graph, datasets

Array = jax.Array


class Network(Module):
    """2 → hidden → hidden → 1 MLP with ReLU activations and sigmoid output
    (the classic minitorch ``Network`` shape used by test_neural_network.py)."""

    def __init__(self, hidden: int = 10, *, key: jax.Array):
        super().__init__()
        k1, k2, k3 = jax.random.split(key, 3)
        self.layer1 = Linear(2, hidden, key=k1)
        self.layer2 = Linear(hidden, hidden, key=k2)
        self.layer3 = Linear(hidden, 1, key=k3)

    def forward(self, x: Array) -> Array:
        h = jax.nn.relu(self.layer1(x))
        h = jax.nn.relu(self.layer2(h))
        return jax.nn.sigmoid(self.layer3(h))[..., 0]


def binary_nll(probs: Array, labels: Array, eps: float = 1e-7) -> Array:
    """- mean( y·log p + (1−y)·log(1−p) ) — the reference's per-point
    ``(prob.log() * y + (1-prob).log() * (1-y))`` loss."""
    p = jnp.clip(probs, eps, 1.0 - eps)
    return -jnp.mean(labels * jnp.log(p) + (1.0 - labels) * jnp.log1p(-p))


def train_classifier(
    dataset: str | Graph = "Xor",
    n_points: int = 100,
    hidden: int = 10,
    lr: float = 0.5,
    epochs: int = 500,
    seed: int = 0,
    verbose: bool = False,
) -> Tuple[Network, float]:
    """Train full-batch; returns (model, final accuracy).  One jitted step =
    forward + backward + SGD update, weights resident on device throughout
    (vs the reference's per-op kernel-launch training loop)."""
    graph = datasets[dataset](n_points, seed=seed) if isinstance(dataset, str) else dataset
    X = jnp.asarray(np.asarray(graph.X, dtype=np.float32))
    y = jnp.asarray(np.asarray(graph.y, dtype=np.float32))

    model = Network(hidden, key=jax.random.PRNGKey(seed))
    opt = SGD(lr=lr)
    state = opt.init(model)

    @jax.jit
    def step(model, state):
        loss, grads = jax.value_and_grad(
            lambda m: binary_nll(m(X), y))(model)
        model, state = opt.step(model, grads, state)
        return model, state, loss

    for epoch in range(epochs):
        model, state, loss = step(model, state)
        if verbose and (epoch % max(1, epochs // 10) == 0):
            print(f"epoch {epoch:4d}  loss {float(loss):.4f}")

    acc = float(jnp.mean(((model(X) > 0.5).astype(jnp.float32) == y)))
    return model, acc


def main(dataset: str = "Xor", n_points: int = 100, hidden: int = 10,
         lr: float = 0.5, epochs: int = 500, seed: int = 0) -> None:
    _, acc = train_classifier(dataset, n_points, hidden, lr, epochs, seed,
                              verbose=True)
    print(f"{dataset}: final accuracy {acc:.3f}")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default="Xor", choices=sorted(datasets))
    ap.add_argument("--n-points", type=int, default=100)
    ap.add_argument("--hidden", type=int, default=10)
    ap.add_argument("--lr", type=float, default=0.5)
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    main(**vars(ap.parse_args()))

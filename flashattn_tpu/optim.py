"""Pytree optimizers: SGD, Adam, AdamW.

TPU-native re-design of reference ``minitorch/optim.py`` (Optimizer:10,
Adam.step:50-79, SGD:140-151).  The reference mutates ``Parameter.value`` in
a Python loop -- one kernel launch per tensor op per parameter (SURVEY.md
§3.1).  Here an optimizer is a *pure function over the model pytree*: the
whole update is one fused XLA program, jittable together with the gradient
computation, and shards transparently under ``pjit``.

The reference's Adam second-moment bug (``(1 - beta1)`` where ``(1 - beta2)``
belongs, optim.py:68) is fixed; set ``reproduce_reference_bug=True`` to get
bit-parity with the reference for differential testing.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp


def _tree_zeros_like(tree: Any) -> Any:
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


class SGD:
    """Plain SGD (reference optim.py:140-151)."""

    def __init__(self, lr: float = 1.0):
        self.lr = lr

    def init(self, model: Any) -> Any:
        return ()

    def step(self, model: Any, grads: Any, state: Any) -> Tuple[Any, Any]:
        new_model = jax.tree_util.tree_map(lambda p, g: p - self.lr * g, model, grads)
        return new_model, state


class AdamState(NamedTuple):
    step: jax.Array
    exp_avg: Any
    exp_avg_sq: Any


class Adam:
    """Adam with bias correction (reference optim.py:33-79 semantics).

    Matches the reference update rule exactly:
        m <- b1*m + (1-b1)*g
        v <- b2*v + (1-b2)*g^2          (reference bug uses (1-b1) here)
        denom = sqrt(v) + eps
        p <- p - lr * sqrt(1-b2^t)/(1-b1^t) * m / denom
    """

    def __init__(self, lr: float = 1e-3, beta1: float = 0.9, beta2: float = 0.999,
                 eps: float = 1e-8, weight_decay: float = 0.0,
                 reproduce_reference_bug: bool = False):
        self.lr = lr
        self.beta1 = beta1
        self.beta2 = beta2
        self.eps = eps
        self.weight_decay = weight_decay
        self.reproduce_reference_bug = reproduce_reference_bug

    def init(self, model: Any) -> AdamState:
        return AdamState(
            step=jnp.zeros((), jnp.int32),
            exp_avg=_tree_zeros_like(model),
            exp_avg_sq=_tree_zeros_like(model),
        )

    def step(self, model: Any, grads: Any, state: AdamState) -> Tuple[Any, AdamState]:
        t = state.step + 1
        b1, b2 = self.beta1, self.beta2
        v_coef = (1.0 - b1) if self.reproduce_reference_bug else (1.0 - b2)

        if self.weight_decay:
            grads = jax.tree_util.tree_map(
                lambda g, p: g + self.weight_decay * p, grads, model
            )

        new_m = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.exp_avg, grads
        )
        new_v = jax.tree_util.tree_map(
            lambda v, g: b2 * v + v_coef * g * g, state.exp_avg_sq, grads
        )
        tf = t.astype(jnp.float32)
        bias1 = 1.0 - b1**tf
        bias2 = 1.0 - b2**tf
        step_size = self.lr * jnp.sqrt(bias2) / bias1

        new_model = jax.tree_util.tree_map(
            lambda p, m, v: p - step_size * m / (jnp.sqrt(v) + self.eps),
            model, new_m, new_v,
        )
        return new_model, AdamState(step=t, exp_avg=new_m, exp_avg_sq=new_v)


class AdamW(Adam):
    """Adam with decoupled weight decay (the production-default variant)."""

    def __init__(self, lr: float = 1e-3, beta1: float = 0.9, beta2: float = 0.999,
                 eps: float = 1e-8, weight_decay: float = 0.01):
        super().__init__(lr, beta1, beta2, eps, weight_decay=0.0)
        self.decoupled_weight_decay = weight_decay

    def step(self, model: Any, grads: Any, state: AdamState):
        if self.decoupled_weight_decay:
            model = jax.tree_util.tree_map(
                lambda p: p * (1.0 - self.lr * self.decoupled_weight_decay), model
            )
        return super().step(model, grads, state)

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


def global_norm(tree: Any) -> jax.Array:
    """L2 norm over every leaf of a gradient pytree."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                        for l in leaves))


def clip_by_global_norm(tree: Any, max_norm: float) -> Any:
    """Scale the whole gradient pytree so its global L2 norm <= max_norm.

    The stabiliser the reference lacks (its MT run rides an Adam whose
    second-moment bug damps steps); with a correct Adam, un-clipped training
    on the MT workload destabilises after a few epochs."""
    norm = global_norm(tree)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-9))
    # Non-finite gradients (loss spike / overflow) would otherwise poison
    # every parameter permanently: skip the whole update instead.  Select
    # zeros rather than multiplying (NaN * 0 == NaN).
    finite = jnp.isfinite(norm)
    return jax.tree_util.tree_map(
        lambda l: jnp.where(finite, l * scale.astype(l.dtype),
                            jnp.zeros_like(l)), tree)


def warmup_cosine(peak_lr: float, warmup_steps: int, total_steps: int,
                  final_frac: float = 0.1):
    """LR schedule: linear warmup to ``peak_lr`` then cosine decay to
    ``final_frac * peak_lr``.  Pass as ``Adam(lr=warmup_cosine(...))``.

    The stabiliser half of the MT recipe (with grad clipping): constant-lr
    Adam on the MT workload spikes and NaNs after a few epochs."""

    def schedule(step):
        s = step.astype(jnp.float32) if hasattr(step, "astype") else float(step)
        warm = peak_lr * s / max(warmup_steps, 1)
        prog = jnp.clip((s - warmup_steps) / max(total_steps - warmup_steps, 1),
                        0.0, 1.0)
        cos = final_frac + (1 - final_frac) * 0.5 * (1 + jnp.cos(jnp.pi * prog))
        return jnp.where(s < warmup_steps, warm, peak_lr * cos)

    return schedule


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

    def __init__(self, lr=1e-3, beta1: float = 0.9, beta2: float = 0.999,
                 eps: float = 1e-8, weight_decay: float = 0.0,
                 reproduce_reference_bug: bool = False):
        # lr: float, or a schedule ``step (int32 array) -> float array``
        # (e.g. :func:`warmup_cosine`)
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
        lr = self.lr(t) if callable(self.lr) else self.lr
        step_size = lr * jnp.sqrt(bias2) / bias1

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
            # resolve a schedule lr at the step ABOUT to be taken (t = step+1,
            # matching Adam.step's bias-correction counter)
            lr = self.lr(state.step + 1) if callable(self.lr) else self.lr
            model = jax.tree_util.tree_map(
                lambda p: p * (1.0 - lr * self.decoupled_weight_decay), model
            )
        return super().step(model, grads, state)

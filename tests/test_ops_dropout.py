"""Fused dropout ops (ops/dropout.py) — CPU fallback semantics + wiring.

The Pallas PRNG kernels are chip-only (no CPU lowering for
``pltpu.prng_seed``); on CPU these ops must reproduce the op-graph
composition bit-for-bit (same bernoulli mask from the same key), which is
what the pre-r5 ``nn.functional`` implementations computed.  On-chip
structural checks live in kernel_bench/compile_smoke.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flashattn_tpu.nn.functional as F
from flashattn_tpu.ops.dropout import (
    _pick_block,
    fused_dropout,
    fused_dropout_act_bias,
    fused_dropout_res_bias,
)


def _manual_dropout(x, rate, key):
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x, jnp.zeros_like(x)) / (1.0 - rate)


def test_fused_dropout_matches_opgraph():
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 256))
    np.testing.assert_array_equal(fused_dropout(x, 0.3, key),
                                  _manual_dropout(x, 0.3, key))
    np.testing.assert_array_equal(fused_dropout(x, 0.0, key), x)
    np.testing.assert_array_equal(fused_dropout(x, 0.3, None), x)


def test_res_bias_matches_opgraph():
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 128))
    b = jax.random.normal(jax.random.PRNGKey(1), (128,))
    r = jax.random.normal(jax.random.PRNGKey(2), (32, 128))
    got = fused_dropout_res_bias(x, b, r, 0.25, key)
    want = r + _manual_dropout(x + b, 0.25, key)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # rate=0 / no key: plain residual + bias add
    np.testing.assert_allclose(fused_dropout_res_bias(x, b, r, 0.0, key),
                               r + x + b, atol=1e-6)
    np.testing.assert_allclose(fused_dropout_res_bias(x, b, r, 0.5, None),
                               r + x + b, atol=1e-6)


@pytest.mark.parametrize("act", ["gelu", "relu"])
def test_act_bias_matches_opgraph(act):
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 128))
    b = jax.random.normal(jax.random.PRNGKey(1), (128,))
    y = F.GELU(x + b) if act == "gelu" else jnp.maximum(x + b, 0.0)
    got = fused_dropout_act_bias(x, b, 0.25, key, act)
    want = _manual_dropout(y, 0.25, key)
    np.testing.assert_allclose(got, want, atol=1e-6)
    np.testing.assert_allclose(fused_dropout_act_bias(x, b, 0.0, key, act),
                               y, atol=1e-6)


def test_act_bias_rejects_unknown_act():
    x = jnp.zeros((8, 128))
    b = jnp.zeros((128,))
    with pytest.raises(ValueError):
        fused_dropout_act_bias(x, b, 0.1, jax.random.PRNGKey(0), "swish")


def test_functional_wiring_unchanged_on_cpu():
    """F.dropout / F.dropout_res_bias / F.dropout_act_bias still produce the
    pre-r5 op-graph values on CPU after the fused rerouting."""
    key = jax.random.PRNGKey(11)
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 384))
    b = jax.random.normal(jax.random.PRNGKey(1), (384,))
    r = jax.random.normal(jax.random.PRNGKey(2), (16, 384))
    np.testing.assert_array_equal(F.dropout(x, 0.3, key, scale=True),
                                  _manual_dropout(x, 0.3, key))
    keep = jax.random.bernoulli(key, 0.7, x.shape)
    np.testing.assert_array_equal(F.dropout(x, 0.3, key, scale=False),
                                  jnp.where(keep, x, 0.0))
    np.testing.assert_allclose(F.dropout_res_bias(x, b, r, 0.25, key),
                               r + _manual_dropout(x + b, 0.25, key),
                               atol=1e-6)
    np.testing.assert_allclose(F.dropout_act_bias(x, b, 0.25, key),
                               _manual_dropout(F.GELU(x + b), 0.25, key),
                               atol=1e-6)


def test_grads_flow_through_fallbacks():
    key = jax.random.PRNGKey(13)
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 128))
    b = jax.random.normal(jax.random.PRNGKey(1), (128,))
    r = jax.random.normal(jax.random.PRNGKey(2), (16, 128))

    g = jax.grad(lambda a, bb, rr: jnp.sum(
        fused_dropout_res_bias(a, bb, rr, 0.25, key)), argnums=(0, 1, 2))(
            x, b, r)
    keep = jax.random.bernoulli(key, 0.75, x.shape)
    np.testing.assert_allclose(g[0], keep / 0.75, atol=1e-6)
    np.testing.assert_allclose(g[1], jnp.sum(keep / 0.75, axis=0), atol=1e-4)
    np.testing.assert_allclose(g[2], jnp.ones_like(r), atol=1e-6)


def test_pick_block_formula_is_shared():
    """fwd and bwd must regenerate the same mask — the block formula is the
    contract (same (n, d, itemsize) -> same block)."""
    for d in (128, 1024, 4096, 8192):
        for itemsize in (2, 4):
            b1 = _pick_block(4096, d, itemsize)
            b2 = _pick_block(4096, d, itemsize)
            assert b1 == b2 and b1 >= 8
            # block stages 5 tiles + bits inside the 16MB scoped budget
            assert b1 * d * (5 * itemsize + 4) <= 12 * 2**20 or b1 == 8

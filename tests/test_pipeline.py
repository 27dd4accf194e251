"""Pipeline-parallelism tests on the 8-device virtual CPU mesh.

Checks the SPMD GPipe schedule (parallel/pipeline.py) against plain
sequential layer application — values and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattn_tpu.parallel.mesh import create_mesh
from flashattn_tpu.parallel.pipeline import (
    STAGE_AXIS,
    pipeline_apply,
    scan_stage_fn,
    split_layers_into_stages,
    stack_stage_params,
)


def _mlp_layer_params(key, d):
    k1, k2 = jax.random.split(key)
    return {"w": jax.random.normal(k1, (d, d)) * (1.0 / np.sqrt(d)),
            "b": jax.random.normal(k2, (d,)) * 0.01}


def _mlp_layer(p, x):
    return x + jnp.tanh(x @ p["w"] + p["b"])


def _build(n_layers, d, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), n_layers)
    return [_mlp_layer_params(k, d) for k in keys]


def _sequential(layers, x):
    for p in layers:
        x = _mlp_layer(p, x)
    return x


@pytest.mark.parametrize("n_stages,n_layers,n_mb", [(4, 8, 8), (8, 8, 16), (2, 6, 4)])
def test_pipeline_matches_sequential(n_stages, n_layers, n_mb):
    d, batch = 16, 32
    layers = _build(n_layers, d)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, d))

    mesh = create_mesh((n_stages,), (STAGE_AXIS,))
    stages = split_layers_into_stages(layers, n_stages)
    stacked = stack_stage_params(stages)
    stage_fn = scan_stage_fn(_mlp_layer)

    out = pipeline_apply(stage_fn, stacked, x, mesh, n_microbatches=n_mb)
    want = _sequential(layers, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_under_jit_and_grad():
    n_stages, n_layers, n_mb, d, batch = 4, 4, 8, 8, 16
    layers = _build(n_layers, d, seed=2)
    x = jax.random.normal(jax.random.PRNGKey(3), (batch, d))
    tgt = jax.random.normal(jax.random.PRNGKey(4), (batch, d))

    mesh = create_mesh((n_stages,), (STAGE_AXIS,))
    stacked = stack_stage_params(split_layers_into_stages(layers, n_stages))
    stage_fn = scan_stage_fn(_mlp_layer)

    @jax.jit
    def loss_pipe(params, x):
        out = pipeline_apply(stage_fn, params, x, mesh, n_microbatches=n_mb)
        return jnp.mean((out - tgt) ** 2)

    def loss_seq(layers, x):
        return jnp.mean((_sequential(layers, x) - tgt) ** 2)

    lp = loss_pipe(stacked, x)
    ls = loss_seq(layers, x)
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-5)

    gp = jax.grad(loss_pipe)(stacked, x)
    gs = jax.grad(loss_seq)(layers, x)
    # re-stack sequential grads the same way for comparison
    gs_stacked = stack_stage_params(split_layers_into_stages(gs, n_stages))
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gs_stacked)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pipeline_rejects_bad_microbatch():
    mesh = create_mesh((2,), (STAGE_AXIS,))
    layers = _build(2, 4)
    stacked = stack_stage_params(split_layers_into_stages(layers, 2))
    x = jnp.zeros((10, 4))
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(scan_stage_fn(_mlp_layer), stacked, x, mesh,
                       n_microbatches=3)

"""Mixture-of-Experts FFN: routing correctness, single-expert equivalence,
load-balancing aux, capacity overflow, expert-parallel sharding, and
end-to-end learnability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flashattn_tpu as ft
from flashattn_tpu.models.moe import MoEFeedForward


def test_single_expert_equals_dense_math():
    """E=1 top-1: routing is trivial (gate renormalises to 1) so the MoE
    equals the plain GELU MLP with the same stacked weights."""
    key = jax.random.PRNGKey(0)
    moe = MoEFeedForward(32, 64, 1, top_k=1, capacity_factor=2.0, key=key)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32))
    got = moe(x)
    want = jnp.einsum(
        "bsm,md->bsd",
        ft.F.GELU(jnp.einsum("bsd,dm->bsm", x, moe.experts_in[0])),
        moe.experts_out[0])
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("top_k", [1, 2])
def test_routing_is_per_token_and_gates_normalised(top_k):
    key = jax.random.PRNGKey(2)
    moe = MoEFeedForward(16, 32, 4, top_k=top_k, capacity_factor=4.0,
                         key=key)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 6, 16))
    y, aux = moe.forward_with_aux(x)
    assert y.shape == x.shape
    assert np.isfinite(float(aux)) and float(aux) > 0
    # permuting tokens permutes outputs (routing has no cross-token mixing
    # at generous capacity)
    perm = jnp.asarray([3, 1, 5, 0, 2, 4])
    y2 = moe(x[:, perm])
    np.testing.assert_allclose(y2, y[:, perm], atol=1e-5, rtol=1e-5)


def test_capacity_overflow_drops_not_corrupts():
    """capacity 1-2 slots: overflowing tokens produce ZERO output (fall
    through the residual), never NaN or another token's value."""
    key = jax.random.PRNGKey(4)
    moe = MoEFeedForward(16, 32, 2, top_k=1, capacity_factor=0.1, key=key)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 16))
    y = moe(x)
    assert bool(jnp.isfinite(y).all())
    # at least one token overflowed => some all-zero rows
    norms = jnp.linalg.norm(y[0], axis=-1)
    assert float(jnp.min(norms)) == 0.0


def test_top1_router_gets_task_gradient():
    """Switch top-1 keeps the RAW gate as the multiplier — renormalising
    would make it exactly 1 and cut the router off from the task loss."""
    key = jax.random.PRNGKey(20)
    moe = MoEFeedForward(16, 32, 4, top_k=1, capacity_factor=4.0, key=key)
    x = jax.random.normal(jax.random.PRNGKey(21), (2, 16, 16))

    # task-only loss (NO aux): router grad must still be nonzero
    g = jax.grad(lambda m: jnp.sum(m(x) ** 2))(moe)
    assert float(jnp.abs(g.router.weights).sum()) > 0


def test_grads_reach_all_experts():
    key = jax.random.PRNGKey(6)
    moe = MoEFeedForward(16, 32, 4, top_k=2, capacity_factor=2.0, key=key)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 32, 16))

    def loss(m):
        y, aux = m.forward_with_aux(x)
        return jnp.sum(y ** 2) + 0.01 * aux

    g = jax.grad(loss)(moe)
    per_expert = jnp.sum(jnp.abs(g.experts_in), axis=(1, 2))
    assert bool(jnp.all(per_expert > 0)), per_expert
    assert float(jnp.abs(g.router.weights).sum()) > 0


def test_moe_decoder_learns_copy_task():
    model = ft.DecoderLM(32, 32, 4, 16, p_dropout=0.0, n_layer=2,
                         n_experts=4, moe_top_k=2, middle_dim=64,
                         attn_impl="reference", key=jax.random.PRNGKey(8))
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(1, 32, (64, 9)), jnp.int32)
    opt = ft.Adam(lr=3e-3)
    state = opt.init(model)
    from flashattn_tpu.training import make_moe_loss

    loss_fn = make_moe_loss(aux_alpha=0.01)

    @jax.jit
    def step(m, s):
        l, g = jax.value_and_grad(loss_fn)(m, toks[:, :-1], toks[:, 1:],
                                           None, None)
        m, s = opt.step(m, g, s)
        return m, s, l

    model, state, l0 = step(model, state)
    for _ in range(80):
        model, state, l = step(model, state)
    assert float(l) < float(l0) * 0.5, (float(l0), float(l))


def test_moe_cached_decode_matches_forward():
    model = ft.DecoderLM(32, 32, 4, 16, p_dropout=0.0, n_layer=2,
                         n_experts=4, middle_dim=64, attn_impl="reference",
                         key=jax.random.PRNGKey(9)).eval()
    toks = jax.random.randint(jax.random.PRNGKey(10), (2, 10), 0, 32)
    want = model(toks)
    caches = model.init_cache(2, 10)
    got = []
    for i in range(10):
        logits, caches = model.forward_decode(toks[:, i:i + 1], caches, i)
        got.append(logits[:, 0])
    np.testing.assert_allclose(np.stack(got, 1), want, atol=1e-4, rtol=1e-4)


def test_expert_parallel_sharding():
    """EP over the 8-device mesh: expert weights shard over the model axis
    and the sharded forward matches single-device."""
    from flashattn_tpu.parallel import create_mesh, shard_model, tp_spec_for
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert tp_spec_for("layers.0.ff.experts_in") == P("model", None, None)
    assert tp_spec_for("layers.0.ff.router.weights") == P()

    mesh = create_mesh((2, 4), ("data", "model"))
    model = ft.DecoderLM(32, 32, 4, 16, p_dropout=0.0, n_layer=1,
                         n_experts=4, middle_dim=64, attn_impl="reference",
                         key=jax.random.PRNGKey(11)).eval()
    toks = jax.random.randint(jax.random.PRNGKey(12), (4, 12), 0, 32)
    want = model(toks)
    sharded = shard_model(model, mesh)
    assert (sharded.layers[0].ff.experts_in.sharding.spec
            == P("model", None, None))
    toks_s = jax.device_put(toks, NamedSharding(mesh, P("data")))
    got = jax.jit(lambda m, t: m(t))(sharded, toks_s)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    # EP training step: grads flow under the mesh
    def loss(m):
        lg, aux = m.forward_with_aux(toks_s)
        return jnp.mean(lg ** 2) + 0.01 * aux

    g = jax.jit(jax.grad(loss))(sharded)
    assert bool(jnp.isfinite(g.layers[0].ff.experts_in).all())

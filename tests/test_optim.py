"""Optimizer semantics vs the reference update rules (minitorch/optim.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from flashattn_tpu.optim import SGD, Adam, AdamW


def test_sgd_matches_reference_rule():
    p = jnp.asarray([1.0, -2.0, 3.0])
    g = jnp.asarray([0.5, 0.5, -1.0])
    opt = SGD(lr=0.1)
    new_p, _ = opt.step(p, g, opt.init(p))
    np.testing.assert_allclose(new_p, np.asarray(p) - 0.1 * np.asarray(g))


def _reference_adam(p, gs, lr, b1, b2, eps, buggy):
    """The reference Adam.step loop (optim.py:50-79), numpy."""
    m = np.zeros_like(p)
    v = np.zeros_like(p)
    v_coef = (1 - b1) if buggy else (1 - b2)
    for t, g in enumerate(gs, start=1):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + v_coef * g * g
        denom = np.sqrt(v) + eps
        step_size = lr * np.sqrt(1 - b2**t) / (1 - b1**t)
        p = p - step_size * m / denom
    return p


def test_adam_matches_reference_formula_fixed():
    p0 = np.asarray([1.0, -2.0, 3.0], np.float32)
    gs = [np.asarray([0.1, -0.2, 0.3], np.float32) * (i + 1) for i in range(5)]
    opt = Adam(lr=0.01)
    p, state = jnp.asarray(p0), opt.init(jnp.asarray(p0))
    for g in gs:
        p, state = opt.step(p, jnp.asarray(g), state)
    np.testing.assert_allclose(
        p, _reference_adam(p0, gs, 0.01, 0.9, 0.999, 1e-8, buggy=False), rtol=1e-5
    )


def test_adam_reproduce_reference_bug_flag():
    p0 = np.asarray([0.5, 0.5], np.float32)
    gs = [np.asarray([0.3, -0.7], np.float32)] * 3
    opt = Adam(lr=0.02, reproduce_reference_bug=True)
    p, state = jnp.asarray(p0), opt.init(jnp.asarray(p0))
    for g in gs:
        p, state = opt.step(p, jnp.asarray(g), state)
    np.testing.assert_allclose(
        p, _reference_adam(p0, gs, 0.02, 0.9, 0.999, 1e-8, buggy=True), rtol=1e-5
    )


def test_adam_on_pytree_and_jit():
    tree = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}

    def loss(t):
        return jnp.sum((t["w"] @ jnp.ones((4,)) + t["b"] - 2.0) ** 2)

    opt = Adam(lr=0.05)
    state = opt.init(tree)

    @jax.jit
    def step(t, s):
        g = jax.grad(loss)(t)
        return opt.step(t, g, s)

    l0 = float(loss(tree))
    for _ in range(50):
        tree, state = step(tree, state)
    assert float(loss(tree)) < l0 * 0.05


def test_adamw_decays_weights():
    p = jnp.ones((3,))
    g = jnp.zeros((3,))
    opt = AdamW(lr=0.1, weight_decay=0.1)
    new_p, _ = opt.step(p, g, opt.init(p))
    assert float(new_p[0]) < 1.0


def test_clip_by_global_norm():
    from flashattn_tpu.optim import clip_by_global_norm, global_norm

    tree = {"a": jnp.asarray([3.0, 4.0]), "b": jnp.zeros((2, 2))}
    np.testing.assert_allclose(float(global_norm(tree)), 5.0, rtol=1e-6)
    clipped = clip_by_global_norm(tree, 1.0)
    np.testing.assert_allclose(float(global_norm(clipped)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(clipped["a"]), [0.6, 0.8], rtol=1e-6)
    # under the threshold: unchanged
    same = clip_by_global_norm(tree, 10.0)
    np.testing.assert_allclose(np.asarray(same["a"]), [3.0, 4.0], rtol=1e-6)


def test_warmup_cosine_schedule():
    from flashattn_tpu.optim import Adam, warmup_cosine

    sched = warmup_cosine(0.01, warmup_steps=10, total_steps=100)
    assert float(sched(jnp.asarray(0))) == 0.0
    np.testing.assert_allclose(float(sched(jnp.asarray(10))), 0.01, rtol=1e-5)
    assert float(sched(jnp.asarray(5))) < 0.01
    # decays toward final_frac * peak
    np.testing.assert_allclose(float(sched(jnp.asarray(100))), 0.001, rtol=1e-4)
    # Adam accepts a schedule
    m = {"w": jnp.ones((3,))}
    opt = Adam(lr=sched)
    s = opt.init(m)
    m2, s = opt.step(m, {"w": jnp.ones((3,))}, s)
    assert bool(jnp.all(jnp.isfinite(m2["w"])))


def test_clip_skips_nonfinite_update():
    from flashattn_tpu.optim import clip_by_global_norm

    tree = {"a": jnp.asarray([jnp.nan, 1.0])}
    clipped = clip_by_global_norm(tree, 1.0)
    np.testing.assert_array_equal(np.asarray(clipped["a"]), [0.0, 0.0])


def test_adafactor_one_step_matches_numpy_reference():
    """One factored step on a 2-D matrix vs a hand-rolled numpy transcript
    of the paper's update (beta2_1 = 1 - 1^-0.8 = 0, rms clip, relative
    step)."""
    from flashattn_tpu.optim import Adafactor

    rng = np.random.default_rng(0)
    p = rng.normal(size=(4, 6)).astype(np.float32)
    g = rng.normal(size=(4, 6)).astype(np.float32)
    opt = Adafactor()
    state = opt.init(jnp.asarray(p))
    new_p, new_state = opt.step(jnp.asarray(p), jnp.asarray(g), state)

    eps1, eps2 = 1e-30, 1e-3
    g2 = g.astype(np.float64) ** 2 + eps1
    vr = g2.mean(-1)            # b2t = 0 at t=1: stats are this step's
    vc = g2.mean(-2)
    red = vr / vr.mean(-1, keepdims=True)
    u = g / np.sqrt(red)[:, None] / np.sqrt(vc)[None, :]
    u = u / max(1.0, np.sqrt((u ** 2).mean()) / 1.0)
    rho = min(1e-2, 1.0)
    alpha = max(eps2, float(np.sqrt((p.astype(np.float64) ** 2).mean()))) * rho
    want = p - alpha * u
    np.testing.assert_allclose(np.asarray(new_p), want, atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state.vr), vr, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state.vc), vc, rtol=1e-5)


def test_adafactor_memory_is_factored():
    """For an (R, C) matrix the state holds R + C floats, not R*C."""
    from flashattn_tpu.optim import Adafactor

    model = {"w": jnp.zeros((128, 512)), "b": jnp.zeros((512,))}
    state = Adafactor().init(model)
    assert state.vr["w"].shape == (128,)
    assert state.vc["w"].shape == (512,)
    assert state.vr["b"].shape == (512,)      # 1-d: full moment
    assert state.vc["b"].shape == (0,)
    assert state.m is None                    # no first moment by default


def test_adafactor_trains_a_model():
    """End-to-end: loss decreases on a tiny LM, jitted, relative step."""
    import flashattn_tpu as ft

    model = ft.DecoderLM(64, 32, 4, 64, p_dropout=0.0, n_layer=1,
                         attn_impl="reference", key=jax.random.PRNGKey(0))
    data = jax.random.randint(jax.random.PRNGKey(1), (8, 17), 0, 64)
    opt = ft.Adafactor()
    state = opt.init(model)

    def loss_fn(m):
        logits = m(data[:, :-1])
        return jnp.mean(ft.F.softmax_loss(
            logits.reshape(-1, 64), data[:, 1:].reshape(-1)))

    @jax.jit
    def step(m, s):
        l, g = jax.value_and_grad(loss_fn)(m)
        m, s = opt.step(m, g, s)
        return m, s, l

    m, s = model, state
    m, s, l0 = step(m, s)
    for _ in range(60):
        m, s, l = step(m, s)
    assert float(l) < float(l0) * 0.7, (float(l0), float(l))


def test_adafactor_momentum_and_fixed_lr():
    """beta1 > 0 allocates and uses the first moment; fixed lr works."""
    from flashattn_tpu.optim import Adafactor

    p = jnp.ones((3, 3))
    g = jnp.ones((3, 3))
    opt = Adafactor(lr=0.1, beta1=0.9, relative_step=False)
    state = opt.init(p)
    assert state.m is not None
    p1, s1 = opt.step(p, g, state)
    p2, s2 = opt.step(p1, g, s1)
    assert float(jnp.max(p2)) < float(jnp.max(p1)) < 1.0

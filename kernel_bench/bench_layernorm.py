"""Fused layernorm fw/bw micro-benchmarks vs the op-graph baseline.

TPU re-staging of reference ``kernel_tests/test_layernorm_fw.py`` /
``test_layernorm_bw.py``.  Run on the real chip:

    PYTHONPATH=.:/root/.axon_site python kernel_bench/bench_layernorm.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import jax
import jax.numpy as jnp

from flashattn_tpu import layernorm, layernorm_reference
from flashattn_tpu.utils.timing import KernelBench

kt = KernelBench(rtol=1e-3, atol=1e-3, ntest=5, max_batch_tokens=8192,
                 max_seq_len=512)

HIDDEN = 1024


@kt.case(name="layernorm_fw")
def ln_fw(kt: KernelBench):
    bs, seq = kt.bs_sl()
    x = jax.random.normal(jax.random.PRNGKey(bs * seq), (bs * seq, HIDDEN))
    gamma = jnp.ones((HIDDEN,)) * 1.1
    beta = jnp.zeros((HIDDEN,)) + 0.05

    def custom(x, g, b):
        return layernorm(x, g, b)

    def baseline(x, g, b):
        return layernorm_reference(x, g, b)

    return custom, baseline, (x, gamma, beta)


@kt.case(name="layernorm_bw")
def ln_bw(kt: KernelBench):
    bs, seq = kt.bs_sl()
    x = jax.random.normal(jax.random.PRNGKey(bs + seq), (bs * seq, HIDDEN))
    gamma = jnp.ones((HIDDEN,)) * 1.1
    beta = jnp.zeros((HIDDEN,)) + 0.05
    dy = jax.random.normal(jax.random.PRNGKey(3), x.shape)

    def custom(x, g, b):
        return jax.grad(lambda t: jnp.sum(layernorm(t, g, b) * dy))(x)

    def baseline(x, g, b):
        return jax.grad(lambda t: jnp.sum(layernorm_reference(t, g, b) * dy))(x)

    return custom, baseline, (x, gamma, beta)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    kt.run_all()

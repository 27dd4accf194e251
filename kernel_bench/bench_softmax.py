"""Fused attention-softmax fw/bw micro-benchmarks vs the op-graph baseline.

TPU re-staging of reference ``kernel_tests/test_softmax_fw.py`` /
``test_softmax_bw.py``: random (batch, seq) draws, correctness gate, timed
custom-vs-baseline speedup report.  Run on the real chip:

    PYTHONPATH=.:/root/.axon_site python kernel_bench/bench_softmax.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import jax
import jax.numpy as jnp

from flashattn_tpu import attn_softmax, attn_softmax_reference
from flashattn_tpu.utils.timing import KernelBench

NHEAD = 8

kt = KernelBench(rtol=1e-3, atol=1e-3, ntest=5, max_batch_tokens=4096,
                 max_seq_len=1024)


@kt.case(name="attn_softmax_fw")
def softmax_fw(kt: KernelBench):
    bs, seq = kt.bs_sl()
    x = jax.random.normal(jax.random.PRNGKey(bs * seq), (bs, NHEAD, seq, seq))
    mask = jnp.where(
        jax.random.bernoulli(jax.random.PRNGKey(1), 0.9, (bs, 1, 1, seq)),
        0.0, -1e9).astype(jnp.float32)

    def custom(x, mask):
        return attn_softmax(x, mask, True, impl="pallas")

    def baseline(x, mask):
        return attn_softmax_reference(x, mask, True)

    return custom, baseline, (x, mask)


@kt.case(name="attn_softmax_bw")
def softmax_bw(kt: KernelBench):
    bs, seq = kt.bs_sl()
    x = jax.random.normal(jax.random.PRNGKey(bs + seq), (bs, NHEAD, seq, seq))
    dy = jax.random.normal(jax.random.PRNGKey(2), x.shape)

    def custom(x, dy):
        return jax.grad(lambda t: jnp.sum(attn_softmax(t, None, True, impl="pallas") * dy))(x)

    def baseline(x, dy):
        return jax.grad(
            lambda t: jnp.sum(attn_softmax_reference(t, None, True) * dy))(x)

    return custom, baseline, (x, dy)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    kt.run_all()

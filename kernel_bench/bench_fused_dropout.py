"""Fused dropout+bias(+residual) — XLA fusion vs handwritten Pallas.

Closes the last reference kernel-surface row (``launch_ls_dropout_res_bias``
/ ``launch_ls_dropout_act_bias``, src/includes/kernels.h:113-175 — declared-
only there): measures whether a hand-fused Pallas kernel beats XLA's own
fusion of the op-graph composition (``nn.functional.dropout_res_bias``).

Run ON TPU: PYTHONPATH=/root/repo:/root/.axon_site python kernel_bench/bench_fused_dropout.py
"""

import functools
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashattn_tpu.utils.timing import device_loop_time


def opgraph_dropout_res_bias(x, bias, residual, rate, key):
    """The PRE-r5 op-graph composition, inlined as the baseline: since r5,
    ``nn.functional.dropout_res_bias`` itself routes through the Pallas
    kernel on chip, so importing it would compare the kernel to itself
    (caught when a rerun showed 'XLA' at 2266 GB/s — it WAS the kernel)."""
    y = x + bias
    keep = jax.random.bernoulli(key, 1.0 - rate, y.shape)
    y = jnp.where(keep, y, jnp.zeros_like(y)) / (1.0 - rate)
    return residual + y


def _fused_kernel(seed_ref, x_ref, b_ref, r_ref, o_ref, *, rate: float):
    # one elementwise pass: bias add, PRNG mask, inverted-dropout rescale,
    # residual add — the LightSeq fusion, TPU-side
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    y = x_ref[...] + b_ref[...]
    bits = pltpu.prng_random_bits(y.shape)
    thresh = jnp.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    keep = pltpu.bitcast(bits, jnp.uint32) >= thresh
    y = jnp.where(keep, y, jnp.zeros_like(y)) / (1.0 - rate)
    o_ref[...] = (r_ref[...] + y).astype(o_ref.dtype)


def pallas_dropout_res_bias(x, bias, residual, rate, seed, block_rows=512):
    n, d = x.shape
    # scoped-vmem: the block stages x + residual + random bits + output at
    # (block_rows, d); d=4096 at 512 rows overflows the 16MB limit by 36KB
    # (measured) — halve rows at wide hiddens
    while block_rows > 128 and block_rows * d * 4 * 2 > 12 * 2**20:
        block_rows //= 2
    grid = (n // block_rows,)
    return pl.pallas_call(
        functools.partial(_fused_kernel, rate=rate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_rows, d), lambda i, s: (i, 0)),
                pl.BlockSpec((1, d), lambda i, s: (0, 0)),
                pl.BlockSpec((block_rows, d), lambda i, s: (i, 0)),
            ],
            out_specs=pl.BlockSpec((block_rows, d), lambda i, s: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n, d), x.dtype),
    )(jnp.asarray([seed], jnp.int32), x, bias.reshape(1, d), residual)


def _check_correctness():
    """Gate the timing on kernel correctness: every output row must equal
    either residual + (x+b)/(1-rate) (kept) or residual (dropped), with the
    keep fraction near 1-rate."""
    n, d, rate = 1024, 256, 0.25
    x = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (d,), jnp.float32)
    r = jax.random.normal(jax.random.PRNGKey(2), (n, d), jnp.float32)
    out = pallas_dropout_res_bias(x, b, r, rate, seed=3, block_rows=256)
    kept_val = r + (x + b) / (1.0 - rate)
    is_kept = jnp.isclose(out, kept_val, atol=1e-5)
    is_dropped = jnp.isclose(out, r, atol=1e-5)
    assert bool(jnp.all(is_kept | is_dropped)), "unexpected output values"
    frac = float(jnp.mean(is_kept))
    assert abs(frac - (1.0 - rate)) < 0.02, f"keep fraction {frac}"
    print(f"correctness OK (keep fraction {frac:.3f} ~ {1-rate})")


def main():
    if jax.default_backend() != "tpu":
        # pltpu.prng_seed has no CPU lowering (same gate as
        # ops/quant.quantize_int8_stochastic's fallback) — this bench only
        # answers a TPU question anyway
        raise SystemExit("bench_fused_dropout requires a TPU backend")
    _check_correctness()
    rate = 0.1
    for (n, d, dtype) in [(8192, 1024, jnp.bfloat16),
                          (32768, 1024, jnp.bfloat16),
                          (8192, 4096, jnp.bfloat16),
                          (8192, 1024, jnp.float32)]:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (n, d), dtype)
        b = jax.random.normal(jax.random.PRNGKey(1), (d,), dtype)
        r = jax.random.normal(jax.random.PRNGKey(2), (n, d), dtype)

        def xla_op(x, r):
            return opgraph_dropout_res_bias(x, b, r, rate,
                                            jax.random.PRNGKey(7))

        def pallas_op(x, r):
            return pallas_dropout_res_bias(x, b, r, rate, seed=7)

        t_xla = device_loop_time(xla_op, (x, r))
        t_pal = device_loop_time(pallas_op, (x, r))
        bytes_moved = (3 * n * d + d) * x.dtype.itemsize
        bw = lambda t: bytes_moved / t / 1e9
        print(f"{n}x{d} {jnp.dtype(dtype).name}: XLA fusion {t_xla*1e6:.1f}us "
              f"({bw(t_xla):.0f} GB/s) | Pallas {t_pal*1e6:.1f}us "
              f"({bw(t_pal):.0f} GB/s) | pallas/xla {t_xla/t_pal:.2f}x")


if __name__ == "__main__":
    main()

"""Round-4 flash measurement: fused subrow BACKWARD + subrow forward at 4K.

The r3 loop backward splits into dQ (q-major) and dKV (kv-major) kernels, so
every (q, kv) pair's scores are computed twice — 7 score-shaped dots total
where only 5 are essential.  At seq <= 2K the whole row is VMEM-resident, so
`_bwd_subrow_kernel` fuses the entire backward into ONE kernel with exactly
5 dots (s, dv, dp, dq, dk) per triangular row group.  Expected ~1.3-1.4x
over the loop backward at 2K.

Also re-attempts the subrow FORWARD at 4K (r3: HTTP 500 vmem overflow at
every sub) with the new full-width-select mask (no slice+concat buffer).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u kernel_bench/r4_measure.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import flashattn_tpu as ft
from flashattn_tpu.ops import flash_attention as fa
from flashattn_tpu.utils.timing import device_loop_time

ROOFLINE = 175.0
B, H, D = 4, 8, 128


def run(section):
    return section in sys.argv[1:] or len(sys.argv) == 1


# -- on-chip correctness gate (f32, N=1024 fits vmem in every variant) -------
if run("gate"):
    N = 1024
    qf = jax.random.normal(jax.random.PRNGKey(0), (B, 2, N, D), jnp.float32)
    dox = jax.random.normal(jax.random.PRNGKey(1), (B, 2, N, D), jnp.float32)
    o, lse = fa._flash_fwd_entry(qf, qf, qf, True, None, 512, 512, "pallas")
    di = jnp.sum(o * dox, axis=-1, keepdims=True)
    g_loop = fa._flash_bwd_loop(qf, qf, qf, lse, di, dox, sm_scale=D**-0.5,
                                block=512, diag_strip=256)
    for sub in (256, 512):
        g_sub = fa._flash_bwd_subrow(qf, qf, qf, lse, di, dox,
                                     sm_scale=D**-0.5, sub=sub)
        err = max(float(jnp.max(jnp.abs(a - b)))
                  for a, b in zip(g_sub, g_loop))
        print(f"bwd subrow sub={sub} on-chip f32 max err vs loop bwd: {err:.3e}")
        if err > 5e-3:
            print("BWD CORRECTNESS FAIL -- not measuring a wrong kernel")
            sys.exit(1)
    o_c, lse_c = fa._flash_fwd_subrow(qf, qf, qf, sm_scale=D**-0.5, sub=256,
                                      concat_mask=True)
    o_w, lse_w = fa._flash_fwd_subrow(qf, qf, qf, sm_scale=D**-0.5, sub=256,
                                      concat_mask=False)
    err = max(float(jnp.max(jnp.abs(o_c - o_w))),
              float(jnp.max(jnp.abs(lse_c - lse_w))))
    print(f"fwd subrow where-mask on-chip f32 max err vs concat: {err:.3e}")
    if err > 2e-3:
        print("FWD MASK-VARIANT CORRECTNESS FAIL")
        sys.exit(1)

# -- backward kernels, raw-call timing (bf16, the production dtype) ----------
if run("bwd"):
    print("== r4 bwd causal bf16 B4 H8 D128: loop (2 kernels) vs fused subrow ==")
    print("   useful TF = 5 score-shaped dots, halved below the diagonal")
    for N in (1024, 2048):
        q = jax.random.normal(jax.random.PRNGKey(0), (B, H, N, D),
                              jnp.bfloat16)
        do = jax.random.normal(jax.random.PRNGKey(1), (B, H, N, D),
                               jnp.bfloat16)
        o, lse = fa._flash_fwd_subrow(q, q, q, sm_scale=D**-0.5, sub=512)
        di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32),
                     axis=-1, keepdims=True)
        flops = 5 * 2 * B * H * N * N * D * 0.5

        # The timing chain threads only out[0]; fold dk/dv into the carry so
        # XLA cannot DCE the dKV kernel (first r4 run measured the loop
        # schedule at 207 "TF" — above the roofline — because only the dQ
        # kernel survived).
        def all_outs(fn):
            def wrapped(x, y):
                dq, dk, dv = fn(x, y)
                return dq + 1e-12 * (jnp.sum(dk) + jnp.sum(dv))
            return wrapped

        rows = [("loop b1024 rg256",
                 all_outs(lambda x, y: fa._flash_bwd_loop(
                     x, x, x, lse, di, y, sm_scale=D**-0.5,
                     block=min(N, 1024), diag_strip=256)))]
        rows += [(f"subrow sub={sub}",
                  all_outs((lambda s: lambda x, y: fa._flash_bwd_subrow(
                      x, x, x, lse, di, y, sm_scale=D**-0.5, sub=s))(sub)))
                 for sub in (256, 512)]
        for label, fn in rows:
            try:
                t = device_loop_time(fn, (q, do), iters=40)
                print(f"{label:18s} N={N}: {t*1e3:7.3f} ms  "
                      f"{flops/t/1e12:6.1f} TF")
            except Exception as e:  # noqa: BLE001
                print(f"{label:18s} N={N}: FAILED {type(e).__name__} "
                      f"{str(e)[:120]}")

# -- grad-interval A/B (the PERF.md bwd-table methodology) -------------------
if run("grad"):
    print("== r4 grad interval (fwd + di + bwd) bf16 B4 H8 D128 ==")
    for N in (1024, 2048, 4096, 8192):
        ks = jax.random.split(jax.random.PRNGKey(N), 4)
        q = jax.random.normal(ks[0], (B, H, N, D), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, H, N, D), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, H, N, D), jnp.bfloat16)
        dy = jax.random.normal(ks[3], (B, H, N, D), jnp.bfloat16)
        flops = 5 * 2 * B * H * N * N * D * 0.5
        for impl in ("auto", "loop", "pallas"):
            def bwd(q_, k_, v_, impl=impl):
                dq, dk, dv = jax.grad(
                    lambda a, b, c: jnp.sum(
                        ft.flash_attention(a, b, c, True, impl=impl)
                        .astype(jnp.float32) * dy.astype(jnp.float32)),
                    argnums=(0, 1, 2))(q_, k_, v_)
                # fold ALL grads into the threaded output: dk/dv otherwise
                # dangle and XLA DCEs the entire dKV pallas call
                return dq + 1e-12 * (jnp.sum(dk) + jnp.sum(dv))
            t = device_loop_time(bwd, (q, k, v), iters=30)
            print(f"grad impl={impl:6s} N={N}: {t*1e3:7.3f} ms  "
                  f"{flops/t/1e12:6.1f} TF(bwd-5dot)")

# -- forward subrow at 4K (r3 failed: vmem) -----------------------------------
if run("fwd4k"):
    print("== r4 fwd subrow @4K attempts (bf16 B4 H8 D128) ==")
    N = 4096
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, N, D), jnp.bfloat16)
    flops = 4 * B * H * N * N * D * 0.5
    t = device_loop_time(
        lambda x: fa._flash_fwd_loop(x, x, x, sm_scale=D**-0.5,
                                     block_q=1024)[0], (q,), iters=40)
    print(f"loop bq1024   N=4096: {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF")
    for concat in (False, True):
        for sub in (256, 512):
            label = f"subrow {sub} {'concat' if concat else 'where '}"
            try:
                fn = (lambda s, c: lambda x: fa._flash_fwd_subrow(
                    x, x, x, sm_scale=D**-0.5, sub=s, concat_mask=c)[0])(
                        sub, concat)
                t = device_loop_time(fn, (q,), iters=40)
                print(f"{label} N=4096: {t*1e3:7.3f} ms  "
                      f"{flops/t/1e12:6.1f} TF")
            except Exception as e:  # noqa: BLE001
                print(f"{label} N=4096: FAILED {type(e).__name__} "
                      f"{str(e)[:120]}")

# -- subrow at 4-16K under the raised scoped-vmem limit ----------------------
if run("vmem"):
    LIM = 100 * 1024 * 1024
    print("== r4 subrow fwd/bwd with vmem_limit=100MB (bf16 B4 H8 D128) ==")
    for N in (4096, 8192):
        q = jax.random.normal(jax.random.PRNGKey(0), (B, H, N, D),
                              jnp.bfloat16)
        do = jax.random.normal(jax.random.PRNGKey(1), (B, H, N, D),
                               jnp.bfloat16)
        fflops = 4 * B * H * N * N * D * 0.5
        t = device_loop_time(lambda x: fa._flash_fwd_loop(
            x, x, x, sm_scale=D**-0.5, block_q=1024)[0], (q,), iters=30)
        print(f"fwd loop bq1024    N={N}: {t*1e3:7.3f} ms  "
              f"{fflops/t/1e12:6.1f} TF")
        for sub in (256, 512):
            try:
                fn = (lambda s: lambda x: fa._flash_fwd_subrow(
                    x, x, x, sm_scale=D**-0.5, sub=s, concat_mask=False,
                    vmem_limit=LIM)[0])(sub)
                t = device_loop_time(fn, (q,), iters=30)
                print(f"fwd subrow{sub} vmem100 N={N}: {t*1e3:7.3f} ms  "
                      f"{fflops/t/1e12:6.1f} TF")
            except Exception as e:  # noqa: BLE001
                print(f"fwd subrow{sub} N={N}: FAILED {type(e).__name__} "
                      f"{str(e)[:90]}")
        o, lse = fa._flash_fwd_subrow(q, q, q, sm_scale=D**-0.5, sub=256,
                                      concat_mask=False, vmem_limit=LIM)
        di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32),
                     axis=-1, keepdims=True)
        bflops = 5 * 2 * B * H * N * N * D * 0.5

        def all_outs(fn):
            def wrapped(x, y):
                dq, dk, dv = fn(x, y)
                return dq + 1e-12 * (jnp.sum(dk) + jnp.sum(dv))
            return wrapped

        rows = [("bwd loop b1024 rg256 ",
                 all_outs(lambda x, y: fa._flash_bwd_loop(
                     x, x, x, lse, di, y, sm_scale=D**-0.5, block=1024,
                     diag_strip=256)))]
        rows += [(f"bwd subrow{sub} vmem100", all_outs(
            (lambda s: lambda x, y: fa._flash_bwd_subrow(
                x, x, x, lse, di, y, sm_scale=D**-0.5, sub=s,
                vmem_limit=LIM))(sub))) for sub in (256,)]
        for lbl, fn in rows:
            try:
                t = device_loop_time(fn, (q, do), iters=20)
                print(f"{lbl} N={N}: {t*1e3:7.3f} ms  "
                      f"{bflops/t/1e12:6.1f} TF")
            except Exception as e:  # noqa: BLE001
                print(f"{lbl} N={N}: FAILED {type(e).__name__} {str(e)[:90]}")

# -- int8/fp8-KV prefill through the subrow schedule -------------------------
if run("int8sub"):
    from flashattn_tpu.ops import quant as qz

    LIM = 100 * 1024 * 1024
    print("== r4 int8-KV subrow prefill (bf16 activations, B4 H8 D128) ==")
    qg = jax.random.normal(jax.random.PRNGKey(0), (B, 2, 2048, D),
                           jnp.bfloat16)
    kq, vq = qz.quantize_kv(qg.astype(jnp.float32), qg.astype(jnp.float32))
    o_s, _ = qz._kv8_flash_subrow(qg, kq, vq, sm_scale=D**-0.5, sub=512)
    o_l, _ = qz._kv8_flash_loop(qg, kq, vq, sm_scale=D**-0.5, block_q=1024)
    err = float(jnp.max(jnp.abs(o_s.astype(jnp.float32)
                                - o_l.astype(jnp.float32))))
    print(f"kv8 subrow vs loop @2K bf16 max err: {err:.3e}")
    assert err < 3e-2, "kv8 subrow CORRECTNESS FAIL"
    for N in (2048, 4096, 8192):
        ks = jax.random.split(jax.random.PRNGKey(N), 3)
        q = jax.random.normal(ks[0], (B, H, N, D), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, H, N, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, H, N, D), jnp.float32)
        kq, vq = qz.quantize_kv(k, v)
        flops = 4 * B * H * N * N * D * 0.5
        sub, lim = fa._subrow_params(N)
        rows = [
            ("bf16 subrow  ", lambda x: fa._flash_fwd_subrow(
                x, x, x, sm_scale=D**-0.5, sub=sub, concat_mask=False,
                vmem_limit=lim)[0]),
            ("kv8 loop     ", lambda x: qz._kv8_flash_loop(
                x, kq, vq, sm_scale=D**-0.5, block_q=1024)[0]),
            ("kv8 subrow   ", lambda x: qz._kv8_flash_subrow(
                x, kq, vq, sm_scale=D**-0.5, sub=sub, vmem_limit=lim)[0]),
        ]
        for lbl, fn in rows:
            try:
                t = device_loop_time(fn, (q,), iters=30)
                print(f"{lbl} N={N}: {t*1e3:7.3f} ms  "
                      f"{flops/t/1e12:6.1f} TF")
            except Exception as e:  # noqa: BLE001
                print(f"{lbl} N={N}: FAILED {type(e).__name__} {str(e)[:90]}")

# -- forward subrow mask-variant at 1-2K (guard against regression) ----------
if run("fwd2k"):
    print("== r4 fwd subrow mask variants (bf16 B4 H8 D128) ==")
    for N in (1024, 2048):
        q = jax.random.normal(jax.random.PRNGKey(0), (B, H, N, D),
                              jnp.bfloat16)
        flops = 4 * B * H * N * N * D * 0.5
        for concat in (True, False):
            for sub in (256, 512):
                label = f"subrow {sub} {'concat' if concat else 'where '}"
                fn = (lambda s, c: lambda x: fa._flash_fwd_subrow(
                    x, x, x, sm_scale=D**-0.5, sub=s, concat_mask=c)[0])(
                        sub, concat)
                try:
                    t = device_loop_time(fn, (q,), iters=60)
                    print(f"{label} N={N}: {t*1e3:7.3f} ms  "
                          f"{flops/t/1e12:6.1f} TF")
                except Exception as e:  # noqa: BLE001
                    print(f"{label} N={N}: FAILED {type(e).__name__} "
                          f"{str(e)[:120]}")

"""Round-5 flash measurements.

Sections (args select; no args = all):
  gate    on-chip correctness: varlen subrow vs grid varlen kernel (f32)
  varlen  varlen subrow vs grid varlen timing at serving-prefill shapes
  fwd2k   dense fwd @2K: sub x vmem-limit grid (the sub=256 tight-limit
          attempt VERDICT item 2 calls for; useful ceiling 155 TF)
  fwd8k   dense fwd @8K: hunt the remaining ~10% raw (bwd proves 98%)

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u kernel_bench/r5_measure.py [sections]
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from flashattn_tpu.ops import flash_attention as fa
from flashattn_tpu.utils.timing import device_loop_time

ROOFLINE = 175.0
B, H, D = 4, 8, 128
MB = 1024 * 1024


def run(section):
    return section in sys.argv[1:] or len(sys.argv) == 1


def causal_flops(n):
    return 4 * B * H * n * n * D * 0.5


def varlen_flops(lens, n, h=H):
    """Useful flops for causal+varlen: row i of batch b attends
    min(i+1, len_b) cols."""
    total = 0
    for ln in np.asarray(lens):
        i = np.arange(n)
        total += int(np.minimum(i + 1, ln).sum())
    return 4 * h * D * total


# -- on-chip correctness gate ------------------------------------------------
if run("gate"):
    N = 1024
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, 4, N, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, 2, N, D), jnp.float32)   # GQA 4q/2kv
    v = jax.random.normal(ks[2], (B, 2, N, D), jnp.float32)
    lens = jnp.asarray([N, N // 2, 173, 0], jnp.int32)
    o_grid, lse_grid = fa._flash_fwd(q, k, v, causal=True, sm_scale=D**-0.5,
                                     block_q=512, block_k=512,
                                     kv_lengths=lens)
    for sub in (256, 512):
        o_s, lse_s = fa._flash_fwd_subrow_varlen(q, k, v, lens,
                                                 sm_scale=D**-0.5, sub=sub)
        err = float(jnp.max(jnp.abs(o_s - o_grid)))
        # lse: grid emits -inf for empty rows too; compare finite rows
        fin = jnp.isfinite(lse_grid)
        lerr = float(jnp.max(jnp.abs(jnp.where(fin, lse_s - lse_grid, 0.0))))
        same_inf = bool(jnp.all(jnp.isfinite(lse_s) == fin))
        print(f"varlen subrow sub={sub} f32 max err vs grid: o {err:.3e} "
              f"lse {lerr:.3e} inf-pattern-match {same_inf}")
        if err > 5e-3 or lerr > 5e-3 or not same_inf:
            print("VARLEN SUBROW CORRECTNESS FAIL")
            sys.exit(1)

# -- varlen subrow vs grid varlen timing -------------------------------------
if run("varlen"):
    print("== r5 varlen prefill bf16 B4 H8 D128: grid vs subrow ==")
    print("   useful TF accounts the ragged causal workload (varlen_flops)")
    for N in (2048, 4096, 8192):
        sub, lim = fa._subrow_params(N)
        for tag, lens_np in (("full", [N] * B),
                             ("ragged", [N, 3 * N // 4, N // 2, N // 4])):
            lens = jnp.asarray(lens_np, jnp.int32)
            ks = jax.random.split(jax.random.PRNGKey(N), 3)
            q = jax.random.normal(ks[0], (B, H, N, D), jnp.bfloat16)
            k = jax.random.normal(ks[1], (B, H, N, D), jnp.bfloat16)
            v = jax.random.normal(ks[2], (B, H, N, D), jnp.bfloat16)
            flops = varlen_flops(lens_np, N)
            rows = [
                ("grid bq1024", lambda x, kk, vv: fa._flash_fwd(
                    x, kk, vv, causal=True, sm_scale=D**-0.5, block_q=1024,
                    block_k=1024, kv_lengths=lens)),
                (f"subrow {sub}/{(lim or 0)//MB}MB",
                 lambda x, kk, vv: fa._flash_fwd_subrow_varlen(
                     x, kk, vv, lens, sm_scale=D**-0.5, sub=sub,
                     vmem_limit=lim)),
            ]
            for label, fn in rows:
                try:
                    t = device_loop_time(fn, (q, k, v), iters=30)
                    print(f"{label:18s} N={N} {tag:6s}: {t*1e3:7.3f} ms  "
                          f"{flops/t/1e12:6.1f} TF-useful")
                except Exception as e:  # noqa: BLE001
                    print(f"{label:18s} N={N} {tag:6s}: FAILED "
                          f"{type(e).__name__} {str(e)[:110]}")

# -- confirm run: the fwd2k winner vs incumbent, interleaved x3 --------------
if run("confirm2k"):
    print("== r5 fwd @2K confirm: sub256/24M vs sub512/def, interleaved ==")
    N = 2048
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, N, D), jnp.bfloat16)
    flops = causal_flops(N)
    for rep in range(3):
        for sub, lim in ((256, 24 * MB), (512, None)):
            fn = (lambda s, l: lambda x: fa._flash_fwd_subrow(
                x, x, x, sm_scale=D**-0.5, sub=s, concat_mask=False,
                vmem_limit=l)[0])(sub, lim)
            t = device_loop_time(fn, (q,), iters=30)
            print(f"rep{rep} sub={sub:3d} "
                  f"lim={'def' if lim is None else str(lim//MB)+'M'}: "
                  f"{t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF-useful")

# -- varlen subrow @8K: find a compiling limit -------------------------------
if run("varlen8k"):
    print("== r5 varlen subrow @8K: limit hunt (bf16 B4 H8 D128) ==")
    N = 8192
    lens = jnp.asarray([N] * B, jnp.int32)
    ks = jax.random.split(jax.random.PRNGKey(N), 3)
    q = jax.random.normal(ks[0], (B, H, N, D), jnp.bfloat16)
    flops = varlen_flops([N] * B, N)
    for lim in (72 * MB, 80 * MB, 100 * MB):
        try:
            fn = (lambda l: lambda x: fa._flash_fwd_subrow_varlen(
                x, x, x, lens, sm_scale=D**-0.5, sub=256,
                vmem_limit=l)[0])(lim)
            t = device_loop_time(fn, (q,), iters=20)
            print(f"subrow 256/{lim//MB}M N=8192 full: {t*1e3:7.3f} ms  "
                  f"{flops/t/1e12:6.1f} TF-useful")
        except Exception as e:  # noqa: BLE001
            print(f"subrow 256/{lim//MB}M N=8192: FAILED "
                  f"{type(e).__name__} {str(e)[:100]}")

# -- dense fwd @2K: sub x vmem-limit -----------------------------------------
if run("fwd2k"):
    print("== r5 dense fwd @2K (bf16 B4 H8 D128), where-mask subrow ==")
    N = 2048
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, N, D), jnp.bfloat16)
    flops = causal_flops(N)
    for sub in (128, 256, 512):
        for lim in (None, 8 * MB, 10 * MB, 12 * MB, 16 * MB, 24 * MB):
            label = f"sub={sub:3d} lim={'def' if lim is None else str(lim//MB)+'M'}"
            try:
                fn = (lambda s, l: lambda x: fa._flash_fwd_subrow(
                    x, x, x, sm_scale=D**-0.5, sub=s, concat_mask=False,
                    vmem_limit=l)[0])(sub, lim)
                t = device_loop_time(fn, (q,), iters=30)
                print(f"{label} N=2048: {t*1e3:7.3f} ms  "
                      f"{flops/t/1e12:6.1f} TF-useful")
            except Exception as e:  # noqa: BLE001
                print(f"{label} N=2048: FAILED {type(e).__name__} "
                      f"{str(e)[:110]}")

# -- small head dims: padded-128 tier vs unpadded grid -----------------------
if run("padsmall"):
    print("== r5 small-d fwd (bf16 B4 H8): grid(d) vs pad128->champion ==")
    print("   useful TF accounts the ORIGINAL d")
    for d in (16, 32, 64):
        for N in (2048, 4096):
            q = jax.random.normal(jax.random.PRNGKey(0), (B, H, N, d),
                                  jnp.bfloat16)
            flops = 4 * B * H * N * N * d * 0.5
            rows = [
                (f"grid d={d}", lambda x: fa._flash_fwd(
                    x, x, x, causal=True, sm_scale=d**-0.5,
                    block_q=min(N, 1024), block_k=min(N, 1024))[0]),
                # auto routes d<128 through the in-dispatch pad128 tier
                # (includes the pad/slice overhead end-to-end); d=16 is
                # outside the gate and times the would-be padded path
                (f"pad128 d={d}", (lambda dd: lambda x: fa.flash_attention(
                    jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 128 - dd))),
                    jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 128 - dd))),
                    jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 128 - dd))),
                    True, dd**-0.5)[..., :dd])(d)),
                (f"auto   d={d}", lambda x: fa.flash_attention(
                    x, x, x, True)),
            ]
            for label, fn in rows:
                try:
                    t = device_loop_time(fn, (q,), iters=30)
                    print(f"{label:12s} N={N}: {t*1e3:7.3f} ms  "
                          f"{flops/t/1e12:6.1f} TF-useful")
                except Exception as e:  # noqa: BLE001
                    print(f"{label:12s} N={N}: FAILED {type(e).__name__} "
                          f"{str(e)[:110]}")
    # grad interval at the reference flagship-adjacent shape
    print("-- grad interval d=64 (auto routes pad128+fused subrow bwd) --")
    for N in (2048,):
        d = 64
        q = jax.random.normal(jax.random.PRNGKey(0), (B, H, N, d),
                              jnp.bfloat16)
        dy = jax.random.normal(jax.random.PRNGKey(1), (B, H, N, d),
                               jnp.bfloat16)
        flops = 5 * 2 * B * H * N * N * d * 0.5
        for impl in ("auto", "pallas"):
            def bwd(q_, impl=impl):
                dq, dk, dv = jax.grad(
                    lambda a, b, c: jnp.sum(
                        fa.flash_attention(a, b, c, True, impl=impl)
                        .astype(jnp.float32) * dy.astype(jnp.float32)),
                    argnums=(0, 1, 2))(q_, q_, q_)
                return dq + 1e-12 * (jnp.sum(dk) + jnp.sum(dv))
            t = device_loop_time(bwd, (q,), iters=30)
            print(f"grad d=64 impl={impl:6s} N={N}: {t*1e3:7.3f} ms  "
                  f"{flops/t/1e12:6.1f} TF(bwd-5dot)")

# -- fp8 KV: transcode-to-int8 vs the loop route (VERDICT item 9) ------------
if run("fp8trans"):
    print("== r5 fp8-KV prefill bf16-q B4 H8 D128: loop(fp8) vs "
          "transcode->int8 subrow ==")
    from flashattn_tpu.ops import quant as qz

    for N in (2048, 4096, 8192):
        ks = jax.random.split(jax.random.PRNGKey(N), 3)
        q = jax.random.normal(ks[0], (B, H, N, D), jnp.bfloat16)
        kf = jax.random.normal(ks[1], (B, H, N, D), jnp.float32)
        vf = jax.random.normal(ks[2], (B, H, N, D), jnp.float32)
        # build fp8/int8 pools with per-row scales at the pool layout
        def mk(t, dtype):
            amax = jnp.max(jnp.abs(t), axis=-1, keepdims=True)
            s = jnp.where(amax == 0, 1.0, amax / (448.0 if dtype ==
                                                  jnp.float8_e4m3fn else 127.0))
            if dtype == jnp.float8_e4m3fn:
                vals = (t / s).astype(dtype)
            else:
                vals = jnp.clip(jnp.round(t / s), -127, 127).astype(dtype)
            return qz.QuantizedTensor(vals, s)
        kq8 = mk(kf, jnp.float8_e4m3fn)
        vq8 = mk(vf, jnp.float8_e4m3fn)
        ki8 = mk(kf, jnp.int8)
        vi8 = mk(vf, jnp.int8)
        flops = causal_flops(N)
        sub, lim = fa._subrow_params(N)
        if N > 4096:
            lim = 100 * MB   # bf16-tuned 64MB fails Mosaic for this kernel
        # thread the PAYLOAD as the scan carry: with constant pools XLA
        # hoists the transcode out of the timing chain and the row reads
        # above the roofline (the r4 DCE lesson, hoisting flavour) — in a
        # real prefill the transcode runs once per call.
        # each fn returns o cast to the payload dtype so the carry keeps
        # its shape+dtype (the helper then threads it directly)
        rows = [
            ("fp8 dispatch (loop)", lambda kv: qz.flash_attention_kv_int8(
                q, qz.QuantizedTensor(kv, kq8.scales),
                qz.QuantizedTensor(kv, vq8.scales), True)[0]
                .astype(kq8.values.dtype)),
            ("fp8 transcode->int8 subrow",
             lambda kv: qz._kv8_flash_subrow(
                 q,
                 qz.requantize_fp8_to_int8(
                     qz.QuantizedTensor(kv, kq8.scales)),
                 qz.requantize_fp8_to_int8(
                     qz.QuantizedTensor(kv, vq8.scales)),
                 sm_scale=D**-0.5, sub=sub, vmem_limit=lim)[0]
                 .astype(kq8.values.dtype)),
            ("int8 subrow (ceiling)", lambda kv8: qz._kv8_flash_subrow(
                q, qz.QuantizedTensor(kv8, ki8.scales),
                qz.QuantizedTensor(kv8, vi8.scales),
                sm_scale=D**-0.5, sub=sub, vmem_limit=lim)[0]
                .astype(jnp.int8)),
        ]
        carries = [kq8.values, kq8.values, ki8.values]
        for (label, fn), carry in zip(rows, carries):
            try:
                t = device_loop_time(fn, (carry,), iters=30)
                print(f"{label:28s} N={N}: {t*1e3:7.3f} ms  "
                      f"{flops/t/1e12:6.1f} TF-useful")
            except Exception as e:  # noqa: BLE001
                print(f"{label:28s} N={N}: FAILED {type(e).__name__} "
                      f"{str(e)[:110]}")

# -- 16K two-level schedule vs the loop kernel -------------------------------
if run("twolevel"):
    print("== r5 two-level fwd @16K (bf16 B1 H8 D128) vs loop ==")
    N = 16384
    q = jax.random.normal(jax.random.PRNGKey(0), (1, H, N, D), jnp.bfloat16)
    flops = 4 * 1 * H * N * N * D * 0.5
    t = device_loop_time(lambda x: fa._flash_fwd_loop(
        x, x, x, sm_scale=D**-0.5, block_q=1024)[0], (q,), iters=20)
    print(f"loop bq1024        N=16K: {t*1e3:7.3f} ms  "
          f"{flops/t/1e12:6.1f} TF-useful")
    for panel in (2048, 4096):
        for sub in (256, 512):
            for lim in (None, 32 * MB, 48 * MB, 64 * MB):
                label = (f"2lvl p{panel} s{sub} "
                         f"lim={'def' if lim is None else str(lim//MB)+'M'}")
                try:
                    fn = (lambda p_, s_, l_: lambda x: fa._flash_fwd_twolevel(
                        x, x, x, sm_scale=D**-0.5, panel=p_, sub=s_,
                        vmem_limit=l_)[0])(panel, sub, lim)
                    t = device_loop_time(fn, (q,), iters=20)
                    print(f"{label:28s} N=16K: {t*1e3:7.3f} ms  "
                          f"{flops/t/1e12:6.1f} TF-useful")
                except Exception as e:  # noqa: BLE001
                    print(f"{label:28s} N=16K: FAILED {type(e).__name__} "
                          f"{str(e)[:100]}")

# -- int8 weight-only matmul: block tuning at the decode shape ---------------
if run("int8wo"):
    print("== r5 int8-wo matmul blocks (rows x 2048 @ 2048x8192 bf16-x) ==")
    from flashattn_tpu.ops import quant as qz

    E_, M_ = 2048, 8192
    w = jax.random.normal(jax.random.PRNGKey(0), (E_, M_), jnp.bfloat16)
    wq = qz.quantize_int8(w, axis=0)
    for rows in (8, 2048):
        x = jax.random.normal(jax.random.PRNGKey(1), (rows, E_),
                              jnp.bfloat16)
        fl = 2 * rows * E_ * M_
        byt = E_ * M_  # int8 weight bytes dominate at small rows
        t = device_loop_time(
            lambda a: jnp.dot(a, w, preferred_element_type=jnp.float32),
            (x,), iters=20)
        print(f"rows={rows:5d} bf16 XLA        : {t*1e6:8.1f}us "
              f"({fl/t/1e12:6.1f} TF, {2*byt/t/1e9:5.0f} GB/s)")
        for bk in (512, 1024, 2048):
            for bn in (256, 512, 1024):
                try:
                    fn = (lambda bk_, bn_: lambda a: qz.int8_weight_only_matmul(
                        a, wq, block_n=bn_, block_k=bk_))(bk, bn)
                    t = device_loop_time(fn, (x,), iters=20)
                    print(f"rows={rows:5d} int8-wo k{bk} n{bn}: "
                          f"{t*1e6:8.1f}us ({fl/t/1e12:6.1f} TF, "
                          f"{byt/t/1e9:5.0f} GB/s)")
                except Exception as e:  # noqa: BLE001
                    print(f"rows={rows:5d} int8-wo k{bk} n{bn}: FAILED "
                          f"{type(e).__name__} {str(e)[:80]}")

# -- dense fwd @8K: limit/sub hunt -------------------------------------------
if run("fwd8k"):
    print("== r5 dense fwd @8K (bf16 B4 H8 D128), where-mask subrow ==")
    N = 8192
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, N, D), jnp.bfloat16)
    flops = causal_flops(N)
    for sub in (128, 256, 512):
        for lim in (56 * MB, 64 * MB, 72 * MB, 80 * MB):
            label = f"sub={sub:3d} lim={lim//MB}M"
            try:
                fn = (lambda s, l: lambda x: fa._flash_fwd_subrow(
                    x, x, x, sm_scale=D**-0.5, sub=s, concat_mask=False,
                    vmem_limit=l)[0])(sub, lim)
                t = device_loop_time(fn, (q,), iters=30)
                print(f"{label} N=8192: {t*1e3:7.3f} ms  "
                      f"{flops/t/1e12:6.1f} TF-useful")
            except Exception as e:  # noqa: BLE001
                print(f"{label} N=8192: FAILED {type(e).__name__} "
                      f"{str(e)[:110]}")

# -- varlen subrow: prefetch vs SMEM lens (the ~19% gap hypothesis) ----------
if run("varlensmem"):
    print("== r5 varlen subrow lens transport: prefetch vs SMEM ==")
    for N in (2048, 4096):
        sub, lim = fa._subrow_params(N)
        lens = jnp.asarray([N] * B, jnp.int32)
        ks = jax.random.split(jax.random.PRNGKey(N), 3)
        q = jax.random.normal(ks[0], (B, H, N, D), jnp.bfloat16)
        flops = varlen_flops([N] * B, N)
        for pf in (True, False):
            label = f"{'prefetch' if pf else 'smem    '} sub={sub}"
            try:
                fn = (lambda p: lambda x: fa._flash_fwd_subrow_varlen(
                    x, x, x, lens, sm_scale=D**-0.5, sub=sub,
                    vmem_limit=lim, prefetch=p)[0])(pf)
                t = device_loop_time(fn, (q,), iters=30)
                print(f"{label} N={N}: {t*1e3:7.3f} ms  "
                      f"{flops/t/1e12:6.1f} TF-useful")
            except Exception as e:  # noqa: BLE001
                print(f"{label} N={N}: FAILED {type(e).__name__} "
                      f"{str(e)[:100]}")
        # dense reference point in the same log
        fn = lambda x: fa._flash_fwd_subrow(
            x, x, x, sm_scale=D**-0.5, sub=sub, concat_mask=False,
            vmem_limit=lim)[0]
        t = device_loop_time(fn, (q,), iters=30)
        print(f"dense subrow     N={N}: {t*1e3:7.3f} ms  "
              f"{flops/t/1e12:6.1f} TF-useful")

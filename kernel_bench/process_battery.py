"""Summarise run_battery.sh logs into the PERF.md-facing numbers.

Run after the battery completes (logs in /tmp/battery or
kernel_bench/battery_logs):

    python kernel_bench/process_battery.py [logdir]

Extracts, per log, the lines that drive round-2 decisions: the causal
block/strip sweep winners (flip DEFAULT_DIAG_SUBTILE / bench.py candidates
if a strip config wins), int8-vs-bf16 prefill ratios, GQA backward TFLOP/s,
paged-decode microseconds, fused-dropout speedups, serving/speculative
tok/s + acceptance, and the headline JSON.  Pure stdlib, no jax import
(safe to run anywhere).
"""

import os
import re
import sys

PICK = {
    "compile_smoke": [r"^FAIL", r"^WARN", r"ALL OK|FAILURES PRESENT"],
    "r3_measure": [r"BEST", r"max err", r"SECTION .* FAILED"],
    "int8_paged": [r"int8/bf16", r"hist=", r"SECTION .* FAILED"],
    "fused_dropout": [r"speedup|pallas|xla", r"FAIL"],
    "train_precision": [r"tok/s|TFLOP|step|bf16|f32"],
    "serving": [r"tok/s"],
    "speculative": [r"tok/s|SPEEDUP|acceptance|identical"],
    "sweep_reference": [r"wrote \d+ rows"],
    "bench_headline": [r"\{"],
}


def main(logdir=None):
    here = os.path.dirname(os.path.abspath(__file__))
    candidates = [logdir, "/tmp/battery", os.path.join(here, "battery_logs")]
    logdir = next((d for d in candidates if d and os.path.isdir(d)), None)
    if logdir is None:
        print("no battery logs found"); return 1
    print(f"== battery logs in {logdir}\n")
    for name, pats in PICK.items():
        path = os.path.join(logdir, f"{name}.log")
        if not os.path.exists(path):
            print(f"-- {name}: (missing)")
            continue
        rex = re.compile("|".join(pats))
        lines = [l.rstrip() for l in open(path, errors="replace")
                 if rex.search(l)]
        print(f"-- {name} ({len(lines)} key lines)")
        for l in lines:
            print(f"   {l}")
        print()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else None))

"""Serialized kernel-variant A/B driver for the round-3 perf push.

Runs `python bench.py` once per env-flag variant, strictly serially (two
concurrent TPU jobs through the tunnel make every measurement garbage —
CLAUDE.md), and prints a ranked table. Each variant is a different HLO
program so the persistent compile cache keys them independently; the first
run of a new variant pays its compile (~1-3 min over the tunnel).

Usage: python scripts/ab_bench.py [--only NAME ...] [--timeout S]
"""

import argparse
import json
import os
import subprocess
import sys
import time

# Ordered most-promising-first (the tunnel can die mid-sweep; partial
# results should cover the best candidates). Rationale per BASELINE.md
# "Segmented-grid occupancy" + the MXU pass model in kernels.py.
VARIANTS = [
    # name, env overrides (on top of the current tree's defaults)
    ("base", {}),
    # triangular-contraction precision: (DEFAULT, HIGHEST) halves the MXU
    # passes (the 0/1 operand is exact in one bf16 pass)
    ("tri_mixed", {"EGS_TRI_PREC": "mixed"}),
    # data-operand matmuls (fwd color accumulation, bwd dcolor) at HIGH:
    # 3 systolic passes instead of 6 (drops only the lo*lo term)
    ("dot_high", {"EGS_DOT_PREC": "high"}),
    ("tri_dot", {"EGS_TRI_PREC": "mixed", "EGS_DOT_PREC": "high"}),
    # smaller sub-chunks: 65% -> 88% occupancy, two fewer scan rounds
    # (VPU-scan path; tri matmuls below 64 underfill the systolic array)
    ("sub32_tri_dot", {"EGS_SUB": "32", "EGS_TRI_PREC": "mixed",
                       "EGS_DOT_PREC": "high"}),
    ("sub32", {"EGS_SUB": "32"}),
    # fused Pallas preprocess (stages 1-5 + table build in ONE kernel each
    # way — attacks the 3-5 ms XLA-op-overhead attribution row)
    ("fused", {"EGS_FUSED_PRE": "1"}),
    # larger chunk: fewer chunk-crossing grid steps (Q = M/k + n_tiles);
    # per-grid-step fixed cost is a prime suspect for the kernels' gap to
    # their VPU bound (BASELINE.md)
    ("kchunk1024", {"EGS_KCHUNK": "1024"}),
    ("kchunk1024_sub64", {"EGS_KCHUNK": "1024", "EGS_SUB": "64"}),
    ("sub64", {"EGS_SUB": "64"}),
    ("logscan_tri_mixed", {"EGS_LOG_SCAN": "1", "EGS_LOG_SCAN_FWD": "1",
                           "EGS_TRI_PREC": "mixed"}),
    ("logscan_bwd", {"EGS_LOG_SCAN": "1"}),
    ("logscan_both", {"EGS_LOG_SCAN": "1", "EGS_LOG_SCAN_FWD": "1"}),
    ("grad_perm", {"EGS_GRAD_PERM": "1"}),
    ("logscan_both_sub64", {"EGS_LOG_SCAN": "1", "EGS_LOG_SCAN_FWD": "1",
                            "EGS_SUB": "64"}),
    ("all", {"EGS_LOG_SCAN": "1", "EGS_LOG_SCAN_FWD": "1", "EGS_SUB": "64",
             "EGS_GRAD_PERM": "1"}),
    ("all_tri", {"EGS_LOG_SCAN": "1", "EGS_LOG_SCAN_FWD": "1", "EGS_SUB": "64",
                 "EGS_GRAD_PERM": "1", "EGS_TRI_PREC": "mixed"}),
    ("all_tri_fused", {"EGS_LOG_SCAN": "1", "EGS_LOG_SCAN_FWD": "1",
                       "EGS_SUB": "64", "EGS_GRAD_PERM": "1",
                       "EGS_TRI_PREC": "mixed", "EGS_FUSED_PRE": "1"}),
    # tighter static patch budget (1.25x headroom rung vs the default
    # 1.5x): the tile sort, sort-reduce and scan chains are latency-bound
    # on the BUDGET size, not the true 549k patches; nothing drops at
    # >= 549k so images/grads are identical. A win here flips the
    # trainer's budget_headroom default (the mid-epoch overflow reaction
    # makes the tighter rung safe).
    ("budget125", {"EGS_MAX_PATCHES": "688128"}),
    ("all_tri_fused_budget", {"EGS_LOG_SCAN": "1", "EGS_LOG_SCAN_FWD": "1",
                              "EGS_SUB": "64", "EGS_GRAD_PERM": "1",
                              "EGS_TRI_PREC": "mixed", "EGS_FUSED_PRE": "1",
                              "EGS_MAX_PATCHES": "688128"}),
]


def run_variant(name, env_over, timeout_s):
    env = dict(os.environ)
    env.update(env_over)
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "bench.py"], capture_output=True, text=True,
            env=env, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return {"name": name, "error": f"timeout after {timeout_s}s"}
    wall = time.time() - t0
    line = None
    for ln in reversed(proc.stdout.strip().splitlines()):
        if ln.startswith("{"):
            line = ln
            break
    if proc.returncode != 0 or line is None:
        tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-5:]
        return {"name": name, "error": f"rc={proc.returncode}", "tail": tail}
    rec = json.loads(line)
    rec["name"] = name
    rec["wall_s"] = round(wall, 1)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", help="subset of variant names")
    ap.add_argument("--timeout", type=int, default=3600,
                    help="per-variant wall timeout (first compile is slow)")
    args = ap.parse_args()

    results = []
    for name, env_over in VARIANTS:
        if args.only and name not in args.only:
            continue
        print(f"== {name} {env_over} ...", flush=True)
        rec = run_variant(name, env_over, args.timeout)
        results.append(rec)
        print(json.dumps(rec), flush=True)

    ok = [r for r in results if "value" in r]
    ok.sort(key=lambda r: -r["value"])
    print("\n== ranked ==")
    for r in ok:
        print(f"{r['name']:22s} {r['value']:7.2f} Mpix/s  "
              f"fwd {r.get('fwd_throughput', 0):7.2f}  ({r['wall_s']}s)")
    for r in results:
        if "error" in r:
            print(f"{r['name']:22s} ERROR {r['error']} {r.get('tail', '')}")


if __name__ == "__main__":
    main()

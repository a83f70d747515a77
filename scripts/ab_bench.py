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
    # NOTE (r3 on-chip result): the precision variants (EGS_TRI_PREC=mixed,
    # EGS_DOT_PREC=high) are DEAD on this backend — Mosaic's dot lowering
    # supports only DEFAULT/HIGHEST and rejects per-operand tuples
    # (mosaic/lowering.py:2244-2254), so kernels.py pins both knobs to
    # HIGHEST (with a warning) and the variants were removed from the list.
    # smaller sub-chunks: 65% -> 88% occupancy, two fewer scan rounds
    # (VPU-scan path). r3 on-chip: 12.96 vs 13.31 base — per-block fixed
    # cost dominates; REJECTED.
    ("sub32", {"EGS_SUB": "32"}),
    # fused Pallas preprocess (stages 1-5 + table build in ONE kernel each
    # way — attacks the 3-5 ms XLA-op-overhead attribution row).
    # r3 on-chip: 13.26 vs 13.31 base — a wash; stays opt-in.
    ("fused", {"EGS_FUSED_PRE": "1"}),
    # larger chunk: fewer chunk-crossing grid steps (Q = M/k + n_tiles).
    # r3 on-chip: 13.50 at the 688k budget vs budget125's 13.53 — neutral;
    # k_chunk stays 512.
    ("kchunk1024", {"EGS_KCHUNK": "1024"}),
    ("kchunk1024_sub64", {"EGS_KCHUNK": "1024", "EGS_SUB": "64"}),
    ("sub64", {"EGS_SUB": "64"}),
    ("logscan_bwd", {"EGS_LOG_SCAN": "1"}),
    # r3 on-chip: 13.34 at the 688k budget vs budget125's 13.53 — the MXU
    # log-space scans lose to the VPU sublane scans; REJECTED as default.
    ("logscan_both", {"EGS_LOG_SCAN": "1", "EGS_LOG_SCAN_FWD": "1"}),
    ("grad_perm", {"EGS_GRAD_PERM": "1"}),
    ("logscan_both_sub64", {"EGS_LOG_SCAN": "1", "EGS_LOG_SCAN_FWD": "1",
                            "EGS_SUB": "64"}),
    ("all", {"EGS_LOG_SCAN": "1", "EGS_LOG_SCAN_FWD": "1", "EGS_SUB": "64",
             "EGS_GRAD_PERM": "1"}),
    # tighter static patch budget: the tile sort, sort-reduce and scan
    # chains are latency-bound on the BUDGET size, not the true 549k
    # patches; nothing drops at >= 549k so images/grads are identical.
    # r3 on-chip WINNER: 13.53 vs 13.31 at the old 786432 budget — now the
    # bench.py default (688128) and budget_headroom default (1.25).
    ("budget125", {"EGS_MAX_PATCHES": "688128"}),
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

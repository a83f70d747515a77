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
# r3 on-chip results already landed (partial sweep before the tunnel died):
#   base@786432 budget = 13.31; budget 688128 = 13.53 WINNER -> now the
#   bench.py default; sub32 = 12.96 REJECTED (per-block fixed cost
#   dominates the 88% occupancy win); fused = 13.26 wash (stays opt-in,
#   fwd-only effect re-probed below); kchunk1024 = 13.50 neutral;
#   logscan_both = 13.34 REJECTED (MXU log-space scans lose to the VPU
#   sublane scans). The precision variants (EGS_TRI_PREC=mixed,
#   EGS_DOT_PREC=high) are DEAD on this backend — Mosaic's dot lowering
#   supports only DEFAULT/HIGHEST (mosaic/lowering.py:2244-2254); kernels.py
#   pins both knobs to HIGHEST.
VARIANTS = [
    # name, env overrides (on top of the current tree's defaults, which are
    # the r3 winners: budget 688128, SUB=128, VPU scans, k_chunk 512)
    ("base", {}),
    ("sub64", {"EGS_SUB": "64"}),
    ("logscan_bwd", {"EGS_LOG_SCAN": "1"}),
    # tighter budget rungs: every latency-bound stage (tile sort,
    # sort-reduce, scan chains) scales with the STATIC budget; nothing
    # drops at >= the scene's true patch count (bench.py refuses to
    # measure a truncating budget, so an over-tight rung errors out
    # instead of lying).
    ("budget655360", {"EGS_MAX_PATCHES": "655360"}),
    ("budget589824", {"EGS_MAX_PATCHES": "589824"}),
    # the pair the TRAINER ladder actually visits at 1.25x headroom on a
    # 549k scene: 786432 (r3: 13.31) vs the old 1048576 default — measures
    # what the config.py budget_headroom change was worth end-to-end.
    ("budget1048576", {"EGS_MAX_PATCHES": "1048576"}),
    ("grad_perm", {"EGS_GRAD_PERM": "1"}),
    ("kchunk1024_sub64", {"EGS_KCHUNK": "1024", "EGS_SUB": "64"}),
    # fused preprocess re-probe: fwd+bwd was a wash, but the per-variant
    # fwd_throughput field decides whether it defaults on for
    # need_grads=False renders (viewer/eval path, VERDICT item 5).
    ("fused", {"EGS_FUSED_PRE": "1"}),
    ("logscan_both_sub64", {"EGS_LOG_SCAN": "1", "EGS_LOG_SCAN_FWD": "1",
                            "EGS_SUB": "64"}),
    ("all", {"EGS_LOG_SCAN": "1", "EGS_LOG_SCAN_FWD": "1", "EGS_SUB": "64",
             "EGS_GRAD_PERM": "1"}),
    # ---- phase 2: winner combos (run with --only after the main sweep;
    # r4 mid-sweep standings: sub64 14.26, budget589824 13.94, base 13.63)
    ("sub64_b589824", {"EGS_SUB": "64", "EGS_MAX_PATCHES": "589824"}),
    ("sub64_b589824_k1024", {"EGS_SUB": "64", "EGS_MAX_PATCHES": "589824",
                             "EGS_KCHUNK": "1024"}),
    ("sub64_b573440", {"EGS_SUB": "64", "EGS_MAX_PATCHES": "573440"}),
    ("logscan_sub64_b589824", {"EGS_LOG_SCAN": "1", "EGS_SUB": "64",
                               "EGS_MAX_PATCHES": "589824"}),
    # grad_perm stacked on the leaders (r4 main sweep: sub64 14.26,
    # kchunk1024_sub64 14.08, budget589824 13.94, grad_perm 13.79)
    ("sub64_gp_b589824", {"EGS_SUB": "64", "EGS_GRAD_PERM": "1",
                          "EGS_MAX_PATCHES": "589824"}),
    ("sub64_gp", {"EGS_SUB": "64", "EGS_GRAD_PERM": "1"}),
    # the Pallas counting sort (ops/pallas/radix.py) vs the XLA radix
    # sort_key_val it replaces — alone and under the leading combo
    ("radix", {"EGS_RADIX_SORT": "1"}),
    ("radix_sub64_gp_b589824", {"EGS_RADIX_SORT": "1", "EGS_SUB": "64",
                                "EGS_GRAD_PERM": "1",
                                "EGS_MAX_PATCHES": "589824"}),
    # counting-sort gradient reduction (3 LSD passes by gsid digits)
    # instead of the full bitonic perm sort
    ("radixred_sub64_b589824", {"EGS_RADIX_REDUCE": "1", "EGS_SUB": "64",
                                "EGS_MAX_PATCHES": "589824"}),
    # ---- phase 3: final landing probes (phase-2 leaders: logscan_sub64_
    # b589824 14.73, sub64_gp_b589824 14.63, sub64_b573440 14.59)
    ("ls_gp_sub64_b589824", {"EGS_LOG_SCAN": "1", "EGS_GRAD_PERM": "1",
                             "EGS_SUB": "64", "EGS_MAX_PATCHES": "589824"}),
    ("ls_sub64_b573440", {"EGS_LOG_SCAN": "1", "EGS_SUB": "64",
                          "EGS_MAX_PATCHES": "573440"}),
    ("ls_gp_sub64_b573440", {"EGS_LOG_SCAN": "1", "EGS_GRAD_PERM": "1",
                             "EGS_SUB": "64", "EGS_MAX_PATCHES": "573440"}),
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

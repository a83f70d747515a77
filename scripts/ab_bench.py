"""Serialized kernel-variant A/B driver for the per-round perf sweeps.

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

# r4 RESULTS (all landed, BASELINE.md "Measured (round 4)"): the three-phase
# sweep stacked sub64 (14.26) + tight budget (589824: +0.3) + log-scan bwd
# (+0.17..0.29, SUB=64 only) + grad_perm (+0.24..0.29) to the winner
# ls_gp_sub64_b573440 = 14.97 Mpix/s, now the tree's DEFAULTS (kernels.py
# LOG_SCAN/SUB, rasterize.py GRAD_PERM, bench.py budget). Rejected and
# DELETED: the forward log scan (13.80/13.91 in every combo). Rejected but
# kept opt-in: fused preprocess (13.70, wash both ways), k_chunk 1024
# (14.42 vs 14.56 at sub64), SUB=32 (12.96, r3). The radix counting-sort
# variants ABORTED on-chip at bench scale (under bisection, radix_probe).
#
# The list below is the standing REGRESSION sweep relative to the landed
# defaults: each row turns one winner OFF (guards against a future change
# silently inverting a measured verdict) or probes a still-open variant.
VARIANTS = [
    # name, env overrides (on top of the tree's defaults = the r5 winners:
    # budgets 557056/229376, SUB=64, log-scan bwd, grad_perm,
    # XLA grad sort, k_chunk 512)
    ("base", {}),
    ("no_logscan", {"EGS_LOG_SCAN": "0"}),
    ("no_gradperm", {"EGS_GRAD_PERM": "0"}),
    ("sub128", {"EGS_SUB": "128"}),
    # never probed at the r5 defaults: SUB=32's 88.3% occupancy + 5 scan
    # rounds lost at r3 (12.96) to per-block fixed cost — the landed
    # log-scan/perm/budget stack may have changed the balance
    ("sub32", {"EGS_SUB": "32"}),
    ("kchunk256", {"EGS_KCHUNK": "256"}),
    ("budget589824", {"EGS_MAX_PATCHES": "589824"}),  # trainer-ladder rung
    ("budget688128", {"EGS_MAX_PATCHES": "688128"}),  # old r3 default
    # r5 WINNERS, now the bench defaults (557056 = 34*16384 patches +
    # 229376 = 14*16384 rows: 15.72 vs 15.32 at the r4 budgets); these
    # regression rows restore the r4 pair
    ("b573_rows262", {"EGS_MAX_PATCHES": "573440", "EGS_MAX_ROWS": "262144"}),
    ("kchunk1024", {"EGS_KCHUNK": "1024"}),
    # fused preprocess is DEFAULT ON for TPU since the r4 A/B (15.19 vs
    # 14.99); this variant measures its removal (the stages chain)
    ("nofused", {"EGS_FUSED_PRE": "0"}),
    # the Pallas counting sort (ops/pallas/radix.py) vs the XLA radix
    # sort_key_val it replaces — aborted on-chip in r4, re-probe after fix
    ("radix", {"EGS_RADIX_SORT": "1"}),
    ("radixred", {"EGS_RADIX_REDUCE": "1"}),
    # XLA sort_key_val in the grad reduce is DEFAULT ON since the r5 A/B
    # (15.26 vs 14.97); this regression row turns it back off
    ("no_xla_grad_sort", {"EGS_XLA_GRAD_SORT": "0"}),
    # ungated sub-chunks probe: REMOVED from the standing sweep — its fully
    # unrolled kernels stalled the tunnel compiler >17 min on-chip (killed;
    # same failure mode as the 80 MB HLO program in CLAUDE.md). The flag
    # stays for off-line use.
    # r5: tile-interleaved segment order — consecutive grid steps carry
    # independent per-tile blend states so the backward's serial tau chain
    # stops stalling the units between steps (kernels.py / segment_layout)
    # EGS_INTERLEAVE: MEASURED NEGATIVE (r5 probe_interleave.py, same
    # session as the 35.2 ms baseline): il2 step 36.3 ms / fwd 18.5 ms —
    # cross-step independence does not help (Mosaic runs grid steps
    # sequentially, no cross-iteration compute overlap) and the per-stream
    # grad writeback adds ~1 ms. NOT in the sweep: the P>1 kernels'
    # dynamic-slot Mosaic compile can stall the tunnel >15 min — re-measure
    # with scripts/probe_interleave.py under its own timeout instead.
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

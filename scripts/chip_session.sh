#!/bin/bash
# Serialized on-chip round-5 session: baseline bench -> variant A/B ->
# gradient gates -> viewer frame rates -> realism-wall oracles -> both
# scene proxies. Every measurement strictly serial (two concurrent TPU jobs
# through the tunnel make all of them garbage — CLAUDE.md).
cd "$(dirname "$0")/.."
exec > "${EGS_SESSION_LOG:-/tmp/chip_session.log}" 2>&1
echo "=== chip session start $(date) ==="
echo "--- base bench ---"
timeout 3000 python bench.py
echo "--- A/B sweep ($(date)) ---"
timeout 7200 python scripts/ab_bench.py --timeout 900 | tee /tmp/ab_results.txt
echo "--- verify_gradients on defaults ($(date)) ---"
timeout 3000 python verify_gradients.py > /tmp/verify_defaults.log 2>&1
echo "verify defaults rc=$? ($(grep -c OK /tmp/verify_defaults.log) OK)"
echo "--- verify_gradients under the A/B winner ($(date)) ---"
best=$(awk '/== ranked ==/{f=1;next} f{print $1; exit}' /tmp/ab_results.txt)
echo "winner: $best"
python - "$best" <<'PY' > /tmp/winner_env.sh
import sys, importlib.util
spec = importlib.util.spec_from_file_location("ab", "scripts/ab_bench.py")
ab = importlib.util.module_from_spec(spec); spec.loader.exec_module(ab)
env = dict(ab.VARIANTS).get(sys.argv[1], {})
print(" ".join(f"{k}={v}" for k, v in env.items()))
PY
wenv=$(cat /tmp/winner_env.sh)
echo "winner env: $wenv"
if [ -n "$wenv" ]; then
  env $wenv timeout 3000 python verify_gradients.py > /tmp/verify_winner.log 2>&1
  echo "verify winner rc=$? ($(grep -c OK /tmp/verify_winner.log) OK)"
else
  echo "winner is base config; defaults gate covers it"
fi
echo "--- viewer frame rates, post device-cache fix (VERDICT r4 #2) ($(date)) ---"
timeout 3000 python scripts/viewer_fps.py
echo "--- realism-wall oracle (a): GT pool PSNR (VERDICT r4 #4) ($(date)) ---"
timeout 3000 python scripts/bench_scene.py --realism --oracle-gt
echo "--- truck-scale proxy, default preset ($(date)) ---"
timeout 3600 python scripts/bench_scene.py > /tmp/bench_scene_r5.log 2>&1
echo "bench_scene rc=$? : $(tail -2 /tmp/bench_scene_r5.log | head -1)"
tail -1 /tmp/bench_scene_r5.log
echo "--- truck-scale proxy, --realism preset ($(date)) ---"
# epoch cap 80: the 25-crossing lands at ~epoch 63 (r5 oracle b);
# the old 60-epoch cap stopped three epochs short of the target
timeout 3600 python scripts/bench_scene.py --realism --epochs 80 > /tmp/bench_scene_r5_realism.log 2>&1
echo "bench_scene --realism rc=$? : $(tail -1 /tmp/bench_scene_r5_realism.log)"
echo "--- realism-wall oracle (b): 2x capacity + 100 epochs ($(date)) ---"
timeout 7200 python scripts/bench_scene.py --realism --cap-factor 10 --epochs 100 \
  > /tmp/bench_scene_r5_oracle_b.log 2>&1
echo "oracle (b) rc=$? : $(tail -1 /tmp/bench_scene_r5_oracle_b.log)"
echo "=== chip session done $(date) ==="
touch /tmp/chip_session_done

#!/bin/bash
# Round-4 on-chip measurement queue (run sequentially — ONE heavy python
# job at a time on this single-core box; timing loops are wall-clock
# sensitive).  Logs land in tools/logs/.
#   1. int8_parity_probe      — int8 vs parity throughput + R@k deltas
#                               (headline adoption evidence, VERDICT #1)
#   2. int8_tail_variants     — attribute the int8 tail kernel's gap
#   3. block_fusion_probe vqa — @480 VL tower: split vs int8 (VERDICT #3)
#   4. train_fusion_probe     — train-forward fusion adopt-or-refute (#4)
#   5. train_pipeline_probe   — input-pipeline-included train step (#7)
set -u
LOG=/root/repo/tools/logs
mkdir -p "$LOG"
cd /root/repo

probe() {
  timeout 120 python - <<'EOF'
import jax
d = jax.devices()
raise SystemExit(0 if d and d[0].platform != "cpu" else 1)
EOF
}

run() {  # run NAME TIMEOUT CMD...
  local name=$1 to=$2; shift 2
  echo "=== $name: $(date -u +%H:%M:%S) ===" | tee -a "$LOG/r4_harvest.log"
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  echo "EXIT:$?" >> "$LOG/$name.log"
  tail -3 "$LOG/$name.log" | tee -a "$LOG/r4_harvest.log"
}

if ! probe; then
  echo "$(date +%s) chip unreachable; aborting" >> "$LOG/r4_harvest.log"
  exit 1
fi

run int8_parity 3000 python tools/int8_parity_probe.py 512
run int8_tail_variants 3000 python tools/int8_tail_variants_probe.py
run vqa480_int8 3000 python tools/block_fusion_probe.py vqa:split,int8
run train_fusion 5400 python tools/train_fusion_probe.py
run train_pipeline 3000 python tools/train_pipeline_probe.py
echo "harvest done $(date -u +%H:%M:%S)" | tee -a "$LOG/r4_harvest.log"

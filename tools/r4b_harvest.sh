#!/bin/bash
# Round-4 second measurement queue (sequential — ONE heavy python job at
# a time on this single-core box).  Logs land in tools/logs/.
#   1. vqa480_scan        — serving-loop scan probe: amortize the ~7.3 ms
#                           dispatch floor over K sub-batches (VERDICT #3)
#   2. train_pipeline_dev — input-pipeline-included train step with
#                           device_augment+device_mlm (VERDICT #7, device
#                           half of the host/device A/B)
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
  echo "=== $name: $(date -u +%H:%M:%S) ===" | tee -a "$LOG/r4b_harvest.log"
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  echo "EXIT:$?" >> "$LOG/$name.log"
  tail -4 "$LOG/$name.log" | tee -a "$LOG/r4b_harvest.log"
}

if ! probe; then
  echo "$(date +%s) chip unreachable; aborting" >> "$LOG/r4b_harvest.log"
  exit 1
fi

run vqa480_scan 3600 python tools/vqa480_scan_probe.py split,int8
run train_pipeline_dev 3600 python tools/train_pipeline_probe.py 256 8 device
echo "harvest done $(date -u +%H:%M:%S)" | tee -a "$LOG/r4b_harvest.log"

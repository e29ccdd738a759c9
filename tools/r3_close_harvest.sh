#!/bin/bash
# Round-3 close: on-chip measurements pending the axon tunnel outage.
# Run (or let /tmp/tunnel_watch.sh auto-run) when the chip is reachable.
#   1. proj_mlp_probe parity  — the fused whole-tail kernel vs split pair
#   2. proj_mlp_probe tower   — @384 image-tower delta vs the 1190 img/s
#                               split-pair baseline
#   3. bench.py ×2            — driver-style headline smoke (the eval graph
#                               changed; must compile clean before round end)
set -u
OUT=${1:-/tmp/r3_harvest}
mkdir -p "$OUT"
cd /root/repo

probe() {
  timeout 120 python - <<'EOF'
import jax
d = jax.devices()
raise SystemExit(0 if d and d[0].platform != "cpu" else 1)
EOF
}

echo "$(date +%s) harvest start" >> "$OUT/harvest.log"
if ! probe; then
  echo "$(date +%s) chip unreachable; aborting" >> "$OUT/harvest.log"
  exit 1
fi

run() {  # run <name> <cmd...>  (bench autotunes 4 variants => up to ~1h)
  local name=$1; shift
  echo "$(date +%s) BEGIN $name" >> "$OUT/harvest.log"
  timeout 3600 "$@" > "$OUT/$name.log" 2>&1
  echo "$(date +%s) END $name exit=$?" >> "$OUT/harvest.log"
}

run proj_mlp_parity python tools/proj_mlp_probe.py parity
run block_fusion    python tools/block_fusion_probe.py
run mega_bb8        env VLM_TPU_EVAL_BLOCK_BB=8 \
                    python tools/block_fusion_probe.py tower:mega
run vqa480          python tools/block_fusion_probe.py vqa
run bench1          python bench.py
run bench2          python bench.py
echo "$(date +%s) harvest done" >> "$OUT/harvest.log"

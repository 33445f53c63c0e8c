#!/bin/bash
# One-command sequence for the moment the axon tunnel relay returns.
# Runs the chip-gated round-4 items IN ORDER (python runs must never overlap
# on this machine — the tunnel is exclusive), logging to probes/logs/.
#
#   bash probes/chip_day.sh
#
# 1. pair_matmul_mfu   — diagnose the npair=1296 MFU cliff (VERDICT r3 #2)
# 2. fe4s4_class       — (54e,36o) 1e7-det dense-DF solve wall-clock (#3)
# 3. bench.py          — re-warm .jax_cache_tpu so the driver's capture
#                        cache-hits (#1; sections added after the last warm
#                        compile here, not at capture time)
set -u
cd "$(dirname "$0")/.."
mkdir -p probes/logs

if [ "$(ss -tln | grep -cE ':81[0-9][0-9]')" -eq 0 ]; then
  echo "relay DOWN (no 81xx listener) — aborting" >&2
  exit 3
fi

run() {
  name=$1; shift
  echo "=== $name: $(date -u +%H:%M:%S) ==="
  timeout "$@" >"probes/logs/$name.log" 2>&1
  rc=$?
  echo "--- $name rc=$rc; tail:"
  tail -5 "probes/logs/$name.log"
  return 0
}

run mfu    2400 python probes/pair_matmul_mfu.py
run fe4s4  4200 python probes/fe4s4_class.py
run bench  5700 python bench.py
echo "=== done $(date -u +%H:%M:%S); bench JSON: ==="
grep -h '"metric"' probes/logs/bench.log | tail -1

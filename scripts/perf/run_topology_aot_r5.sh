#!/bin/bash
# Round-5 TPU-topology AOT sweep (VERDICT r4 item 1): real TPU compiler
# buffer assignment for the flagship train configs post-chunked-CE, plus the
# 34B serve meshes. Each config runs in its own python process so a failure
# (RESOURCE_EXHAUSTED prints + nonzero exit) doesn't stop the sweep.
# Results append DIRECTLY to docs/production_compile_r5.jsonl (durable —
# the r5 /tmp rows were lost to a reboot); commit after each batch.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export PRODUCTION_COMPILE_TOPOLOGY=${PRODUCTION_COMPILE_TOPOLOGY:-v5e:2x4}
export PRODUCTION_COMPILE_RESULTS=${PRODUCTION_COMPILE_RESULTS:-/root/repo/docs/production_compile_r5.jsonl}
LOG=${LOG:-/tmp/topology_aot_r5.log}
for cfg in "$@"; do
  echo "=== $(date -u +%H:%M:%S) start $cfg ===" | tee -a "$LOG"
  timeout 5400 python tests/test_production_compile.py "$cfg" \
    >> "$LOG" 2>&1
  rc=$?  # capture BEFORE any $(...) in the echo resets it
  echo "=== $(date -u +%H:%M:%S) done $cfg rc=$rc ===" | tee -a "$LOG"
done
echo "=== sweep complete ===" | tee -a "$LOG"

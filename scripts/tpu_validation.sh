#!/bin/bash
# Run the full TPU validation ladder; designed to be launched by the relay
# watcher the moment the chip is reachable.  Results land in
# /root/repo/TPU_VALIDATION.log (append-only, timestamped).
LOG=/root/repo/TPU_VALIDATION.log
cd /root/repo
echo "=== TPU validation run $(date -u) ===" >> "$LOG"
run() {
  echo "--- $* ($(date -u +%H:%M:%S)) ---" >> "$LOG"
  timeout 1200 "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}
run python scripts/test_window_kernel_tpu.py perf
run python bench.py
run python scripts/bench_stages.py
run python scripts/bench_micro.py
run python scripts/bench_bank.py 10000 30
# A/B: host pair-gen vs on-device pair-gen, and kernel v2 vs v3.
run env OPENFDCM_TPU_DEVPAIRS=0 python bench.py
run env OPENFDCM_TPU_KERNEL_VERSION=2 python bench.py
echo "=== done $(date -u) ===" >> "$LOG"

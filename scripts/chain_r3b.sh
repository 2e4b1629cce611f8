#!/bin/bash
# Post-chain cleanup stage: waits for chain_r3.sh (pid $1), then re-runs
# the perf A/B with EXCLUSIVE chip ownership — the first bench_variants
# pass was contaminated by a concurrent monaco client from a stale
# session chain (killed since). ONE TPU client at a time.
set -u
cd /root/repo
LOG=results/chain_r3.log
say() { echo "[chain-b $(date +%H:%M:%S)] $*" >> "$LOG"; }
say "waiting for chain pid $1"
while kill -0 "$1" 2>/dev/null; do sleep 20; done
say "stage bench_variants CLEAN rerun"
timeout 3600 python scripts/bench_variants.py \
    --out results/bench_variants_r3_clean.jsonl >> "$LOG" 2>&1
say "bench_variants clean exit $?"
say "chain-b complete"

#!/bin/bash
# Round-3 TPU evidence chain: serializes the remaining runs behind the live
# grid family sweep (ONE TPU client at a time — CLAUDE.md axon rules).
# Usage: scripts/chain_r3.sh <pid-of-running-grid-sweep>
set -u
cd /root/repo
LOG=results/chain_r3.log
say() { echo "[chain $(date +%H:%M:%S)] $*" >> "$LOG"; }

say "waiting for grid sweep pid $1"
while kill -0 "$1" 2>/dev/null; do sleep 20; done
say "grid sweep done"

say "stage bench_variants (f32/bf16 x xla/pallas at B=512)"
timeout 3600 python scripts/bench_variants.py \
    --out results/bench_variants_r3.jsonl >> "$LOG" 2>&1
say "bench_variants exit $?"

say "stage monaco families (ia2c, ma2c_nc x 3 seeds x 150M)"
timeout 9000 python scripts/train_atsc_families.py --scenario monaco \
    --agents ia2c,ma2c_nc --steps 150000000 --seeds 0,1,2 \
    --out results/monaco_families_r3.jsonl >> "$LOG" 2>&1
say "monaco exit $?"

say "stage cacc slowdown families (6 x 3 seeds x 10M)"
timeout 9000 python scripts/train_cacc_families.py --scenario cacc_slowdown \
    --steps 10000000 --seeds 0,1,2 \
    --out results/cacc_slowdown_r3.jsonl >> "$LOG" 2>&1
say "cacc slowdown exit $?"

say "stage cacc catchup parity (ia2c, ma2c_nc x 3 seeds x 10M)"
timeout 5400 python scripts/train_cacc_families.py --scenario cacc_catchup \
    --agents ia2c,ma2c_nc --steps 10000000 --seeds 0,1,2 \
    --out results/cacc_catchup_r3.jsonl >> "$LOG" 2>&1
say "cacc catchup exit $?"

say "stage neighbor_obs A/B arm ON (100M, seed 0, r3 recipe)"
timeout 3600 python scripts/train_atsc.py --agent ma2c_nc --scenario grid \
    --steps 100000000 --seeds 0 --phase-in-obs --queue-in-obs \
    --kickstart 1.0 --neighbor-obs \
    --out results/grid_ma2c_nc_nbrobs_on.jsonl >> "$LOG" 2>&1
say "nbrobs on exit $?"
say "stage neighbor_obs A/B arm OFF"
timeout 3600 python scripts/train_atsc.py --agent ma2c_nc --scenario grid \
    --steps 100000000 --seeds 0 --phase-in-obs --queue-in-obs \
    --kickstart 1.0 \
    --out results/grid_ma2c_nc_nbrobs_off.jsonl >> "$LOG" 2>&1
say "nbrobs off exit $?"

say "stage cli-vs-bench (main.py train, B=512, 40M steps)"
rm -rf /tmp/cli_b512_run
timeout 3600 python -m deeprl_network_tpu.main --base-dir /tmp/cli_b512_run \
    train --config-dir /tmp/cli_b512.ini >> "$LOG" 2>&1
say "cli exit $?"
cp /tmp/cli_b512_run/data/train_log.jsonl results/cli_b512_train_log.jsonl \
    2>/dev/null
say "chain complete"

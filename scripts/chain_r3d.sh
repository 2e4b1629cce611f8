#!/bin/bash
# Consolidated priority chain (replaces chain_r3 stages + chain_r3b/c):
# waits for the running cacc_catchup client (pid $1), then runs the
# remaining TPU evidence in VALUE order so late-session compile-lottery
# losses cost the least-important items first.
set -u
cd /root/repo
LOG=results/chain_r3.log
say() { echo "[chain-d $(date +%H:%M:%S)] $*" >> "$LOG"; }
say "waiting for catchup pid $1"
while kill -0 "$1" 2>/dev/null; do sleep 20; done

say "stage 1: bench_variants CLEAN (exclusive chip, all 6 variants)"
timeout 3600 python scripts/bench_variants.py \
    --out results/bench_variants_r3_clean.jsonl >> "$LOG" 2>&1
say "bench clean exit $?"

say "stage 2: nc slowdown seed sweep 3-8"
timeout 2400 python scripts/train_cacc_families.py --scenario cacc_slowdown \
    --agents ma2c_nc --seeds 3,4,5,6,7,8 --steps 10000000 \
    --out results/cacc_nc_seedsweep_r3.jsonl >> "$LOG" 2>&1
say "seed sweep exit $?"

say "stage 3: nc slowdown entropy 0.003"
timeout 2400 python scripts/train_cacc_families.py --scenario cacc_slowdown \
    --agents ma2c_nc --seeds 0,1,2 --steps 10000000 --entropy 0.003 \
    --out results/cacc_nc_ent003_r3.jsonl >> "$LOG" 2>&1
say "ent003 exit $?"

say "stage 4: nc slowdown lr 2.5e-4"
timeout 2400 python scripts/train_cacc_families.py --scenario cacc_slowdown \
    --agents ma2c_nc --seeds 0,1,2 --steps 10000000 --lr 0.00025 \
    --out results/cacc_nc_lr00025_r3.jsonl >> "$LOG" 2>&1
say "lr00025 exit $?"

say "stage 5: neighbor_obs A/B arm ON (100M, seed 0, r3 recipe)"
timeout 2700 python scripts/train_atsc.py --agent ma2c_nc --scenario grid \
    --steps 100000000 --seeds 0 --phase-in-obs --queue-in-obs \
    --kickstart 1.0 --neighbor-obs \
    --out results/grid_ma2c_nc_nbrobs_on.jsonl >> "$LOG" 2>&1
say "nbrobs on exit $?"
say "stage 6: neighbor_obs A/B arm OFF"
timeout 2700 python scripts/train_atsc.py --agent ma2c_nc --scenario grid \
    --steps 100000000 --seeds 0 --phase-in-obs --queue-in-obs \
    --kickstart 1.0 \
    --out results/grid_ma2c_nc_nbrobs_off.jsonl >> "$LOG" 2>&1
say "nbrobs off exit $?"

say "stage 7: cli-vs-bench (main.py train, B=512, 40M steps)"
rm -rf /tmp/cli_b512_run
timeout 2400 python -m deeprl_network_tpu.main --base-dir /tmp/cli_b512_run \
    train --config-dir /tmp/cli_b512.ini >> "$LOG" 2>&1
say "cli exit $?"
cp /tmp/cli_b512_run/data/train_log.jsonl results/cli_b512_train_log.jsonl \
    2>/dev/null
say "chain-d complete"

#!/bin/bash
# Diagnostic chain: the r3 CACC slow-down sweep INVERTED the round-1
# single-seed claim (MA2C_NC crashed on seeds 0-2 at 10M while IA2C and
# IA2C_CU reached zero collisions). These probes separate seed-fragility
# from hyperparameter sensitivity before the claim is rewritten.
set -u
cd /root/repo
LOG=results/chain_r3.log
say() { echo "[chain-c $(date +%H:%M:%S)] $*" >> "$LOG"; }
say "waiting for chain-b pid $1"
while kill -0 "$1" 2>/dev/null; do sleep 20; done

say "stage nc slowdown seed sweep 3-8"
timeout 2400 python scripts/train_cacc_families.py --scenario cacc_slowdown \
    --agents ma2c_nc --seeds 3,4,5,6,7,8 --steps 10000000 \
    --out results/cacc_nc_seedsweep_r3.jsonl >> "$LOG" 2>&1
say "seed sweep exit $?"

say "stage nc slowdown entropy 0.003"
timeout 2400 python scripts/train_cacc_families.py --scenario cacc_slowdown \
    --agents ma2c_nc --seeds 0,1,2 --steps 10000000 --entropy 0.003 \
    --out results/cacc_nc_ent003_r3.jsonl >> "$LOG" 2>&1
say "ent003 exit $?"

say "stage nc slowdown lr 2.5e-4"
timeout 2400 python scripts/train_cacc_families.py --scenario cacc_slowdown \
    --agents ma2c_nc --seeds 0,1,2 --steps 10000000 --lr 0.00025 \
    --out results/cacc_nc_lr00025_r3.jsonl >> "$LOG" 2>&1
say "lr00025 exit $?"

say "chain-c complete"

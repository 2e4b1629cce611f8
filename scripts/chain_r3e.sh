#!/bin/bash
# Final probe: the crash-attractor hypothesis. With collision_penalty
# 1000 / reward_norm 1000 the post-norm crash penalty (-1) is worth ~50
# steps of good tracking, so crashing early is return-competitive and
# the slow-down crash regime is absorbing (NC seed 1 SOLVED it at 2M
# then collapsed into it). penalty=5000 removes the attractor if the
# theory is right.
set -u
cd /root/repo
LOG=results/chain_r3.log
say() { echo "[chain-e $(date +%H:%M:%S)] $*" >> "$LOG"; }
say "waiting for chain-d pid $1"
while kill -0 "$1" 2>/dev/null; do sleep 20; done

say "stage: nc+ia2c slowdown, collision_penalty 5000, seeds 0,1,2"
timeout 3000 python scripts/train_cacc_families.py --scenario cacc_slowdown \
    --agents ma2c_nc,ia2c --seeds 0,1,2 --steps 10000000 \
    --collision-penalty 5000 \
    --out results/cacc_penalty5k_r3.jsonl >> "$LOG" 2>&1
say "penalty5k exit $?"
say "chain-e complete"

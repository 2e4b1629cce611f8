"""Benchmark: training throughput (env-steps/s/chip) on the flagship
config — MA2C_NC (NeurComm) on the 25-agent 5x5 grid ATSC env.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no throughput numbers (SURVEY.md section 6;
BASELINE.json "published": {}), so vs_baseline compares against a measured
reference-style baseline: the same policy forward + env dynamics executed
the way the reference executes them — a host python loop, one env, one
step at a time, numpy math (stand-in for the TF1 sess.run + TraCI chatter
hot loop, which is strictly slower since SUMO adds TCP roundtrips).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def measure_tpu(seconds_budget: float = 45.0, num_envs: int = 768,
                grid_size: int = 5, scenario: str = "grid",
                **mcfg_overrides):
    import jax

    from deeprl_network_tpu.utils.compilation_cache import enable
    enable()

    from deeprl_network_tpu.config import EnvConfig, ModelConfig, TrainConfig
    from deeprl_network_tpu.envs.cacc import CACCEnv
    from deeprl_network_tpu.envs.grid import LargeGridEnv, build_grid_topology
    from deeprl_network_tpu.envs.network import TrafficNetworkEnv
    from deeprl_network_tpu.utils.rollout import make_a2c

    # flagship config of record (round-4 lever sweep,
    # results/bench_variants_r4.jsonl): bf16 compute + B=768 +
    # sparse_comm + remat measures 1.514M env-steps/s/chip — remat
    # trades the ~9 GB/update BPTT residual HBM traffic for recompute
    # FLOPs (+6% alone), sparse_comm shrinks w_msg re-reads 5x (+4%
    # alone), and the B knee sits at 768; the gains stack
    # (docs/ROOFLINE.md round-4 section). seconds_budget=45 since r5:
    # at 20s the run-to-run session lottery was +-5% (VERDICT r4
    # Weak #1); the longer window brings cold-process spread under 2%.
    mcfg = ModelConfig(batch_size=120, num_envs=num_envs, **mcfg_overrides)
    tcfg = TrainConfig(total_step=1_000_000)
    if scenario.startswith("cacc"):
        # the BASELINE.json north-star shape: 8-vehicle platoon (VERDICT
        # r4 Missing #4 — the old B=64 side number predated every r4
        # lever; the env is tiny, so the B knee sits far higher)
        env = CACCEnv(EnvConfig(scenario=scenario, coop_gamma=0.9))
    elif grid_size != 5:
        # N = grid_size^2 agents: the scaling shape where the dense
        # [N,N] comm blocks stop being free and sparse_comm should win
        ecfg = EnvConfig(scenario="large_grid", coop_gamma=0.9)
        env = TrafficNetworkEnv(ecfg, build_grid_topology(ecfg, grid_size))
    else:
        ecfg = EnvConfig(scenario="large_grid", coop_gamma=0.9)
        env = LargeGridEnv(ecfg)
    fns = make_a2c(env, mcfg, tcfg, agent="ma2c_nc")
    t0 = time.perf_counter()
    ts = fns.init_state(jax.random.key(0))
    jax.block_until_ready(ts.obs)
    print(f"init: {time.perf_counter() - t0:.0f}s", file=sys.stderr,
          flush=True)
    # compile + warmup
    t0 = time.perf_counter()
    ts, m = fns.train_step(ts)
    jax.block_until_ready(m["loss"])
    print(f"train_step compile: {time.perf_counter() - t0:.0f}s",
          file=sys.stderr, flush=True)
    # sync every chunk: async dispatch outruns execution and would build
    # an unbounded device queue otherwise
    n_updates = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds_budget:
        for _ in range(5):
            ts, m = fns.train_step(ts)
        jax.block_until_ready(m["loss"])
        n_updates += 5
    dt = time.perf_counter() - t0
    env_steps = n_updates * mcfg.batch_size * mcfg.num_envs
    return env_steps / dt, float(m["loss"])


def measure_baseline(n_steps: int = 300):
    """Reference-style host loop: single env, per-step numpy policy
    forward (25 agents x (fc 12->64, LSTM 64, heads)) + env dynamics."""
    from deeprl_network_tpu.config import EnvConfig
    from deeprl_network_tpu.envs.grid import build_grid_topology

    cfg = EnvConfig(scenario="large_grid")
    topo = build_grid_topology(cfg)
    L = topo.n_lane
    rng = np.random.RandomState(0)
    N, S, H, A = 25, 12, 64, 5
    w_in = rng.randn(N, S, H).astype(np.float32) * 0.1
    wx = rng.randn(N, H, 4 * H).astype(np.float32) * 0.1
    wh = rng.randn(N, H, 4 * H).astype(np.float32) * 0.1
    wa = rng.randn(N, H, A).astype(np.float32) * 0.1
    c = np.zeros((N, H), np.float32)
    h = np.zeros((N, H), np.float32)
    queue = np.zeros(L, np.float32)
    wait = np.zeros(L, np.float32)
    obs = np.zeros((N, S), np.float32)
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    gather = np.stack([np.array(ls) for ls in topo.node_lanes])
    t0 = time.perf_counter()
    for t in range(n_steps):
        # policy forward, agent-by-agent like the reference graph feeds
        e = np.maximum(np.einsum("ns,nsh->nh", obs, w_in), 0.0)
        z = (np.einsum("nh,nhk->nk", e, wx)
             + np.einsum("nh,nhk->nk", h, wh))
        i, f, o, u = np.split(z, 4, axis=-1)
        c = sig(f) * c + sig(i) * np.tanh(u)
        h = sig(o) * np.tanh(c)
        logits = np.einsum("nh,nha->na", h, wa)
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        actions = np.array([rng.choice(A, p=p[n]) for n in range(N)])
        # env dynamics: 5 x 1s substeps
        gate = topo.phase_gate[np.arange(N), actions].max(0)
        demand = topo.demand[min(t, len(topo.demand) - 1)]
        for k in range(cfg.control_interval_sec):
            dq = np.minimum(queue, gate * cfg.sat_flow)
            queue = np.minimum(queue + topo.route.T @ dq + demand - dq,
                               cfg.lane_capacity)
            wait = (wait + 1.0) * (queue > 0.1) * (dq <= 1e-4)
        obs = np.clip(queue[gather] / cfg.norm_wave, 0, cfg.clip_wave)
    return n_steps / (time.perf_counter() - t0)


def main():
    baseline_sps = measure_baseline()
    print(f"baseline (reference-style host loop): {baseline_sps:.1f} "
          f"env-steps/s", file=sys.stderr)
    # measured-best flagship (round-4 lever sweep): bf16 + B=768 +
    # sparse_comm + remat, 1.514M env-steps/s/chip on a clean chip
    # (results/bench_variants_r4.jsonl; account in docs/ROOFLINE.md)
    sps, loss = measure_tpu(compute_dtype="bfloat16", sparse_comm=True,
                            remat=True)
    print(f"fused TPU train step: {sps:.1f} env-steps/s/chip "
          f"(loss {loss:.3f})", file=sys.stderr)
    print(json.dumps({
        "metric": "env_steps_per_s_per_chip_grid25_ma2c_nc",
        "value": round(sps, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(sps / baseline_sps, 2),
    }))


if __name__ == "__main__":
    main()

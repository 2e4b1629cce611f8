"""Acceptance bars for the two headline results (VERDICT round 1, item 8),
encoded as tests so later rounds cannot silently regress them:

1. ATSC: a learned controller must beat the greedy max-pressure baseline
   (the paper's central ATSC claim, SURVEY.md section 6 rows 2-3) on a
   small grid after a short training budget.
2. CACC slow-down: independent learners crash the platoon far more often
   than NeurComm at a small budget (the paper's headline CACC finding,
   SURVEY.md section 6 CACC row).

Both train for minutes, so they are `slow`-marked and SKIPPED unless
RUN_SLOW=1 is set (documented in the repo README):

    RUN_SLOW=1 python -m pytest tests/test_acceptance.py -q

The thresholds are deliberately loose versions of the measured results in
results/README.md — they encode the *direction* of each claim, not the
tuned numbers.
"""

import os

import jax
import numpy as np
import pytest

from deeprl_network_tpu.config import EnvConfig, ModelConfig, TrainConfig
from deeprl_network_tpu.envs.network import TrafficNetworkEnv
from deeprl_network_tpu.utils.rollout import make_a2c

slow = pytest.mark.skipif(
    os.environ.get("RUN_SLOW", "0") != "1",
    reason="long training run; set RUN_SLOW=1 to enable")


def _small_grid_env():
    from deeprl_network_tpu.envs.grid import build_grid_topology

    # full 3600 s episodes — the setting the recipe evidence was measured
    # on (results/ladder3_r3.jsonl). At 720 s the demand peak never
    # builds queues, the myopic greedy is near-optimal there, and the
    # hysteresis kickstart teacher is mis-matched to the horizon (a
    # 720 s run measured learned -8.7k vs greedy -8.3k: the claim being
    # encoded is about sustained congestion, not the empty-road regime).
    cfg = EnvConfig(scenario="large_grid", coop_gamma=0.9,
                    clip_wave=8.0,
                    phase_in_obs=True, queue_in_obs=True)
    return TrafficNetworkEnv(cfg, build_grid_topology(cfg, size=3)), cfg


def _greedy_return(env, horizon, on="queue", delta=0.0):
    def body(c, _):
        state = c
        a = env.greedy_action(state, on=on, delta=delta)
        state, _, r, _, _ = env.step(state, a)
        return state, r.sum()

    state, _ = env.reset(jax.random.key(0))
    _, rs = jax.lax.scan(body, state, None, length=horizon)
    return float(rs.sum())


@slow
def test_learned_beats_greedy_small_grid():
    """Learned MA2C_NC (round-3 recipe: phase+queue obs, kickstart toward
    the hysteresis teacher annealed to 0 by half-budget) > greedy argmax
    controller (stronger of queue/wave forms) on a 3x3 grid within a
    ~25M-step budget. Grounding: the same recipe measured -59.8k at 20M
    vs greedy -118.8k (results/ladder3_r3.jsonl pq_kick curve) — a 2x
    margin. The stronger hysteresis bar needs the full 100M-step run
    (ladder final: sampled -47.9k vs bar -50.3k); this encodes the
    direction at CI-feasible cost."""
    env, cfg = _small_grid_env()
    horizon = env.episode_steps
    greedy = max(_greedy_return(env, horizon, "queue"),
                 _greedy_return(env, horizon, "wave"))

    mcfg = ModelConfig(batch_size=120, num_envs=64, lr_init=2.5e-3,
                       lr_decay="linear", entropy_coef=0.003,
                       entropy_decay="linear", reward_norm=2000.0,
                       kickstart_coef=1.0, kickstart_ratio=0.5)
    tcfg = TrainConfig(total_step=25_000_000)
    fns = make_a2c(env, mcfg, tcfg, agent="ma2c_nc")
    ts = fns.init_state(jax.random.key(0))
    while int(ts.step) < tcfg.total_step:
        ts, m = fns.train_step(ts)
    # sampled eval (reference protocol), held-out seeds
    rets = [float(fns.eval_episode(ts.params, jax.random.key(10_000 + s),
                                   None, False)["episode_return"])
            for s in range(3)]
    learned = float(np.mean(rets))
    assert learned > greedy, (
        f"learned {learned:.0f} must beat greedy {greedy:.0f}")


@slow
def test_cacc_slowdown_solved_teacher_free():
    """CACC slow-down is solvable TEACHER-FREE at the default collision
    penalty under the spec-of-record reward (EnvConfig.v_target =
    "profile") — the paper's own claim (SURVEY section 6 CACC row),
    which the r1-r4 fixed-v* engine provably could not reproduce
    (crashing was return-optimal: ~-900k of the surviving return was
    unavoidable ramp-tracking cost; scripts/cacc_reward_decompose.py and
    results/README.md round 5). MA2C_NC must end a CI-budget run out of
    the crash regime: final-window collision rate <= 5e-3, episode
    length >= 500 of 600, with NO kickstart and NO raised penalty.
    Grounding: the r5 teacher-free probe
    (results/cacc_slowdown_profile_teacherfree_r5.jsonl) at 10M steps.
    The r4 fixed-mode recipe (penalty 5000 + OVM kickstart,
    cacc_slowdown5k_kick_r4.jsonl) remains the working recipe for
    v_target="fixed" but is no longer the bar."""
    from deeprl_network_tpu.envs.cacc import CACCEnv

    env = CACCEnv(EnvConfig(scenario="cacc_slowdown", coop_gamma=0.9))
    mcfg = ModelConfig(batch_size=120, num_envs=64, reward_norm=1000.0,
                       lr_decay="linear")
    tcfg = TrainConfig(total_step=6_000_000)
    fns = make_a2c(env, mcfg, tcfg, agent="ma2c_nc")
    ts = fns.init_state(jax.random.key(0))
    window = []
    while int(ts.step) < tcfg.total_step:
        ts, m = fns.train_step(ts)
        window.append(m)
        window = window[-10:]
    window = jax.device_get(window)
    coll = float(np.mean([m["env/collision"] for m in window]))
    eplen = float(np.mean([m["episode_len"] for m in window]))
    assert coll <= 5e-3, coll
    assert eplen >= 500.0, eplen


@slow
def test_cacc_catchup_parity():
    """IA2C and MA2C_NC both master CACC catch-up within 2M steps: zero
    (<=5e-3) collision rate, near-full episodes, headway near h*=20 m —
    the paper's CACC convergence behavior (SURVEY Appendix C test 4),
    robust across seeds (round-3: 0 collisions / 600-step episodes /
    ~1.2 m error on 3x2 TPU runs at 10M, results/cacc_catchup_r3.jsonl).

    This REPLACES the round-1 slow-down discrimination bar
    (IA2C >> MA2C_NC collisions): that claim was single-seed luck and
    inverts at 3 seeds x 10M — on this engine the slow-down crash
    regime is a return-preferred absorbing attractor at the default
    collision-penalty scale, and which families escape it is seed
    lottery (analysis + probes: results/README.md CACC slow-down)."""
    from deeprl_network_tpu.envs.cacc import CACCEnv

    for agent in ("ia2c", "ma2c_nc"):
        coop = 0.9 if agent.startswith("ma2c") else -1.0
        env = CACCEnv(EnvConfig(scenario="cacc_catchup", coop_gamma=coop))
        mcfg = ModelConfig(batch_size=120, num_envs=64, reward_norm=1000.0)
        tcfg = TrainConfig(total_step=2_000_000)
        fns = make_a2c(env, mcfg, tcfg, agent=agent)
        ts = fns.init_state(jax.random.key(0))
        window = []
        while int(ts.step) < tcfg.total_step:
            ts, m = fns.train_step(ts)
            window.append(m)
            window = window[-10:]
        coll = float(np.mean(
            [np.asarray(m["env/collision"]) for m in window]))
        eplen = float(np.mean(
            [np.asarray(m["episode_len"]) for m in window]))
        herr = float(np.mean(
            [np.asarray(m["env/headway_err"]) for m in window]))
        assert coll <= 5e-3, (agent, coll)
        assert eplen >= 500.0, (agent, eplen)
        assert herr <= 3.0, (agent, herr)

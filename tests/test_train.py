"""End-to-end smoke tests for the fused train step: every algorithm family
builds, runs, produces finite losses, and updates parameters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeprl_network_tpu.config import EnvConfig, ModelConfig, TrainConfig
from deeprl_network_tpu.envs.cacc import CACCEnv
from deeprl_network_tpu.utils.rollout import make_a2c

AGENTS = ["ia2c", "ia2c_fp", "ia2c_cu", "ma2c_nc", "ma2c_cnet", "ma2c_dial"]


def small_cfgs(coop_gamma=-1.0):
    ecfg = EnvConfig(scenario="cacc_catchup", coop_gamma=coop_gamma,
                     episode_length=40)
    mcfg = ModelConfig(batch_size=8, num_fc=16, num_lstm=16, num_envs=4,
                       reward_norm=2000.0, reward_clip=2.0)
    tcfg = TrainConfig(total_step=10_000)
    return ecfg, mcfg, tcfg


@pytest.mark.parametrize("agent", AGENTS)
def test_train_step_smoke(agent):
    coop = 0.9 if agent.startswith("ma2c") else -1.0
    ecfg, mcfg, tcfg = small_cfgs(coop)
    env = CACCEnv(ecfg)
    fns = make_a2c(env, mcfg, tcfg, agent=agent)
    ts = fns.init_state(jax.random.key(0))
    p0 = jax.tree.leaves(ts.params)[0].copy()
    for _ in range(2):
        ts, metrics = fns.train_step(ts)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    assert float(metrics["entropy"]) > 0.0
    p1 = jax.tree.leaves(ts.params)[0]
    assert not np.allclose(np.array(p0), np.array(p1))
    assert int(ts.step) == 2 * mcfg.batch_size * mcfg.num_envs


def test_step_counter_and_episode_metrics():
    ecfg, mcfg, tcfg = small_cfgs()
    env = CACCEnv(ecfg)
    fns = make_a2c(env, mcfg, tcfg, agent="ia2c")
    ts = fns.init_state(jax.random.key(1))
    # run enough updates to cross an episode boundary (40-step episodes,
    # 8-step windows)
    for _ in range(7):
        ts, metrics = fns.train_step(ts)
    assert float(metrics["episode_len"]) > 0.0


def test_eval_episode_runs():
    ecfg, mcfg, tcfg = small_cfgs()
    env = CACCEnv(ecfg)
    fns = make_a2c(env, mcfg, tcfg, agent="ia2c")
    ts = fns.init_state(jax.random.key(2))
    out = fns.eval_episode(ts.params, jax.random.key(3))
    assert np.isfinite(float(out["episode_return"]))


def test_deterministic_given_key():
    ecfg, mcfg, tcfg = small_cfgs()
    env = CACCEnv(ecfg)
    fns = make_a2c(env, mcfg, tcfg, agent="ia2c")
    ts1 = fns.init_state(jax.random.key(0))
    ts2 = fns.init_state(jax.random.key(0))
    ts1, m1 = fns.train_step(ts1)
    ts2, m2 = fns.train_step(ts2)
    assert float(m1["loss"]) == float(m2["loss"])


def test_consensus_changes_update_direction():
    """IA2C vs IA2C_CU from identical init: consensus averaging must
    produce different post-update parameters."""
    ecfg, mcfg, tcfg = small_cfgs()
    env = CACCEnv(ecfg)
    f_plain = make_a2c(env, mcfg, tcfg, agent="ia2c")
    f_cons = make_a2c(env, mcfg, tcfg, agent="ia2c_cu")
    ts_a = f_plain.init_state(jax.random.key(5))
    ts_b = f_cons.init_state(jax.random.key(5))
    ts_a, _ = f_plain.train_step(ts_a)
    ts_b, _ = f_cons.train_step(ts_b)
    wa = np.array(ts_a.params.w_obs.w)
    wb = np.array(ts_b.params.w_obs.w)
    assert not np.allclose(wa, wb)

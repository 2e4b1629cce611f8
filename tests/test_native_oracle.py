"""Cross-validate the JAX store-and-forward engine against the native C++
oracle (native/sfq_oracle.cpp): two independent implementations of the
spec in envs/network.py's module docstring must agree step-for-step on
queues, waits, rewards, throughput, and termination.

Also smoke-tests the oracle's standalone env surface (step/greedy).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeprl_network_tpu.config import EnvConfig
from deeprl_network_tpu.envs.grid import LargeGridEnv
from deeprl_network_tpu.envs.monaco import RealNetEnv
from deeprl_network_tpu.envs.native_oracle import (
    NativeNetworkOracle, build_library)


def _make_env(scenario):
    if scenario == "grid":
        cfg = EnvConfig(scenario="large_grid", episode_length_sec=600,
                        init_density=0.3, objective="hybrid")
        return LargeGridEnv(cfg)
    cfg = EnvConfig(scenario="real_net", episode_length_sec=600,
                    init_density=0.3, objective="queue")
    return RealNetEnv(cfg)


def test_build_library():
    path = build_library(force=True)
    import os
    assert os.path.exists(path)


@pytest.mark.parametrize("scenario", ["grid", "monaco"])
def test_oracle_matches_jax_engine(scenario):
    env = _make_env(scenario)
    oracle = NativeNetworkOracle(env)

    key = jax.random.key(7)
    state, _ = env.reset(key)
    q0 = np.asarray(state.queue)
    oracle.reset(q0)

    n_steps = 50
    rng = np.random.RandomState(3)
    n_a = np.array(env.spec.n_a_ls)
    actions = np.stack([rng.randint(0, n_a) for _ in range(n_steps)]
                       ).astype(np.int32)

    step = jax.jit(env.step)
    jq, jw, jr, jflow, jdone = [], [], [], [], []
    for t in range(n_steps):
        state, _, reward, done, info = step(state, jnp.asarray(actions[t]))
        rec = env.record(state)
        jq.append(np.asarray(rec["node_queue"]))
        jw.append(np.asarray(rec["node_wait"]))
        jr.append(np.asarray(reward))
        jflow.append(float(info["throughput"]))
        jdone.append(bool(done))
    out = oracle.rollout(actions)

    np.testing.assert_allclose(out["node_queue"], np.stack(jq),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(out["node_wait"], np.stack(jw),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(out["reward"], np.stack(jr),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(out["throughput"], np.array(jflow),
                               rtol=1e-4, atol=1e-3)
    assert list(out["done"]) == jdone
    np.testing.assert_allclose(out["dropped"], float(state.dropped),
                               rtol=1e-4, atol=1e-2)
    # final lane-level state agrees too, in-transit ring buffer included
    np.testing.assert_allclose(oracle.queue, np.asarray(state.queue),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(oracle.wait, np.asarray(state.wait),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(oracle.transit_aligned,
                               np.asarray(state.transit),
                               rtol=1e-4, atol=1e-3)


def test_oracle_greedy_matches_jax_greedy():
    env = _make_env("grid")
    oracle = NativeNetworkOracle(env)
    state, _ = env.reset(jax.random.key(11))
    oracle.reset(np.asarray(state.queue))
    for _ in range(5):
        a_jax = np.asarray(env.greedy_action(state))
        a_nat = oracle.greedy_action()
        np.testing.assert_array_equal(a_nat, a_jax)
        state, *_ = env.step(state, jnp.asarray(a_jax))
        oracle.rollout(a_nat[None])


def test_oracle_single_step_surface():
    env = _make_env("grid")
    oracle = NativeNetworkOracle(env)
    nq, reward, done, info = oracle.step(
        np.zeros(env.spec.n_agent, np.int32))
    assert nq.shape == (env.spec.n_agent,)
    assert reward.shape == (env.spec.n_agent,)
    assert not done
    assert set(info) >= {"avg_queue", "avg_wait", "throughput"}

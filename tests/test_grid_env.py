"""Grid ATSC engine tests: topology invariants, conservation, phase
gating, spillback, greedy baseline sanity (SURVEY.md section 7 step 5:
validate controllability before training RL)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeprl_network_tpu.config import EnvConfig
from deeprl_network_tpu.envs.grid import (
    GRID_PHASES, LargeGridEnv, build_grid_topology,
)


@pytest.fixture(scope="module")
def env():
    return LargeGridEnv(EnvConfig(scenario="large_grid", coop_gamma=0.9,
                                  episode_length_sec=300))


def test_topology_shapes(env):
    topo = env.topo
    assert topo.n_node == 25
    assert topo.n_lane == 25 * 12
    assert env.spec.n_a_ls == (5,) * 25
    assert env.spec.n_s_ls == (12,) * 25
    # corner node has 2 neighbors, edge 3, interior 4
    degs = topo.node_adj.sum(1)
    assert degs[0] == 2 and degs[2] == 3 and degs[12] == 4


def test_route_rows_sum(env):
    rs = env.topo.route.sum(1)
    # every row sums to ~1 (interior) or 0 (exits network)
    assert np.all((np.abs(rs - 1.0) < 1e-5) | (rs < 1e-6))
    # boundary-heading movements exit
    assert (rs < 1e-6).sum() > 0


def test_entry_lanes_on_boundary_only(env):
    topo = env.topo
    entries = np.where(topo.entry_lane > 0)[0]
    # 5 nodes per side x 3 movements x 4 sides = 60 entry lanes
    assert len(entries) == 60


def test_phase_gates(env):
    # each phase gates the declared movements only
    topo = env.topo
    for p, movements in enumerate(GRID_PHASES):
        assert topo.phase_gate[0, p].sum() == len(movements)


def test_step_conservation_no_demand():
    cfg = EnvConfig(scenario="large_grid", demand_scale=0.0,
                    episode_length_sec=300)
    env = LargeGridEnv(cfg)
    state, obs = env.reset(jax.random.key(0))
    state = state.replace(queue=jnp.ones_like(state.queue) * 2.0)
    total0 = float(state.queue.sum())
    action = jnp.zeros((25,), jnp.int32)
    state2, *_ = env.step(state, action)
    # vehicles only leave via boundary exits; total can only decrease
    assert float(state2.queue.sum()) <= total0 + 1e-4


def test_demand_fills_queues():
    cfg = EnvConfig(scenario="large_grid", episode_length_sec=300)
    env = LargeGridEnv(cfg)
    state, obs = env.reset(jax.random.key(0))
    # hold all-red-ish: p1 (NS left) blocks most E/W entry flow
    for _ in range(10):
        state, obs, reward, done, info = env.step(
            state, jnp.ones((25,), jnp.int32))
    assert float(state.queue.sum()) > 0.0
    assert float(reward.sum()) < 0.0
    assert obs.shape == (25, 12)


def test_greedy_beats_static(env):
    """Greedy controller must clear more vehicles than a frozen phase —
    the reference's sanity floor (LargeGridController)."""
    key = jax.random.key(0)

    def run(policy):
        state, obs = env.reset(key)
        tot = 0.0
        for _ in range(40):
            a = policy(state)
            state, obs, reward, done, info = env.step(state, a)
            tot += float(reward.sum())
        return tot

    static = run(lambda s: jnp.zeros((25,), jnp.int32))
    greedy = run(lambda s: env.greedy_action(s))
    assert greedy > static


def test_yellow_blocks_discharge():
    cfg = EnvConfig(scenario="large_grid", demand_scale=0.0,
                    episode_length_sec=300)
    env = LargeGridEnv(cfg)
    state, _ = env.reset(jax.random.key(0))
    q = jnp.ones_like(state.queue) * 10.0
    state = state.replace(queue=q, prev_phase=jnp.zeros((25,), jnp.int32))
    # keeping phase 0: full 5s discharge; switching to 2: only 3s
    hold, *_ = env.step(state, jnp.zeros((25,), jnp.int32))
    # re-prepare identical state but switch phases
    state_b = state.replace(prev_phase=jnp.ones((25,), jnp.int32) * 2)
    # same action 0, but prev phase differs -> yellow window applies
    switch, *_ = env.step(state_b, jnp.zeros((25,), jnp.int32))
    assert float(switch.queue.sum()) > float(hold.queue.sum())


def test_episode_terminates(env):
    state, _ = env.reset(jax.random.key(0))
    done = False
    for _ in range(env.episode_steps):
        state, _, _, done, _ = env.step(state, jnp.zeros((25,), jnp.int32))
    assert bool(done)


def test_vmap_batch(env):
    B = 4
    states, obs = jax.vmap(env.reset)(jax.random.split(jax.random.key(0), B))
    a = jnp.zeros((B, 25), jnp.int32)
    s2, o2, r, d, info = jax.vmap(env.step)(states, a)
    assert r.shape == (B, 25)


def test_phase_in_obs_layout():
    """phase_in_obs: the current-phase one-hot lands right after each
    node's packed lane features, n_s grows by n_a, and it tracks the
    clipped action taken at the previous step."""
    cfg = EnvConfig(scenario="large_grid", episode_length_sec=300,
                    phase_in_obs=True)
    env = LargeGridEnv(cfg)
    assert env.spec.n_s_ls == (12 + 5,) * 25
    state, obs = env.reset(jax.random.key(0))
    # at reset prev_phase = 0 everywhere
    np.testing.assert_allclose(np.asarray(obs)[:, 12:17],
                               np.eye(5)[np.zeros(25, int)])
    a = jnp.asarray(np.arange(25) % 5, jnp.int32)
    state, obs, *_ = env.step(state, a)
    np.testing.assert_allclose(np.asarray(obs)[:, 12:17],
                               np.eye(5)[np.asarray(a)])
    # wave features unchanged by the flag
    cfg0 = EnvConfig(scenario="large_grid", episode_length_sec=300)
    env0 = LargeGridEnv(cfg0)
    s0, o0 = env0.reset(jax.random.key(0))
    s0, o0, *_ = env0.step(s0, a)
    np.testing.assert_allclose(np.asarray(obs)[:, :12], np.asarray(o0))


def test_queue_in_obs_layout():
    """queue_in_obs: halted-count channel packs right after the wave
    channel, normalized/clipped like wave; phase one-hot (if on) shifts
    after it."""
    cfg = EnvConfig(scenario="large_grid", episode_length_sec=300,
                    queue_in_obs=True, phase_in_obs=True)
    env = LargeGridEnv(cfg)
    assert env.spec.n_s_ls == (12 + 12 + 5,) * 25
    state, obs = env.reset(jax.random.key(0))
    state = state.replace(queue=jnp.arange(state.queue.shape[0],
                                           dtype=jnp.float32) % 7)
    obs = env._obs(state)
    obs = np.asarray(obs)
    q = np.asarray(state.queue)
    wave = q + np.asarray(state.transit.sum(0))
    for m, ls in enumerate(env.topo.node_lanes):
        np.testing.assert_allclose(
            obs[m, :12], np.clip(wave[ls] / cfg.norm_wave, 0, cfg.clip_wave),
            rtol=1e-6)
        np.testing.assert_allclose(
            obs[m, 12:24], np.clip(q[ls] / cfg.norm_wave, 0, cfg.clip_wave),
            rtol=1e-6)
    # phase one-hot right after the 24 lane features
    np.testing.assert_allclose(obs[:, 24], 1.0)


def test_hysteresis_controller_beats_greedy():
    """Queue-scored hysteresis (the controller of record,
    env.controller_action) must beat BOTH greedy argmax forms on the full
    default episode — the measured ordering that makes it the baseline
    every beats-greedy claim compares against (VERDICT r2 Missing #6)."""
    from deeprl_network_tpu.envs.network import TrafficNetworkEnv

    cfg = EnvConfig(scenario="large_grid", coop_gamma=0.9)
    e = TrafficNetworkEnv(cfg, build_grid_topology(cfg, size=3))

    def run(pol):
        def body(c, _):
            s = c
            s, _, r, _, _ = e.step(s, pol(s))
            return s, r.sum()
        s0, _ = e.reset(jax.random.key(0))
        _, rs = jax.lax.scan(body, s0, None, length=e.episode_steps)
        return float(rs.sum())

    hyst = run(jax.jit(e.controller_action))
    greedy_q = run(jax.jit(lambda s: e.greedy_action(s, on="queue")))
    greedy_w = run(jax.jit(lambda s: e.greedy_action(s, on="wave")))
    assert hyst > greedy_q and hyst > greedy_w, (hyst, greedy_q, greedy_w)


def test_phase_in_obs_monaco_heterogeneous():
    from deeprl_network_tpu.envs.monaco import RealNetEnv
    cfg = EnvConfig(scenario="real_net", episode_length_sec=300,
                    phase_in_obs=True)
    env = RealNetEnv(cfg)
    cfg0 = EnvConfig(scenario="real_net", episode_length_sec=300)
    env0 = RealNetEnv(cfg0)
    for i in range(env.spec.n_agent):
        assert env.spec.n_s_ls[i] == env0.spec.n_s_ls[i] + env.spec.n_a_ls[i]
    state, obs = env.reset(jax.random.key(0))
    obs = np.asarray(obs)
    for i in range(env.spec.n_agent):
        base = env0.spec.n_s_ls[i]
        # one-hot of phase 0 within the node's valid action span
        assert obs[i, base] == 1.0
        np.testing.assert_allclose(obs[i, base + 1:env.spec.n_s_ls[i]], 0.0)
        np.testing.assert_allclose(obs[i, env.spec.n_s_ls[i]:], 0.0)

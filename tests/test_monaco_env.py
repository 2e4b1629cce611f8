"""Monaco-scale irregular network tests: heterogeneous action/obs spaces,
routing consistency, end-to-end stepping (reference real_net_env.py parity
targets: ~28 nodes, n_a in 2..6, irregular neighbor_mask)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeprl_network_tpu.config import EnvConfig
from deeprl_network_tpu.envs.monaco import RealNetEnv, NODE_XY, EDGES


@pytest.fixture(scope="module")
def env():
    return RealNetEnv(EnvConfig(scenario="real_net", coop_gamma=0.9,
                                episode_length_sec=300, objective="hybrid"))


def test_heterogeneous_spaces(env):
    assert env.n_agent == 28
    n_a = np.array(env.n_a_ls)
    assert n_a.min() >= 2 and n_a.max() <= 6
    assert len(set(env.n_a_ls)) > 1       # truly heterogeneous
    assert len(set(env.n_s_ls)) > 1


def test_adjacency_matches_edges(env):
    adj = env.spec.neighbor_mask
    assert adj.sum() == 2 * len(EDGES)
    assert np.all(adj == adj.T)


def test_route_rows(env):
    rs = env.topo.route.sum(1)
    assert np.all(rs < 1.0 + 1e-5)
    # exit movements have zero-sum rows
    assert (rs < 1e-6).sum() > 0


def test_step_and_reward(env):
    state, obs = env.reset(jax.random.key(0))
    assert obs.shape[0] == 28
    for _ in range(8):
        state, obs, reward, done, info = env.step(
            state, jnp.zeros((28,), jnp.int32))
    assert reward.shape == (28,)
    assert np.isfinite(np.array(reward)).all()
    # demand ramps in: some queues must be non-empty by 40 s with all
    # nodes frozen on phase 0
    assert float(state.queue.sum()) > 0.0


def test_invalid_phase_clamped(env):
    state, _ = env.reset(jax.random.key(0))
    # action 5 is invalid for low-degree nodes -> must not crash
    big = jnp.ones((28,), jnp.int32) * 5
    state2, obs, reward, done, info = env.step(state, big)
    assert np.isfinite(np.array(reward)).all()


def test_greedy_runs(env):
    state, _ = env.reset(jax.random.key(0))
    for _ in range(5):
        a = env.greedy_action(state)
        assert int(a.max()) < env.topo.phase_valid.shape[1]
        state, *_ = env.step(state, a)


def test_train_step_on_monaco():
    from deeprl_network_tpu.config import ModelConfig, TrainConfig
    from deeprl_network_tpu.utils.rollout import make_a2c
    env = RealNetEnv(EnvConfig(scenario="real_net", coop_gamma=0.9,
                               episode_length_sec=100))
    mcfg = ModelConfig(batch_size=4, num_fc=16, num_lstm=16, num_envs=2)
    fns = make_a2c(env, mcfg, TrainConfig(total_step=1000), agent="ma2c_nc")
    ts = fns.init_state(jax.random.key(0))
    ts, metrics = fns.train_step(ts)
    assert np.isfinite(float(metrics["loss"]))


def test_hybrid_obs_packed_per_node():
    """Under objective=hybrid the per-node obs must be PACKED —
    [wave_0..wave_{k-1}, wait_0..wait_{k-1}, 0 pad] — so the first
    n_s_ls[i] dims are node i's valid features (the obs_mask/n_s_ls
    contract for heterogeneous nodes)."""
    env = RealNetEnv(EnvConfig(scenario="real_net", coop_gamma=0.9,
                               objective="hybrid", seed=3))
    s, obs = env.reset(jax.random.key(0))
    # drive a few steps to get nonzero queues/waits
    for _ in range(5):
        s, obs, r, d, info = env.step(s, env.greedy_action(s))
    obs = np.asarray(obs)
    # wave = all vehicles on the lane: queued + in-transit
    q = np.asarray(s.queue) + np.asarray(s.transit).sum(0)
    w = np.asarray(s.wait)
    c = env.cfg
    for i, lanes in enumerate(env.topo.node_lanes):
        k = len(lanes)
        want_wave = np.clip(q[lanes] / c.norm_wave, 0, c.clip_wave)
        want_wait = np.clip(w[lanes] / c.norm_wait, 0, c.clip_wait)
        np.testing.assert_allclose(obs[i, :k], want_wave, rtol=1e-6)
        np.testing.assert_allclose(obs[i, k:2 * k], want_wait, rtol=1e-6)
        assert env.spec.n_s_ls[i] == 2 * k
        # everything past the valid span is zero padding
        np.testing.assert_allclose(obs[i, 2 * k:], 0.0)


def test_default_topology_structure(env):
    """Pin the checked-in monaco_28.json to the published network's
    structure (SURVEY 2.2 item 8; confidence markers in the JSON's
    _provenance): 28 nodes [H], degree histogram {1:4, 2:8, 3:14, 4:2}
    with boundary spurs, n_a histogram {2:8, 3:8, 4:6, 5:4, 6:2}
    spanning 2-6 [M], connected planar graph, degree-1 nodes are
    entries (else they would have a single degenerate phase)."""
    from collections import Counter

    from deeprl_network_tpu.envs.monaco import EDGES, ENTRY_NODES

    deg = Counter()
    nbrs = {n: [] for n in range(28)}
    for a, b in EDGES:
        deg[a] += 1
        deg[b] += 1
        nbrs[a].append(b)
        nbrs[b].append(a)
    assert dict(Counter(deg.values())) == {1: 4, 2: 8, 3: 14, 4: 2}
    assert dict(Counter(env.n_a_ls)) == {2: 8, 3: 8, 4: 6, 5: 4, 6: 2}
    for n, d in deg.items():
        if d == 1:
            assert n in ENTRY_NODES
    seen, stack = {0}, [0]
    while stack:
        for y in nbrs[stack.pop()]:
            if y not in seen:
                seen.add(y)
                stack.append(y)
    assert len(seen) == 28


def test_network_data_loader_roundtrip(tmp_path):
    """External graph loader (reference real_net_data drop-in): dumping
    the synthetic graph to the documented JSON schema and loading it back
    must rebuild the identical topology; a phase override must land in
    the phase tables."""
    import dataclasses
    import json

    from deeprl_network_tpu.envs.monaco import (
        DEFAULT_PHASES, EDGES, ENTRY_NODES, NODE_XY, build_monaco_topology)

    path = tmp_path / "net.json"
    data = {"nodes": [{"x": float(x), "y": float(y)} for x, y in NODE_XY],
            "edges": [list(e) for e in EDGES],
            "entry_nodes": list(ENTRY_NODES),
            "phases": {str(k): v for k, v in DEFAULT_PHASES.items()}}
    path.write_text(json.dumps(data))

    cfg = EnvConfig(scenario="real_net", episode_length_sec=300)
    topo_default = build_monaco_topology(cfg)
    topo_loaded = build_monaco_topology(
        dataclasses.replace(cfg, network_data=str(path)))
    np.testing.assert_array_equal(topo_loaded.node_adj, topo_default.node_adj)
    np.testing.assert_array_equal(topo_loaded.route, topo_default.route)
    np.testing.assert_array_equal(topo_loaded.phase_gate,
                                  topo_default.phase_gate)
    np.testing.assert_array_equal(topo_loaded.lane_delay,
                                  topo_default.lane_delay)
    np.testing.assert_array_equal(topo_loaded.demand, topo_default.demand)

    # explicit phase override: node 0 (neighbors 1 and 7) forced to a
    # single all-green phase -> n_a drops to 1 and the gate serves both
    data["phases"] = {"0": [[1, 7]]}
    path.write_text(json.dumps(data))
    topo_ovr = build_monaco_topology(
        dataclasses.replace(cfg, network_data=str(path)))
    assert int(topo_ovr.phase_valid[0].sum()) == 1
    lanes0 = [li for li in range(topo_ovr.n_lane)
              if topo_ovr.lane_node[li] == 0]
    # every approach lane of node 0 from neighbors 1/7 is gated green
    assert topo_ovr.phase_gate[0, 0, lanes0].sum() > 0
    env = RealNetEnv(dataclasses.replace(cfg, network_data=str(path)))
    assert env.spec.n_a_ls[0] == 1

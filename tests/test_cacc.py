"""CACC dynamics golden tests (SURVEY.md Appendix C test 1): a numpy
mirror of the OVM spec integrated step-by-step must match the JAX env to
float tolerance under fixed actions and injected (zero) noise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeprl_network_tpu.config import EnvConfig
from deeprl_network_tpu.envs.cacc import CACCEnv, OVM_GAINS


def make_env(scenario="cacc_catchup", **kw):
    return CACCEnv(EnvConfig(scenario=scenario, **kw))


def np_ovm_v(h, c):
    span = c.h_go - c.h_st
    out = 0.5 * c.v_max * (1 - np.cos(np.pi * (h - c.h_st) / span))
    return np.where(h < c.h_st, 0.0, np.where(h > c.h_go, c.v_max, out))


def np_step(c, scenario, h, v, v_lead, t, actions):
    g = OVM_GAINS[actions]
    alpha, beta = g[:, 0], g[:, 1]
    v_prev = np.concatenate([[v_lead], v[:-1]])
    u = alpha * (np_ovm_v(h, c) - v) + beta * (v_prev - v)
    u = np.clip(u, -c.u_max, c.u_max)
    v2 = np.clip(v + c.dt * u, 0.0, c.v_max)
    t2 = t + 1
    if scenario == "catchup":
        v_lead2 = c.v_star
    else:
        frac = min(t2 * c.dt / c.slowdown_t, 1.0)
        v_lead2 = c.slowdown_v0 + (c.v_star - c.slowdown_v0) * frac
    v_prev2 = np.concatenate([[v_lead2], v2[:-1]])
    h2 = h + c.dt * (v_prev2 - v2)
    # velocity target per EnvConfig.v_target: "profile" charges against
    # the leader profile at t2 (== v_lead2), "fixed" against constant v*
    v_tgt = v_lead2 if c.v_target == "profile" else c.v_star
    cost = (c.w_h * (h2 - c.h_star) ** 2 + c.w_v * (v2 - v_tgt) ** 2
            + c.w_u * u ** 2)
    collision = h2.min() < c.h_min
    r = np.full_like(cost, -c.collision_penalty) if collision else -cost
    return h2, v2, u, v_lead2, t2, r, collision


@pytest.mark.parametrize("scenario", ["cacc_catchup", "cacc_slowdown"])
def test_golden_trajectory(scenario):
    env = make_env(scenario)
    c = env.cfg
    zeros = jnp.zeros(c.n_vehicle)
    state, obs = env.reset_with_noise(zeros, zeros)
    h = np.array(state.h)
    v = np.array(state.v)
    v_lead = float(state.v_lead)
    t = 0
    rng = np.random.RandomState(7)
    step = jax.jit(env.step)
    for k in range(50):
        actions = rng.randint(0, 4, size=c.n_vehicle)
        state, obs, reward, done, info = step(state, jnp.asarray(actions))
        h, v, u, v_lead, t, r, coll = np_step(
            c, env.scenario, h, v, v_lead, t, actions)
        np.testing.assert_allclose(np.array(state.h), h, rtol=1e-5,
                                   atol=1e-5)
        np.testing.assert_allclose(np.array(state.v), v, rtol=1e-5,
                                   atol=1e-5)
        np.testing.assert_allclose(np.array(reward), r, rtol=1e-4,
                                   atol=1e-4)
        assert bool(done) == coll
        if coll:
            break


def test_catchup_init():
    env = make_env("cacc_catchup")
    state, obs = env.reset_with_noise(jnp.zeros(8), jnp.zeros(8))
    c = env.cfg
    assert float(state.h[0]) == pytest.approx(2 * c.h_star)
    np.testing.assert_allclose(np.array(state.h[1:]), c.h_star)
    np.testing.assert_allclose(np.array(state.v), c.v_star)


def test_slowdown_leader_ramp():
    env = make_env("cacc_slowdown")
    c = env.cfg
    state, _ = env.reset_with_noise(jnp.zeros(8), jnp.zeros(8))
    assert float(state.v_lead) == pytest.approx(c.slowdown_v0)
    # after slowdown_t seconds the leader cruises at v_star
    n_steps = int(c.slowdown_t / c.dt)
    for _ in range(n_steps):
        state, *_ = env.step(state, jnp.ones(8, jnp.int32) * 3)
    assert float(state.v_lead) == pytest.approx(c.v_star, abs=1e-4)


def test_ovm_law_endpoints():
    env = make_env()
    c = env.cfg
    v = env._ovm_velocity(jnp.asarray([0.0, c.h_st, (c.h_st + c.h_go) / 2,
                                       c.h_go, 100.0]))
    np.testing.assert_allclose(
        np.array(v), [0.0, 0.0, c.v_max / 2, c.v_max, c.v_max], atol=1e-5)


def test_collision_terminates_and_penalizes():
    env = make_env()
    c = env.cfg
    state, _ = env.reset_with_noise(jnp.zeros(8), jnp.zeros(8))
    # force a near-collision headway
    state = state.replace(h=state.h.at[3].set(c.h_min + 0.01),
                          v=state.v.at[2].set(0.0))
    # action 0 = no control; vehicle 3 keeps v*, closes on stopped veh 2
    state, obs, reward, done, info = env.step(
        state, jnp.zeros(8, jnp.int32))
    assert bool(done)
    assert bool(info["collision"])
    np.testing.assert_allclose(np.array(reward),
                               -c.collision_penalty * np.ones(8))


def test_obs_shape_and_normalization():
    env = make_env()
    state, obs = env.reset_with_noise(jnp.zeros(8), jnp.zeros(8))
    assert obs.shape == (8, 4)
    # at the fixed point (h*, v*) all obs are 0 except the lead-gap channel
    np.testing.assert_allclose(np.array(obs[1:]), 0.0, atol=1e-6)


def test_envconfig_validates_enum_fields():
    """A typo'd hysteresis_on would silently fall through greedy_action's
    string compare to "wave" and change the baseline bar / kickstart
    teacher (ADVICE r4); v_target gates the CACC reward semantics.
    Both must fail LOUDLY at construction."""
    with pytest.raises(ValueError, match="hysteresis_on"):
        EnvConfig(hysteresis_on="Queue")
    with pytest.raises(ValueError, match="v_target"):
        EnvConfig(v_target="leader")
    EnvConfig(hysteresis_on="wave", v_target="fixed")   # valid forms ok


def test_spacing_controller_survives_slowdown():
    """The profile-mode hand controller (controller_action on slow-down)
    must survive the full noise-free episode with a raw return far above
    the ~-30k crash-optimal bound — the property that makes survival
    return-preferred and the naive baseline honest (round-5 reward
    decomposition; scripts/cacc_reward_decompose.py)."""
    env = make_env("cacc_slowdown")
    c = env.cfg
    assert c.v_target == "profile"     # spec of record since r5
    state, _ = env.reset_with_noise(jnp.zeros(8), jnp.zeros(8))

    def body(s, _):
        a = env.controller_action(s)
        s2, _, r, done, _ = env.step(s, a)
        return s2, (r.sum(), s2.h.min(), done)

    step = jax.jit(lambda s: jax.lax.scan(body, s, None,
                                          length=c.episode_length))
    sf, (rs, hmin, dones) = step(state)
    assert not bool(dones[:-1].any()), "crashed before horizon"
    assert float(np.min(np.array(hmin))) >= c.h_min
    ret = float(np.sum(np.array(rs)))
    assert ret > -10_000.0, ret        # measured noise-free: ~-4.3k
    # and the fixed-mode controller stays the OVM law (near-optimal
    # there): different action stream
    env_fixed = make_env("cacc_slowdown", v_target="fixed")
    sfx, _ = env_fixed.reset_with_noise(jnp.zeros(8), jnp.zeros(8))
    np.testing.assert_array_equal(
        np.array(env_fixed.controller_action(sfx)), np.full(8, 3))


def test_episode_horizon():
    env = make_env(episode_length=5)
    state, _ = env.reset(jax.random.key(0))
    for i in range(5):
        state, _, _, done, _ = env.step(state, jnp.ones(8, jnp.int32) * 3)
    assert bool(done)


def test_vmap_batched_reset_step():
    env = make_env()
    B = 16
    keys = jax.random.split(jax.random.key(0), B)
    states, obs = jax.vmap(env.reset)(keys)
    assert obs.shape == (B, 8, 4)
    actions = jnp.ones((B, 8), jnp.int32)
    states2, obs2, r, d, info = jax.vmap(env.step)(states, actions)
    assert r.shape == (B, 8)
    assert d.shape == (B,)
    # different keys -> different noise -> different states
    assert not np.allclose(np.array(obs[0]), np.array(obs[1]))

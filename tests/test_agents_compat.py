"""Compat-layer tests: the reference-style stateful agent API drives the
CACC env host-side, exactly like the reference Trainer.explore loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeprl_network_tpu.config import EnvConfig, ModelConfig
from deeprl_network_tpu.envs.cacc import CACCEnv
from deeprl_network_tpu.models import agents as M


@pytest.mark.parametrize("cls", [M.IA2C, M.MA2C_NC])
def test_reference_style_loop(cls):
    ecfg = EnvConfig(scenario="cacc_catchup", coop_gamma=0.9,
                     episode_length=30)
    env = CACCEnv(ecfg)
    mcfg = ModelConfig(batch_size=10, num_fc=16, num_lstm=16,
                       reward_norm=1000.0)
    model = cls(env.n_s_ls, env.n_a_ls, env.neighbor_mask,
                env.distance_mask, env.coop_gamma, total_step=1000,
                model_config=mcfg, seed=0)
    state, ob = env.reset(jax.random.key(0))
    done = True
    p0 = np.array(model.params.w_obs.w)
    for _ in range(2):  # two n_step batches
        for _ in range(model.n_step):
            action = model.forward(ob, done)
            state, ob, reward, done, info = env.step(
                state, jnp.asarray(action))
            model.add_transition(ob, action, np.asarray(reward),
                                 None, float(done))
            if done:
                state, ob = env.reset(jax.random.key(1))
        R = model.forward(ob, done, out_type="v")
        if done:
            R = np.zeros_like(R)
        stats = model.backward(R)
        assert np.isfinite(stats["total"])
    assert not np.allclose(p0, np.array(model.params.w_obs.w))


def test_forward_out_types():
    ecfg = EnvConfig(scenario="cacc_catchup", episode_length=30)
    env = CACCEnv(ecfg)
    model = M.IA2C(env.n_s_ls, env.n_a_ls, env.neighbor_mask,
                   env.distance_mask, -1.0, total_step=1000,
                   model_config=ModelConfig(num_fc=8, num_lstm=8), seed=0)
    state, ob = env.reset(jax.random.key(0))
    v = model.forward(ob, True, out_type="v")
    assert v.shape == (8,)
    a, v = model.forward(ob, True, out_type="pv")
    assert a.shape == (8,) and v.shape == (8,)
    assert model.get_policy().shape == (8, 4)


def test_save_load_roundtrip(tmp_path):
    ecfg = EnvConfig(scenario="cacc_catchup", episode_length=30)
    env = CACCEnv(ecfg)
    mk = lambda seed: M.IA2C(env.n_s_ls, env.n_a_ls, env.neighbor_mask,
                             env.distance_mask, -1.0, total_step=1000,
                             model_config=ModelConfig(num_fc=8, num_lstm=8),
                             seed=seed)
    m1, m2 = mk(0), mk(99)
    m1.save(str(tmp_path), step=7)
    assert m2.load(str(tmp_path))
    np.testing.assert_allclose(np.array(m1.params.w_obs.w),
                               np.array(m2.params.w_obs.w))


def test_ragged_obs_packing():
    model = M.IA2C([3, 5], [2, 2], np.eye(2, dtype=np.float32)[::-1],
                   np.array([[0, 1], [1, 0]]), -1.0, total_step=100,
                   model_config=ModelConfig(num_fc=8, num_lstm=8))
    ob = [np.ones(3), np.ones(5)]
    packed = np.array(model._pack_obs(ob))
    assert packed.shape == (2, 5)
    np.testing.assert_allclose(packed[0], [1, 1, 1, 0, 0])

"""Per-step evaluation recording + Evaluator csv output (reference
init_data/output_data parity) and the greedy-controller naive path."""

import os

import jax
import numpy as np
import pytest

from deeprl_network_tpu.config import EnvConfig, ModelConfig, TrainConfig
from deeprl_network_tpu.envs.cacc import CACCEnv
from deeprl_network_tpu.envs.grid import LargeGridEnv
from deeprl_network_tpu.utils.rollout import make_a2c
from deeprl_network_tpu.utils.trainer import Evaluator


def cacc_fns():
    env = CACCEnv(EnvConfig(scenario="cacc_catchup", episode_length=30))
    mcfg = ModelConfig(batch_size=8, num_fc=8, num_lstm=8, num_envs=2)
    return make_a2c(env, mcfg, TrainConfig(total_step=1000), agent="ia2c")


def test_record_episode_series():
    fns = cacc_fns()
    ts = fns.init_state(jax.random.key(0))
    seq = fns.record_episode(ts.params, jax.random.key(1))
    assert seq["headway"].shape == (30, 8)
    assert seq["velocity"].shape == (30, 8)
    assert seq["reward"].shape == (30, 8)
    assert np.isfinite(np.asarray(seq["headway"])).all()


def test_evaluator_writes_series_csv(tmp_path):
    fns = cacc_fns()
    ts = fns.init_state(jax.random.key(0))
    ev = Evaluator(fns, str(tmp_path), seeds=(2000,))
    avg = ev.run(ts.params)
    assert "episode_return" in avg
    assert os.path.exists(tmp_path / "eval_log.csv")
    series = tmp_path / "episode_seed2000.csv"
    assert os.path.exists(series)
    header = open(series).readline().strip().split(",")
    assert "headway_0" in header and "velocity_7" in header


def test_controller_policy_on_grid(tmp_path):
    env = LargeGridEnv(EnvConfig(scenario="large_grid",
                                 episode_length_sec=100))
    mcfg = ModelConfig(batch_size=4, num_fc=8, num_lstm=8, num_envs=2)
    fns = make_a2c(env, mcfg, TrainConfig(total_step=100), agent="ia2c")
    ev = Evaluator(fns, str(tmp_path), seeds=(1,), policy="controller")
    avg = ev.run(None)  # no params needed for the naive baseline
    assert np.isfinite(avg["episode_return"])
    assert os.path.exists(tmp_path / "episode_seed1.csv")

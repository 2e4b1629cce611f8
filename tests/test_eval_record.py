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


def test_reference_artifact_schema_on_grid(tmp_path):
    """Reference eval artifacts {scenario}_{agent}_{traffic,control,
    trip}.csv (envs/atsc_env.py output_data ~L285): schema + conservation
    golden checks on a short grid episode."""
    import csv

    env = LargeGridEnv(EnvConfig(scenario="large_grid",
                                 episode_length_sec=100))
    mcfg = ModelConfig(batch_size=8, num_fc=8, num_lstm=8, num_envs=2)
    fns = make_a2c(env, mcfg, TrainConfig(total_step=100), agent="ia2c")
    ev = Evaluator(fns, str(tmp_path), seeds=(1, 2), policy="controller",
                   scenario="large_grid", agent="greedy",
                   control_interval_sec=5)
    ev.run(None)

    traffic = tmp_path / "large_grid_greedy_traffic.csv"
    control = tmp_path / "large_grid_greedy_control.csv"
    trip = tmp_path / "large_grid_greedy_trip.csv"
    assert traffic.exists() and control.exists() and trip.exists()

    rows = list(csv.DictReader(open(traffic)))
    assert {"episode", "step", "time_sec", "avg_queue", "avg_wait",
            "throughput", "arrived", "entered"} <= set(rows[0])
    # both episodes, full horizon, 5-second control steps
    assert {r["episode"] for r in rows} == {"1", "2"}
    ep1 = [r for r in rows if r["episode"] == "1"]
    assert len(ep1) == 20 and float(ep1[3]["time_sec"]) == 15.0

    crows = list(csv.DictReader(open(control)))
    assert len(crows) == 2 * 20 * 25  # episodes x steps x nodes
    assert {r["node"] for r in crows} == {str(i) for i in range(25)}
    acts = {int(r["action"]) for r in crows}
    assert acts <= set(range(5))

    trows = list(csv.DictReader(open(trip)))
    assert len(trows) == 2
    for r in trows:
        entered = float(r["entered_veh"])
        arrived = float(r["arrived_veh"])
        assert entered > 0
        # conservation: can't discharge more than entered (+init queues=0)
        assert arrived <= entered + 1e-3
        assert float(r["avg_trip_sec"]) > 0


def test_reference_artifacts_skipped_for_cacc(tmp_path):
    """CACC record streams carry no traffic keys: the ATSC artifact files
    must not be written (the platoon series csv is the CACC artifact)."""
    fns = cacc_fns()
    ts = fns.init_state(jax.random.key(0))
    ev = Evaluator(fns, str(tmp_path), seeds=(2000,),
                   scenario="cacc_catchup", agent="ia2c")
    ev.run(ts.params)
    assert not (tmp_path / "cacc_catchup_ia2c_traffic.csv").exists()
    assert (tmp_path / "episode_seed2000.csv").exists()

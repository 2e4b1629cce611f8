"""End-to-end CLI tests: config load/save round-trip, a tiny train run
producing logs + checkpoints, and evaluate restoring from it (reference
main.py train/evaluate surfaces)."""

import configparser
import os

import numpy as np
import pytest

from deeprl_network_tpu.config import load_config, save_config


def test_load_reference_style_config():
    cfg = load_config("configs/config_ma2c_nc_grid.ini")
    assert cfg.agent == "ma2c_nc"
    assert cfg.env.scenario == "large_grid"
    assert cfg.env.coop_gamma == 0.9
    assert cfg.model.rmsp_alpha == 0.99
    assert cfg.model.batch_size == 120
    assert cfg.train.total_step == 1_000_000
    assert cfg.env.test_seeds == (10000, 10001, 10002)


def test_agent_inferred_from_filename():
    cfg = load_config("configs/config_ia2c_fp_cacc_catchup.ini")
    assert cfg.agent == "ia2c_fp"
    assert cfg.env.scenario == "cacc_catchup"


def test_config_round_trip(tmp_path):
    cfg = load_config("configs/config_ia2c_cacc_catchup.ini")
    p = str(tmp_path / "snap.ini")
    save_config(cfg, p)
    cfg2 = load_config(p)
    assert cfg2.env == cfg.env
    assert cfg2.model == cfg.model
    assert cfg2.train == cfg.train
    assert cfg2.agent == cfg.agent


@pytest.fixture(scope="module")
def tiny_ini(tmp_path_factory):
    d = tmp_path_factory.mktemp("cfg")
    p = d / "config_ia2c_cacc_catchup.ini"
    cp = configparser.ConfigParser()
    cp["ENV_CONFIG"] = {"scenario": "cacc_catchup", "coop_gamma": "-1",
                        "episode_length": "40", "seed": "12",
                        "test_seeds": "2000,2500"}
    cp["MODEL_CONFIG"] = {"agent": "ia2c", "batch_size": "8",
                          "num_fc": "16", "num_lstm": "16",
                          "num_envs": "8", "reward_norm": "1000"}
    cp["TRAIN_CONFIG"] = {"total_step": "640", "test_interval": "320",
                          "log_interval": "160"}
    with open(p, "w") as f:
        cp.write(f)
    return str(p)


def test_train_and_evaluate_end_to_end(tiny_ini, tmp_path_factory):
    from deeprl_network_tpu.main import main
    base = str(tmp_path_factory.mktemp("run"))
    main(["--base-dir", base, "train", "--config-dir", tiny_ini,
          "--test-mode", "in_train_test"])
    assert os.path.exists(os.path.join(base, "data", "train_log.csv"))
    assert os.path.exists(os.path.join(base, "data", "test_log.csv"))
    assert os.listdir(os.path.join(base, "model"))
    # config snapshot in run dir (reference copy_file behavior)
    assert any(f.endswith(".ini") for f in
               os.listdir(os.path.join(base, "data")))
    main(["--base-dir", base, "evaluate", "--evaluation-seeds", "2000,2500"])
    assert os.path.exists(os.path.join(base, "eva_data", "eval_log.csv"))
    # reference evaluate --agents: run subdirectories under a parent dir
    parent = os.path.dirname(base)
    name = os.path.basename(base)
    main(["--base-dir", parent, "evaluate", "--agents", name,
          "--evaluation-seeds", "2000"])
    assert os.path.getsize(os.path.join(base, "eva_data", "eval_log.csv"))


def test_train_no_test_mode_skips_test_log(tiny_ini, tmp_path_factory):
    """Reference --test-mode no_test: no held-out evaluation during
    training, so no test_log output."""
    from deeprl_network_tpu.main import main
    base = str(tmp_path_factory.mktemp("run_nt"))
    main(["--base-dir", base, "train", "--config-dir", tiny_ini])
    assert os.path.exists(os.path.join(base, "data", "train_log.csv"))
    assert not os.path.exists(os.path.join(base, "data", "test_log.csv"))


def test_train_restore_resumes(tiny_ini, tmp_path_factory):
    """--restore continues from the latest checkpoint with remaining
    budget and actually performs new updates (here: through the
    auto-data-parallel path, since tests force an 8-device mesh)."""
    import configparser
    import csv
    from deeprl_network_tpu.main import main
    base = str(tmp_path_factory.mktemp("run_restore"))
    main(["--base-dir", base, "train", "--config-dir", tiny_ini])
    with open(os.path.join(base, "data", "train_log.csv")) as f:
        steps_before = [float(r["step"]) for r in csv.DictReader(f)]
    # same config with a doubled budget: the restored run must pick up
    # at the checkpointed step and train on to the new total
    cp = configparser.ConfigParser()
    cp.read(tiny_ini)
    cp["TRAIN_CONFIG"]["total_step"] = str(
        2 * int(cp["TRAIN_CONFIG"]["total_step"]))
    bigger = os.path.join(os.path.dirname(tiny_ini), "bigger.ini")
    with open(bigger, "w") as f:
        cp.write(f)
    main(["--base-dir", base, "train", "--config-dir", bigger,
          "--restore"])
    with open(os.path.join(base, "data", "train_log.csv")) as f:
        steps_after = [float(r["step"]) for r in csv.DictReader(f)]
    assert len(steps_after) > len(steps_before)
    assert max(steps_after) > max(steps_before)
    # resumed, not restarted: the new rows continue past the checkpoint
    assert min(s for s in steps_after
               if s not in steps_before) > max(steps_before)

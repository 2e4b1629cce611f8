"""CLI / experiment driver (reference main.py; SURVEY.md section 2.2
item 1): ``train`` and ``evaluate`` subcommands over .ini config files.

    python -m deeprl_network_tpu.main train \
        --config-dir configs/config_ma2c_nc_grid.ini --base-dir /tmp/run
    python -m deeprl_network_tpu.main evaluate \
        --base-dir /tmp/run --evaluation-seeds 2000,2500,3000
"""

from __future__ import annotations

import argparse
import glob
import logging
import os

import jax

from deeprl_network_tpu.config import Config, load_config, save_config
from deeprl_network_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()
from deeprl_network_tpu.envs.base import Env
from deeprl_network_tpu.utils.logging import init_dir, init_log
from deeprl_network_tpu.utils.rollout import make_a2c
from deeprl_network_tpu.utils.trainer import Evaluator, Trainer

log = logging.getLogger(__name__)


def init_env(config: Config, naive_policy: bool = False) -> Env:
    """Dispatch on scenario (reference main.py init_env ~L40)."""
    scenario = config.env.scenario
    if scenario.startswith("cacc"):
        from deeprl_network_tpu.envs.cacc import CACCEnv
        return CACCEnv(config.env)
    if scenario in ("large_grid", "grid"):
        from deeprl_network_tpu.envs.grid import LargeGridEnv
        return LargeGridEnv(config.env)
    if scenario in ("real_net", "monaco"):
        from deeprl_network_tpu.envs.monaco import RealNetEnv
        return RealNetEnv(config.env)
    raise ValueError(f"unknown scenario {scenario}")


def init_agent(env: Env, config: Config, num_envs=None, axis_name=None):
    """Build the fused A2C functions (reference main.py init_agent ~L60)."""
    return make_a2c(env, config.model, config.train, agent=config.agent,
                    num_envs=num_envs, axis_name=axis_name)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base-dir", required=True, help="experiment dir")
    sub = p.add_subparsers(dest="option", required=True)
    t = sub.add_parser("train")
    t.add_argument("--config-dir", required=True, help=".ini config path")
    t.add_argument("--restore", action="store_true")
    t.add_argument("--test-mode", default="no_test",
                   choices=["no_test", "in_train_test"])
    t.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler device trace at startup")
    t.add_argument("--single-device", action="store_true",
                   help="disable automatic data-parallel sharding over "
                        "the device mesh when multiple devices are "
                        "visible")
    e = sub.add_parser("evaluate")
    e.add_argument("--config-dir", default=None,
                   help="defaults to the snapshot in base-dir/data")
    e.add_argument("--agents", default=None,
                   help="comma list of run subdirectories under base-dir "
                        "to evaluate in turn (reference main.py evaluate "
                        "--agents); default: base-dir itself is the run")
    e.add_argument("--evaluation-seeds", default="2000,2500,3000")
    e.add_argument("--demo", action="store_true")
    e.add_argument("--naive", action="store_true",
                   help="evaluate the env's greedy controller baseline "
                        "(reference naive_policy path)")
    return p.parse_args(argv)


def train(args) -> None:
    dirs = init_dir(args.base_dir)
    init_log(dirs["log"])
    config = load_config(args.config_dir)
    save_config(config, os.path.join(dirs["data"],
                                     os.path.basename(args.config_dir)))
    env = init_env(config)
    n_dev = jax.device_count()
    if n_dev > 1 and not getattr(args, "single_device", False):
        # shard the env batch over the device mesh (config num_envs is
        # the GLOBAL batch and must divide by the mesh size), params
        # replicated, grads reduced over ICI
        from deeprl_network_tpu.parallel.train import make_parallel_a2c
        fns = make_parallel_a2c(env, config.model, config.train,
                                agent=config.agent)
        log.info("data-parallel over %d devices (%d envs/device)",
                 fns.mesh.devices.size,
                 config.model.num_envs // fns.mesh.devices.size)
    else:
        fns = init_agent(env, config)
    log.info("agent=%s scenario=%s n_agent=%d devices=%s",
             config.agent, config.scenario, env.n_agent, jax.devices())
    trainer = Trainer(fns, config, args.base_dir, seed=config.env.seed,
                      profile=args.profile,
                      in_train_test=args.test_mode == "in_train_test")
    trainer.run(restore=args.restore)


def evaluate(args) -> None:
    if args.agents:
        import copy
        for name in args.agents.split(","):
            if not name.strip():
                continue
            sub_args = copy.copy(args)
            sub_args.agents = None
            sub_args.base_dir = os.path.join(args.base_dir, name.strip())
            evaluate(sub_args)
        return
    init_log(None)
    cfg_path = args.config_dir
    if cfg_path is None:
        cands = glob.glob(os.path.join(args.base_dir, "data", "*.ini"))
        if not cands:
            raise FileNotFoundError("no config snapshot in base-dir/data")
        cfg_path = cands[0]
    config = load_config(cfg_path)
    env = init_env(config)
    fns = init_agent(env, config)
    seeds = [int(s) for s in args.evaluation_seeds.split(",")]
    out_dir = os.path.join(args.base_dir, "eva_data")
    eval_kw = dict(seeds=seeds, demo=args.demo, scenario=config.scenario,
                   control_interval_sec=config.env.control_interval_sec)
    if args.naive:
        # greedy-controller baseline, no model needed (reference
        # main.py init_env(naive_policy=True) + greedy controllers)
        Evaluator(fns, out_dir, policy="controller", agent="greedy",
                  **eval_kw).run(None)
        return
    from deeprl_network_tpu.utils.checkpoint import CheckpointManager
    ts = fns.init_state(jax.random.key(config.env.seed))
    # params-only restore: works on checkpoints from single-device AND
    # data-parallel runs (whose env-batch shapes differ from this ts)
    ckpt = CheckpointManager(os.path.join(args.base_dir, "model"))
    params = ckpt.restore_params(ts.params)
    if params is None:
        raise FileNotFoundError("no checkpoint found under base-dir/model")
    Evaluator(fns, out_dir, agent=config.agent, **eval_kw).run(params)


def main(argv=None):
    args = parse_args(argv)
    # multi-host: wire the hosts into one jax runtime BEFORE any device
    # use (no-op unless pod-slice env vars / explicit args are present)
    from deeprl_network_tpu.parallel.distributed import maybe_initialize
    maybe_initialize()
    if args.option == "train":
        train(args)
    else:
        evaluate(args)


if __name__ == "__main__":
    main()

"""Multi-device smoke tests on the 8-virtual-CPU mesh (SURVEY.md
Appendix C test 5): sharded env batch, replicated params, grads identical
to an equivalent single-device run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeprl_network_tpu.config import EnvConfig, ModelConfig, TrainConfig
from deeprl_network_tpu.envs.cacc import CACCEnv
from deeprl_network_tpu.parallel.train import make_mesh, make_parallel_a2c


def cfgs():
    ecfg = EnvConfig(scenario="cacc_catchup", coop_gamma=0.9,
                     episode_length=40)
    mcfg = ModelConfig(batch_size=8, num_fc=16, num_lstm=16, num_envs=8)
    tcfg = TrainConfig(total_step=10_000)
    return ecfg, mcfg, tcfg


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_parallel_train_step_runs():
    ecfg, mcfg, tcfg = cfgs()
    env = CACCEnv(ecfg)
    par = make_parallel_a2c(env, mcfg, tcfg, agent="ma2c_nc")
    ts = par.init_state(jax.random.key(0))
    # global env batch = envs_per_device * n_devices
    assert ts.obs.shape[0] == 8
    ts, metrics = par.train_step(ts)
    assert np.isfinite(float(metrics["loss"]))
    # step counts all replicas' env steps
    assert int(ts.step) == 8 * mcfg.batch_size


def test_params_stay_replicated_and_envs_differ():
    ecfg, mcfg, tcfg = cfgs()
    env = CACCEnv(ecfg)
    par = make_parallel_a2c(env, mcfg, tcfg, agent="ia2c")
    ts = par.init_state(jax.random.key(0))
    ts, _ = par.train_step(ts)
    # per-device param shards must be identical after an update
    w = ts.params.w_obs.w
    shards = [np.asarray(s.data) for s in w.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_allclose(shards[0], s, atol=0)
    # env states differ across devices (different PRNG streams)
    h = np.asarray(ts.env_state.env.h)
    assert not np.allclose(h[0], h[1])


@pytest.mark.parametrize("agent,levers", [
    ("ia2c", {}),
    ("ma2c_nc", {}),
    # the flagship lever set of the bench of record: sparse_comm
    # K-packing and remat inside the sharded scan must preserve the
    # same DP-equivalence (r5; the multichip dryrun compiles this path,
    # this pins its numerics)
    ("ma2c_nc", {"sparse_comm": True, "remat": True}),
])
def test_multi_device_update_equals_single_device(agent, levers):
    """SURVEY.md Appendix C test 5, the strong form: because every env's
    PRNG stream hangs off its GLOBAL index, the same 4-env batch on a
    4-device mesh and on a 1-device mesh rolls out bit-identical
    trajectories, and the pmean'd gradient update equals the
    single-device batch-mean update up to float reassociation."""
    ecfg, mcfg, tcfg = cfgs()
    mcfg = ModelConfig(**{**mcfg.__dict__, **levers})
    env = CACCEnv(ecfg)
    par1 = make_parallel_a2c(env, mcfg, tcfg, agent=agent,
                             mesh=make_mesh(n_devices=1),
                             envs_per_device=4)
    par4 = make_parallel_a2c(env, mcfg, tcfg, agent=agent,
                             mesh=make_mesh(n_devices=4),
                             envs_per_device=1)
    ts1 = par1.init_state(jax.random.key(7))
    ts4 = par4.init_state(jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(ts1.obs), np.asarray(ts4.obs))
    for _ in range(2):
        ts1, m1 = par1.train_step(ts1)
        ts4, m4 = par4.train_step(ts4)
    # identical trajectories => identical obs streams (bitwise)
    np.testing.assert_array_equal(np.asarray(ts1.obs), np.asarray(ts4.obs))
    np.testing.assert_allclose(float(m4["loss"]), float(m1["loss"]),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(ts4.params),
                    jax.tree.leaves(ts1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_restore_params_from_dp_checkpoint_into_single_device(tmp_path):
    """The stated purpose of restore_params (utils/checkpoint.py): a
    checkpoint written by a DATA-PARALLEL run (global env batch sharded
    over the 8-device mesh) restores into a single-device eval whose
    TrainState shapes differ — params land exactly, and eval runs."""
    from deeprl_network_tpu.envs.cacc import CACCEnv
    from deeprl_network_tpu.parallel.train import make_mesh, make_parallel_a2c
    from deeprl_network_tpu.utils.checkpoint import CheckpointManager
    from deeprl_network_tpu.utils.rollout import make_a2c

    env = CACCEnv(EnvConfig(scenario="cacc_catchup", episode_length=24))
    mcfg = ModelConfig(batch_size=8, num_fc=8, num_lstm=8, num_envs=8)
    tcfg = TrainConfig(total_step=10_000)
    par = make_parallel_a2c(env, mcfg, tcfg, agent="ma2c_nc",
                            mesh=make_mesh(jax.devices()))
    ts = par.init_state(jax.random.key(0))
    ts, _ = par.train_step(ts)
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(1, ts)

    single = make_a2c(env, ModelConfig(batch_size=8, num_fc=8, num_lstm=8,
                                       num_envs=2),
                      tcfg, agent="ma2c_nc")
    ts1 = single.init_state(jax.random.key(7))
    params = CheckpointManager(str(tmp_path)).restore_params(ts1.params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(ts.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    out = single.eval_episode(params, jax.random.key(3))
    assert np.isfinite(float(out["episode_return"]))

"""Multi-device / multi-host scale-out via shard_map over a device mesh.

The reference has NO distributed training (SURVEY.md section 2.1:
single process, single TF session, CPU; the only concurrency affordance is
a TraCI port for hand-run sweeps). The TPU-native design follows SURVEY.md
sections 5.8 / 7 step 6: env instances shard over the mesh ``data`` axis
(across chips and hosts), learner parameters stay replicated (the model is
~100k params — pure data parallelism is the right point in design space),
and the single fused train step (utils/rollout.py) runs under ``shard_map``
with one gradient ``pmean`` riding ICI per update. Multi-host execution
initializes via ``jax.distributed`` and uses the same code path.

Every env instance owns a PRNG stream derived from its GLOBAL index
(fold_in in rollout.init_state via env_offset = axis_index * per_dev);
parameters are initialized from the shared key so every replica starts
identical. Consequence: the same global env batch runs bit-identically
on any mesh size, and an N-device update equals the single-device update
on the combined batch up to float reassociation — both asserted by
tests/test_parallel.py.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from deeprl_network_tpu.config import ModelConfig, TrainConfig
from deeprl_network_tpu.models.policies import init_policy_params
from deeprl_network_tpu.utils.rollout import A2CFns, TrainState, make_a2c

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              n_devices: Optional[int] = None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


class ParallelA2C(NamedTuple):
    init_state: callable
    train_step: callable
    eval_episode: callable
    record_episode: callable
    fns: A2CFns          # underlying single-replica functions
    mesh: Mesh

    @property
    def spec(self):
        return self.fns.spec

    @property
    def steps_per_update(self):
        # already GLOBAL steps: make_a2c was given n_replicas = mesh size
        return self.fns.steps_per_update


def _state_specs(ts_shape) -> TrainState:
    """PartitionSpecs per TrainState field: params/opt_state/step
    replicated, everything per-env sharded on the data axis."""
    rep = lambda tree: jax.tree.map(lambda _: P(), tree)
    shard = lambda tree: jax.tree.map(lambda _: P(DATA_AXIS), tree)
    return TrainState(
        params=rep(ts_shape.params),
        opt_state=rep(ts_shape.opt_state),
        env_state=shard(ts_shape.env_state),
        obs=P(DATA_AXIS), fp=P(DATA_AXIS),
        carry=shard(ts_shape.carry),
        prev_done=P(DATA_AXIS), key=P(DATA_AXIS),
        step=P(),
        ep_ret=P(DATA_AXIS), ep_len=P(DATA_AXIS),
        last_ep_ret=P(DATA_AXIS), last_ep_len=P(DATA_AXIS))


def make_parallel_a2c(env, mcfg: ModelConfig, tcfg: TrainConfig,
                      agent: str, mesh: Optional[Mesh] = None,
                      envs_per_device: Optional[int] = None) -> ParallelA2C:
    """Data-parallel A2C over ``mesh``; total batch =
    envs_per_device * mesh size."""
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    if envs_per_device is None:
        if mcfg.num_envs % n_dev != 0:
            raise ValueError(
                f"num_envs={mcfg.num_envs} (the GLOBAL env batch) must be "
                f"divisible by the mesh size {n_dev}; pick a multiple or "
                f"pass envs_per_device explicitly")
        per_dev = mcfg.num_envs // n_dev
    else:
        per_dev = envs_per_device
    fns = make_a2c(env, mcfg, tcfg, agent=agent, num_envs=per_dev,
                   axis_name=DATA_AXIS, n_replicas=n_dev, jit=False)

    # shapes for spec construction (abstract eval only, no compute)
    ts_shape = jax.eval_shape(
        lambda k: fns.init_state(k, params=None), jax.random.key(0))
    specs = _state_specs(ts_shape)

    def _init(key):
        # params from the shared key (identical on every replica); env
        # streams are per-GLOBAL-env-index (env_offset), so the same
        # global batch runs bit-identically on any mesh size
        params = init_policy_params(key, fns.spec)
        offset = jax.lax.axis_index(DATA_AXIS) * per_dev
        return fns.init_state(key, params=params, env_offset=offset)

    init_sm = jax.jit(jax.shard_map(
        _init, mesh=mesh, in_specs=P(), out_specs=specs))

    step_sm = jax.jit(jax.shard_map(
        fns.train_step, mesh=mesh, in_specs=(specs,),
        out_specs=(specs, P())), donate_argnums=0)

    def init_state(key: jax.Array) -> TrainState:
        return init_sm(key)

    def train_step(ts: TrainState):
        return step_sm(ts)

    # make_a2c was built with jit=False (train_step is jitted through
    # shard_map above); the single-episode eval paths still want jit
    return ParallelA2C(
        init_state=init_state, train_step=train_step,
        eval_episode=jax.jit(fns.eval_episode, static_argnums=(2, 3)),
        record_episode=jax.jit(fns.record_episode, static_argnums=(2, 3)),
        fns=fns, mesh=mesh)

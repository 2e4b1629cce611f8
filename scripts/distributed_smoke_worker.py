"""Worker process for the 2-process jax.distributed CPU smoke test
(SURVEY.md section 7 step 6 / Appendix C test 5; VERDICT r4 Missing #3).

Launched (twice) by tests/test_distributed.py with JAX_PLATFORMS=cpu and
--xla_force_host_platform_device_count=4 in the environment, so the two
processes form one 8-device global runtime through the coordination
service — the ACTUAL cross-process code path (`maybe_initialize`,
process-spanning shard_map collectives, multi-process orbax save/restore)
that single-process mesh tests cannot reach.

    python scripts/distributed_smoke_worker.py <pid> <nproc> <coord> \
        <out_npz> <ckpt_dir>

Writes (process 0 only) an .npz with the final loss, step count and the
flattened replicated params; both processes participate in the orbax
save + restore round-trip.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coord, out_npz, ckpt_dir = sys.argv[3], sys.argv[4], sys.argv[5]

    from deeprl_network_tpu.parallel.distributed import (
        is_primary, maybe_initialize,
    )

    ok = maybe_initialize(coordinator_address=coord, num_processes=nproc,
                          process_id=pid)
    assert ok, "maybe_initialize returned False with explicit args"
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid, jax.process_index()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 8, jax.device_count()
    assert is_primary() == (pid == 0)

    from deeprl_network_tpu.config import (
        EnvConfig, ModelConfig, TrainConfig,
    )
    from deeprl_network_tpu.envs.cacc import CACCEnv
    from deeprl_network_tpu.parallel.train import make_parallel_a2c
    from deeprl_network_tpu.utils.checkpoint import CheckpointManager

    env = CACCEnv(EnvConfig(scenario="cacc_catchup", coop_gamma=0.9))
    mcfg = ModelConfig(batch_size=8, num_envs=8, num_fc=16, num_lstm=16,
                       reward_norm=1000.0)
    tcfg = TrainConfig(total_step=10_000)
    par = make_parallel_a2c(env, mcfg, tcfg, agent="ma2c_nc")
    ts = par.init_state(jax.random.key(0))
    for _ in range(3):
        ts, metrics = par.train_step(ts)
    loss = float(jax.device_get(metrics["loss"]))

    # multi-process orbax round-trip: BOTH processes write/read shards
    ckpt = CheckpointManager(ckpt_dir)
    ckpt.save(int(jax.device_get(ts.step)), ts)
    restored = ckpt.restore(ts)
    assert restored is not None
    for a, b in zip(jax.tree.leaves(jax.device_get(restored.params)),
                    jax.tree.leaves(jax.device_get(ts.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    if is_primary():
        flat = {f"p{i}": np.asarray(jax.device_get(l))
                for i, l in enumerate(jax.tree.leaves(ts.params))}
        np.savez(out_npz, loss=np.float64(loss),
                 step=np.int64(jax.device_get(ts.step)), **flat)
    # all processes must stay alive until the collectives + orbax
    # barrier complete; shutdown tears the coordination service down
    jax.distributed.shutdown()
    print(f"worker {pid}: ok, loss {loss:.6f}")


if __name__ == "__main__":
    main()

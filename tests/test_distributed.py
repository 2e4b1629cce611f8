"""2-process jax.distributed CPU smoke (SURVEY.md section 7 step 6,
Appendix C test 5; VERDICT r4 Missing #3).

Every other multi-device claim in this suite runs in ONE process on a
forced 8-device CPU mesh; this test actually exercises the cross-process
path: two subprocesses (4 CPU devices each) join through
``maybe_initialize`` into one 8-device runtime, run the full
data-parallel fused train step (shard_map collectives spanning the
process boundary), round-trip a multi-process orbax checkpoint, and the
resulting replicated params must match the single-process 8-device run
of the identical global batch.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "distributed_smoke_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_matches_single_process(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    out_npz = str(tmp_path / "proc0.npz")
    ckpt_dir = str(tmp_path / "ckpt")
    env = dict(os.environ)
    # fresh CPU-only JAX in the workers: 4 virtual devices each, no axon
    # (sitecustomize only registers the axon backend when the pool vars
    # are present)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", coord, out_npz,
             ckpt_dir],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid}: ok" in out
    assert os.path.exists(out_npz), "primary wrote no result"
    # both processes wrote orbax shards into the shared checkpoint dir
    assert os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir)

    got = np.load(out_npz)

    # identical run, single process, same 8-device global mesh/batch
    import jax

    from deeprl_network_tpu.config import (
        EnvConfig, ModelConfig, TrainConfig,
    )
    from deeprl_network_tpu.envs.cacc import CACCEnv
    from deeprl_network_tpu.parallel.train import make_parallel_a2c

    envo = CACCEnv(EnvConfig(scenario="cacc_catchup", coop_gamma=0.9))
    mcfg = ModelConfig(batch_size=8, num_envs=8, num_fc=16, num_lstm=16,
                       reward_norm=1000.0)
    tcfg = TrainConfig(total_step=10_000)
    par = make_parallel_a2c(envo, mcfg, tcfg, agent="ma2c_nc")
    ts = par.init_state(jax.random.key(0))
    for _ in range(3):
        ts, metrics = par.train_step(ts)

    assert int(got["step"]) == int(jax.device_get(ts.step))
    np.testing.assert_allclose(float(got["loss"]),
                               float(jax.device_get(metrics["loss"])),
                               rtol=1e-4)
    leaves = jax.tree.leaves(jax.device_get(ts.params))
    assert len(leaves) == sum(1 for k in got.files if k.startswith("p"))
    for i, leaf in enumerate(leaves):
        # cross-process psum may reassociate differently than the
        # single-process reduction; tolerance, not bit-equality
        np.testing.assert_allclose(np.asarray(got[f"p{i}"]),
                                   np.asarray(leaf), rtol=2e-4, atol=2e-6,
                                   err_msg=f"params leaf {i}")

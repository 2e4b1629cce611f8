"""Host-side training orchestration: Counter, Trainer, Evaluator.

Rebuild of the reference ``utils.py`` L4 layer (SURVEY.md section 2.2
item 2). The reference Trainer ran the env-step loop on the host; here the
entire n_step x B rollout + update is one device call (utils/rollout.py),
so this layer only sequences device calls, periodic evaluation on held-out
seeds, metric csv/jsonl output, and checkpoints.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict

import jax
import numpy as np

from deeprl_network_tpu.config import Config
from deeprl_network_tpu.utils.checkpoint import CheckpointManager
from deeprl_network_tpu.utils.logging import MetricWriter, init_dir
from deeprl_network_tpu.utils.rollout import A2CFns, TrainState

log = logging.getLogger(__name__)


class Counter:
    """Global step bookkeeping (reference utils.py Counter ~L20)."""

    def __init__(self, total_step: int, test_step: int, log_step: int):
        self.total_step = total_step
        self.test_step = test_step
        self.log_step = log_step
        self.cur_step = 0
        self._next_test = test_step
        self._next_log = log_step

    def update(self, n: int) -> int:
        self.cur_step += n
        return self.cur_step

    def fast_forward(self, step: int) -> None:
        """Jump to ``step`` (checkpoint restore) and ratchet the log/test
        thresholds past it — otherwise every post-resume update would
        fire should_log/should_test until the one-interval-per-call
        advance catches up."""
        self.cur_step = step
        self._next_test = (step // self.test_step + 1) * self.test_step
        self._next_log = (step // self.log_step + 1) * self.log_step

    def should_test(self) -> bool:
        if self.cur_step >= self._next_test:
            self._next_test += self.test_step
            return True
        return False

    def should_log(self) -> bool:
        if self.cur_step >= self._next_log:
            self._next_log += self.log_step
            return True
        return False

    def should_stop(self) -> bool:
        return self.cur_step >= self.total_step


class Trainer:
    """Sequences fused device train steps; logs and checkpoints.

    reference: utils.py Trainer.run (~L170) — explore/backward collapse
    into fns.train_step; perform() becomes fns.eval_episode.
    """

    def __init__(self, fns: A2CFns, cfg: Config, output_dir: str,
                 seed: int = 0, profile: bool = False,
                 in_train_test: bool = True):
        self.fns = fns
        self.cfg = cfg
        self.profile = profile
        # reference --test-mode: periodic held-out-seed evaluation episodes
        # during training (utils.py Tester); off under 'no_test'
        self.in_train_test = in_train_test
        self.dirs = init_dir(output_dir)
        self.counter = Counter(cfg.train.total_step,
                               cfg.train.test_interval,
                               cfg.train.log_interval)
        # csv/jsonl plus TensorBoard scalars under log/ (the reference's
        # TF1 summary_writer surface)
        self.train_writer = MetricWriter(self.dirs["data"], "train_log",
                                         tb_dir=self.dirs["log"])
        self.test_writer = MetricWriter(self.dirs["data"], "test_log",
                                        tb_dir=self.dirs["log"])
        self.ckpt = CheckpointManager(self.dirs["model"])
        self.seed = seed
        # multi-host: only process 0 writes metrics/logs/evals; orbax
        # checkpoint saves still run on every process (see run())
        from deeprl_network_tpu.parallel.distributed import is_primary
        self.primary = is_primary()

    def run(self, restore: bool = False) -> TrainState:
        ts = self.fns.init_state(jax.random.key(self.seed))
        if restore:
            restored = self.ckpt.restore(ts)
            if restored is not None:
                ts = restored
                self.counter.fast_forward(int(ts.step))
                log.info("restored checkpoint at step %d", self.counter.cur_step)
        if self.profile:
            # device trace of a few steady-state updates (SURVEY.md
            # section 5 item 1: jax.profiler replaces the reference's
            # wall-clock-only dt logging); view with tensorboard/xprof
            ts, _ = self.fns.train_step(ts)  # warmup/compile
            with jax.profiler.trace(self.dirs["log"]):
                for _ in range(3):
                    ts, m = self.fns.train_step(ts)
                jax.block_until_ready(m["loss"])
            log.info("profiler trace written to %s", self.dirs["log"])
        t0 = time.time()
        window_metrics = []
        last_step, last_t = self.counter.cur_step, t0
        while not self.counter.should_stop():
            prev = self.counter.cur_step
            ts, metrics = self.fns.train_step(ts)
            self.counter.update(int(ts.step) - prev)
            window_metrics.append(metrics)
            if self.counter.should_log():
                m = {k: float(np.mean([np.asarray(w[k]) for w in
                                       window_metrics]))
                     for k in window_metrics[-1]}
                now = time.time()
                sps = (self.counter.cur_step - last_step) / max(
                    now - last_t, 1e-9)
                last_step, last_t = self.counter.cur_step, now
                if self.primary:
                    row = {"step": self.counter.cur_step,
                           "wall_s": now - t0, "env_steps_per_s": sps, **m}
                    self.train_writer.write(row)
                    log.info(
                        "step %d | R_ep %.1f | loss %.3f | sps %.0f",
                        self.counter.cur_step, m.get("episode_return", 0.0),
                        m["loss"], sps)
                window_metrics = []
                # checkpoint save must run on EVERY process (orbax
                # coordinates sharded-array writes across hosts)
                self.ckpt.save(self.counter.cur_step, ts)
            if (self.counter.should_test() and self.in_train_test
                    and self.primary):
                self.test(ts)
        self.ckpt.save(self.counter.cur_step, ts)
        return ts

    def test(self, ts: TrainState) -> Dict[str, float]:
        rows = []
        for s in self.cfg.env.test_seeds:
            # sampled policy, matching the reference's perform()/Evaluator
            # (actions drawn from pi host-side; SURVEY.md section 3.3)
            out = self.fns.eval_episode(ts.params, jax.random.key(int(s)),
                                        None, False)
            rows.append({k: float(v) for k, v in out.items()})
        avg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
        avg["step"] = self.counter.cur_step
        self.test_writer.write(avg)
        log.info("test @ %d: episode_return %.1f", self.counter.cur_step,
                 avg["episode_return"])
        return avg


class Evaluator:
    """Seed-swept evaluation of a trained policy (reference utils.py
    Evaluator ~L230): per-seed episode metrics plus per-step measurement
    series csvs (reference env.init_data/collect_tripinfo/output_data)."""

    def __init__(self, fns: A2CFns, output_dir: str, seeds=(2000, 2500, 3000),
                 demo: bool = False, policy: str = "sample",
                 record: bool = True):
        self.fns = fns
        self.out_dir = output_dir
        self.writer = MetricWriter(output_dir, "eval_log")
        self.seeds = seeds
        self.policy = policy
        # reference --demo replays the episode in the SUMO GUI; the
        # in-XLA engine has no GUI, so demo guarantees the full per-step
        # series csvs are written for offline replay/plotting instead
        self.record = record or demo
        if demo:
            log.info("--demo: no GUI in the in-XLA engine; writing full "
                     "per-step series csvs for offline replay")

    def run(self, params) -> Dict[str, float]:
        import csv
        rows = []
        for s in self.seeds:
            seq = self.fns.record_episode(params, jax.random.key(int(s)),
                                          None, self.policy)
            seq = {k: np.asarray(v) for k, v in seq.items()}
            alive = seq.pop("alive")
            steps = int(alive.sum())
            ep_ret = float((seq["reward"].sum(-1) * alive).sum())
            row = {"seed": int(s), "episode_return": ep_ret,
                   "episode_len": steps}
            for k, v in seq.items():
                if v.ndim >= 1 and k != "action":
                    row[f"avg_{k}"] = float(np.mean(v[:steps]))
            self.writer.write(row)
            rows.append(row)
            if self.record:
                self._write_series(s, seq, steps)
        avg = {k: float(np.mean([r[k] for r in rows]))
               for k in rows[0] if k != "seed"}
        log.info("eval over %d seeds: %s", len(self.seeds), avg)
        return avg

    def _write_series(self, seed: int, seq, steps: int) -> None:
        """Per-step csv, per-agent columns flattened (reference
        {scenario}_{agent}_traffic.csv / platoon csv schema)."""
        import csv as _csv
        path = os.path.join(self.out_dir, f"episode_seed{seed}.csv")
        cols, data = [], []
        for k, v in seq.items():
            v = v[:steps]
            if v.ndim == 1:
                cols.append(k)
                data.append(v[:, None])
            else:
                flat = v.reshape(steps, -1)
                cols.extend(f"{k}_{i}" for i in range(flat.shape[1]))
                data.append(flat)
        mat = np.concatenate(data, axis=1)
        with open(path, "w", newline="") as f:
            w = _csv.writer(f)
            w.writerow(["step"] + cols)
            for t in range(steps):
                w.writerow([t] + [f"{x:.4f}" for x in mat[t]])

"""ctypes bindings for the native store-and-forward oracle.

``native/sfq_oracle.cpp`` is an independent C++ implementation of the
:mod:`deeprl_network_tpu.envs.network` dynamics (which themselves replace
the reference's SUMO + envs/atsc_env.py TrafficSimulator stack — SURVEY.md
section 2.2 item 6). Two uses:

1. **Cross-validation oracle**: tests/test_native_oracle.py rolls the XLA
   program and this C++ engine over the same topology/actions and demands
   agreement — two implementations of one spec catch each other's bugs.
2. **Host-side baseline engine**: a reference-style single-env loop with
   zero JAX dispatch overhead (bench.py's honest CPU baseline).

The shared library is built on demand with ``g++ -O2`` (no pip deps; the
toolchain is assumed, matching the repo's no-install policy) and cached
next to the source keyed on mtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "sfq_oracle.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libsfq_oracle.so")

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

_lib_cache = None


def build_library(force: bool = False) -> str:
    """Compile the oracle .so if missing or stale; return its path."""
    stale = (not os.path.exists(_LIB)
             or os.path.getmtime(_LIB) < os.path.getmtime(_SRC))
    if force or stale:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True, capture_output=True, text=True)
    return _LIB


def _load():
    global _lib_cache
    if _lib_cache is not None:
        return _lib_cache
    lib = ctypes.CDLL(build_library())
    fn = lib.sfq_rollout
    fn.restype = None
    fn.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,       # L, M, P
        _f32p, _i32p, _f32p, _f32p, _f32p, ctypes.c_int,  # gate..demand,Td
        _f32p,                                          # node_lane_mask
        _i32p, ctypes.c_int,                            # lane_delay, D
        ctypes.c_float, ctypes.c_float,                 # cap, sat_flow
        ctypes.c_int, ctypes.c_int, ctypes.c_int,       # intervals, steps
        _f32p, _f32p, _i32p,                            # queue,transit,head
        _f32p, _i32p, _i32p, _f32p,                     # wait..dropped
        _i32p, ctypes.c_int,                            # actions, n_steps
        _f32p, _f32p, _f32p, _u8p,                      # outputs
    ]
    _lib_cache = fn
    return fn


class NativeNetworkOracle:
    """Stateful host-side twin of :class:`TrafficNetworkEnv`.

    Mirrors reset/step semantics; `rollout(actions)` advances many control
    steps in one native call and returns per-step node aggregates.
    """

    def __init__(self, env):
        # env: TrafficNetworkEnv (grid or monaco scenario)
        self.cfg = env.cfg
        topo = env.topo
        self.topo = topo
        self.L = topo.n_lane
        self.M = topo.n_node
        self.P = topo.phase_gate.shape[1]
        self.episode_steps = env.episode_steps
        self._gate = np.ascontiguousarray(topo.phase_gate, np.float32)
        self._n_valid = np.ascontiguousarray(
            topo.phase_valid.sum(1), np.int32)
        self._route = np.ascontiguousarray(topo.route, np.float32)
        self._entry = np.ascontiguousarray(topo.entry_lane, np.float32)
        self._demand = np.ascontiguousarray(topo.demand, np.float32)
        self._node_lane_mask = np.ascontiguousarray(
            env._node_lane_mask, np.float32)
        delay = (topo.lane_delay if topo.lane_delay is not None
                 else np.ones(self.L))
        self._lane_delay = np.ascontiguousarray(
            np.clip(delay, 1, None), np.int32)
        self.D = int(self._lane_delay.max())
        self._fn = _load()
        self.reset()

    def reset(self, queue0: np.ndarray | None = None) -> None:
        self.queue = (np.zeros(self.L, np.float32) if queue0 is None
                      else np.ascontiguousarray(queue0, np.float32).copy())
        self.transit = np.zeros((self.D, self.L), np.float32)
        self.head = np.zeros(1, np.int32)
        self.wait = np.zeros(self.L, np.float32)
        self.prev_phase = np.zeros(self.M, np.int32)
        self.t = np.zeros(1, np.int32)
        self.dropped = np.zeros(1, np.float32)

    def rollout(self, actions: np.ndarray) -> Dict[str, np.ndarray]:
        """actions: [n_steps, M] int -> per-step aggregates + rewards."""
        actions = np.ascontiguousarray(actions, np.int32)
        n_steps = actions.shape[0]
        node_queue = np.empty((n_steps, self.M), np.float32)
        node_wait = np.empty((n_steps, self.M), np.float32)
        flow = np.empty(n_steps, np.float32)
        done = np.empty(n_steps, np.uint8)
        c = self.cfg
        self._fn(self.L, self.M, self.P,
                 self._gate, self._n_valid, self._route, self._entry,
                 self._demand, self._demand.shape[0],
                 self._node_lane_mask,
                 self._lane_delay, self.D,
                 np.float32(c.lane_capacity), np.float32(c.sat_flow),
                 int(c.control_interval_sec), int(c.yellow_interval_sec),
                 int(self.episode_steps),
                 self.queue, self.transit, self.head,
                 self.wait, self.prev_phase, self.t,
                 self.dropped,
                 actions, n_steps,
                 node_queue, node_wait, flow, done)
        if c.objective == "queue":
            reward = -node_queue
        elif c.objective == "wait":
            reward = -node_wait
        else:
            reward = -(node_queue + c.coef_wait * node_wait)
        return {"node_queue": node_queue, "node_wait": node_wait,
                "reward": reward, "throughput": flow,
                "done": done.astype(bool),
                "dropped": float(self.dropped[0])}

    def step(self, action: np.ndarray) -> Tuple[np.ndarray, np.ndarray,
                                                bool, Dict[str, float]]:
        """Single control step (reference env.step surface)."""
        out = self.rollout(np.asarray(action, np.int32)[None])
        info = {"avg_queue": float(out["node_queue"][0].mean()),
                "avg_wait": float(out["node_wait"][0].mean()),
                "throughput": float(out["throughput"][0])}
        return out["node_queue"][0], out["reward"][0], bool(
            out["done"][0]), info

    @property
    def transit_aligned(self) -> np.ndarray:
        """Ring buffer re-based so row d arrives after d+1 substeps —
        the JAX NetworkState.transit layout (which shifts instead)."""
        return np.roll(self.transit, -int(self.head[0]), axis=0)

    def greedy_action(self, on: str = "wave") -> np.ndarray:
        """Max-demand-serving valid phase (reference greedy controllers);
        'wave' scores queued + in-transit, 'queue' stop-line queues only
        (mirrors TrafficNetworkEnv.greedy_action)."""
        x = self.queue if on == "queue" else self.queue + self.transit.sum(0)
        served = np.einsum("mpl,l->mp", self._gate, x)
        valid = self.topo.phase_valid > 0
        served = np.where(valid, served, -np.inf)
        return np.argmax(served, axis=-1).astype(np.int32)

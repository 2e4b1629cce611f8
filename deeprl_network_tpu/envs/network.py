"""SUMO-free traffic-signal network engine: store-and-forward queue/flow
dynamics as a pure JAX step function.

This is the TPU-native replacement for the reference L0/L1 stack
(envs/atsc_env.py TrafficSimulator + the external SUMO microsimulator over
TraCI; SURVEY.md sections 0, 2.2 item 6, call stack 3.1). The reference's
per-control-step protocol — set yellow phase, simulate yellow seconds, set
green, 1-second ``traci.simulationStep`` loop with measurement — becomes a
``lax.scan`` over 1-second substeps of vectorized per-lane queue updates;
thousands of network instances integrate in lockstep under ``vmap``.

Fidelity target (SURVEY.md section 7 step 5): *task-structure* equivalence
with the reference's ATSC tasks — same state semantics (per-lane "wave"
counts normalized by norm_wave, waiting time of the head vehicle), same
action semantics (choose one green phase per node per 5 s control
interval, 2 s yellow inserted on phase switches), same reward families
(queue / wait / hybrid), same neighbor/distance masks — NOT microscopic
trajectory equality, which died with SUMO by design.

Dynamics model (store-and-forward with link travel time and expected-space
spillback):
- every movement (approach lane group) is a stop-line queue q_l in
  [0, cap] plus an in-transit ring buffer: vehicles routed onto the link
  feeding lane l take ``lane_delay[l]`` seconds to traverse it before
  joining q_l (reference: SUMO vehicles physically take tens of seconds
  per link — envs/atsc_env.py TrafficSimulator ~L260. Round 1 transferred
  them instantaneously, which made the myopic greedy controller
  near-optimal and deleted the anticipation headroom the paper's learned
  controllers exploit; VERDICT round 1, Missing #1);
- when a lane's phase is green (and not in the yellow window after a
  switch) it discharges at saturation flow ``sat_flow`` veh/s, limited by
  the stop-line queue and by expected downstream space
  sum_l' R[l,l'] max(cap - occ_l', 0) where occ = queued + in-transit;
- discharged vehicles are routed by the static turn matrix R[l, l']
  (rows sum <= 1; the remainder exits the network) onto the downstream
  link's transit buffer;
- external demand arrives at entry lanes from a precomputed per-step
  schedule (the reference's time-varying peak_flow route patterns),
  entering the boundary link's transit buffer; demand that cannot enter a
  full link is dropped and counted;
- head-vehicle waiting time w_l accumulates every second a non-empty lane
  fails to discharge and resets when it discharges.

Observation ("wave") = ALL vehicles on the incoming lane — queued plus
in-transit — matching the reference's lane vehicle counts; the queue
reward counts STOPPED vehicles only (reference halting-number reward).
The gap between the two is what anticipatory control can exploit: an LSTM
controller sees platoons approaching ``lane_delay`` seconds before they
join the queue the reward charges for.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from deeprl_network_tpu.config import EnvConfig
from deeprl_network_tpu.envs.base import Env, EnvSpec, hop_distances


@dataclass
class NetworkTopology:
    """Static description assembled by a scenario builder (grid/monaco).

    All arrays are numpy; lanes are movement queues with global indices.
    """

    n_node: int
    lane_node: np.ndarray         # [L] owning node
    phase_gate: np.ndarray        # [M, P_max, L] {0,1} discharge gates
    phase_valid: np.ndarray       # [M, P_max] {0,1}
    route: np.ndarray             # [L, L] turn fractions (rows sum <= 1)
    entry_lane: np.ndarray        # [L] {0,1}
    demand: np.ndarray            # [T_episode, L] veh/s external arrivals
    node_adj: np.ndarray          # [M, M] {0,1}
    node_lanes: List[List[int]]   # per node, ordered incoming lane ids
    lane_delay: np.ndarray = None  # [L] int link travel seconds (>= 1)

    @property
    def n_lane(self) -> int:
        return len(self.lane_node)


@struct.dataclass
class NetworkState:
    queue: jax.Array       # [L] stop-line (halted) vehicles
    transit: jax.Array     # [D, L] in-transit ring buffer; row d joins the
                           # queue after d+1 more 1-second substeps
    wait: jax.Array        # [L] head-vehicle waiting seconds
    prev_phase: jax.Array  # [M] int32
    t: jax.Array           # [] control-step count int32
    done: jax.Array        # [] bool
    dropped: jax.Array     # [] veh lost to full entry lanes (diagnostic)


class TrafficNetworkEnv(Env):
    """Generic signalized network; scenario builders construct the
    :class:`NetworkTopology` (grid.py, monaco.py)."""

    def __init__(self, cfg: EnvConfig, topo: NetworkTopology):
        self.cfg = cfg
        self.topo = topo
        M = topo.n_node
        n_a_ls = tuple(int(v.sum()) for v in topo.phase_valid)
        max_lanes = max(len(ls) for ls in topo.node_lanes)
        self.max_lanes = max_lanes
        self._use_wait = cfg.objective in ("wait", "hybrid")
        self._use_phase = bool(getattr(cfg, "phase_in_obs", False))
        self._use_queue = bool(getattr(cfg, "queue_in_obs", False))
        P_max = topo.phase_gate.shape[1]
        n_chan = 1 + int(self._use_queue) + int(self._use_wait)
        base_ls = [len(ls) * n_chan for ls in topo.node_lanes]
        n_s_ls = tuple(b + (n_a_ls[m] if self._use_phase else 0)
                       for m, b in enumerate(base_ls))
        dist = hop_distances(topo.node_adj)
        self.spec = EnvSpec(
            n_agent=M, n_s_ls=n_s_ls, n_a_ls=n_a_ls,
            neighbor_mask=topo.node_adj.astype(np.float32),
            distance_mask=dist, coop_gamma=cfg.coop_gamma)
        # obs gather [M, n_s_max] into the concatenated feature vector
        # (channels [wave(L); queue(L)?; wait(L)?]): each node's features
        # are PACKED left-aligned — [wave_0..wave_{k-1}, (queue_*),
        # (wait_*), (phase one-hot), 0 pad] — so the first n_s_ls[i] dims
        # are exactly node i's valid features (heterogeneous Monaco nodes
        # included). Padded slots gather index 0 and are zero-masked.
        width = max_lanes * n_chan + (P_max if self._use_phase else 0)
        gather = np.zeros((M, width), np.int64)
        gmask = np.zeros((M, width), np.float32)
        L = topo.n_lane
        for m, ls in enumerate(topo.node_lanes):
            k = len(ls)
            chan = 0
            gather[m, :k] = ls
            gmask[m, :k] = 1.0
            if self._use_queue:
                chan += 1
                gather[m, chan * k:(chan + 1) * k] = [L + l for l in ls]
                gmask[m, chan * k:(chan + 1) * k] = 1.0
            if self._use_wait:
                chan += 1
                off = int(self._use_queue) * L
                gather[m, chan * k:(chan + 1) * k] = [L + off + l
                                                      for l in ls]
                gmask[m, chan * k:(chan + 1) * k] = 1.0
        self._gather = gather
        self._gmask = gmask
        if self._use_phase:
            # static placement of the current-phase one-hot right after
            # each node's packed lane features (phase_in_obs)
            pmat = np.zeros((M, P_max, width), np.float32)
            for m in range(M):
                for p in range(n_a_ls[m]):
                    pmat[m, p, base_ls[m] + p] = 1.0
            self._phase_place = pmat
        self._node_lane_mask = np.zeros((M, topo.n_lane), np.float32)
        for m, ls in enumerate(topo.node_lanes):
            self._node_lane_mask[m, ls] = 1.0
        self.episode_steps = cfg.episode_steps_atsc
        assert topo.demand.shape[0] >= self.episode_steps
        # link travel time: static per-lane delay -> a one-hot [D, L]
        # scatter map; pushing routed vehicles onto the transit buffer is
        # then a broadcast multiply-add (no dynamic scatter inside jit)
        delay = (topo.lane_delay if topo.lane_delay is not None
                 else np.ones(topo.n_lane))
        delay = np.clip(np.asarray(delay, np.int64), 1, None)
        self.max_delay = int(delay.max())
        onehot = np.zeros((self.max_delay, topo.n_lane), np.float32)
        onehot[delay - 1, np.arange(topo.n_lane)] = 1.0
        self._delay_onehot = onehot

    # ---- pure functions ----

    def reset(self, key: jax.Array) -> Tuple[NetworkState, jax.Array]:
        L = self.topo.n_lane
        q0 = jnp.zeros((L,), jnp.float32)
        if self.cfg.init_density > 0:
            q0 = (jax.random.uniform(key, (L,)) * self.cfg.init_density
                  * self.cfg.lane_capacity)
        state = NetworkState(
            queue=q0,
            transit=jnp.zeros((self.max_delay, L), jnp.float32),
            wait=jnp.zeros((L,), jnp.float32),
            prev_phase=jnp.zeros((self.topo.n_node,), jnp.int32),
            t=jnp.zeros((), jnp.int32), done=jnp.zeros((), bool),
            dropped=jnp.zeros((), jnp.float32))
        return state, self._obs(state)

    def _obs(self, s: NetworkState) -> jax.Array:
        c = self.cfg
        # "wave" = all vehicles on the incoming lane: queued + approaching
        # (reference lane vehicle-count state, _get_state ~L340)
        wave = s.queue + s.transit.sum(0)
        feats = jnp.clip(wave / c.norm_wave, 0.0, c.clip_wave)
        if self._use_queue:
            qn = jnp.clip(s.queue / c.norm_wave, 0.0, c.clip_wave)
            feats = jnp.concatenate([feats, qn])
        if self._use_wait:
            wt = jnp.clip(s.wait / c.norm_wait, 0.0, c.clip_wait)
            feats = jnp.concatenate([feats, wt])
        g = jnp.asarray(self._gather)
        gm = jnp.asarray(self._gmask)
        # packed per-agent: valid dims are the first n_s_ls[i] of each row
        out = (feats[g] * gm).astype(jnp.float32)
        if self._use_phase:
            onehot = jax.nn.one_hot(s.prev_phase,
                                    self.topo.phase_gate.shape[1])
            out = out + jnp.einsum("mp,mpw->mw", onehot,
                                   jnp.asarray(self._phase_place))
        return out

    def step(self, s: NetworkState, action: jax.Array
             ) -> Tuple[NetworkState, jax.Array, jax.Array, jax.Array,
                        Dict[str, jax.Array]]:
        """action: [M] int32 phase index per node."""
        c = self.cfg
        topo = self.topo
        gate_all = jnp.asarray(topo.phase_gate, jnp.float32)   # [M, P, L]
        route = jnp.asarray(topo.route, jnp.float32)
        entry = jnp.asarray(topo.entry_lane, jnp.float32)
        cap = c.lane_capacity

        # clamp invalid (padded) phases to 0
        n_valid = jnp.asarray(topo.phase_valid.sum(1).astype(np.int32))
        act = jnp.clip(action, 0, n_valid - 1)
        # green gate of the chosen phase, per lane: [L]
        lane_gate = jnp.einsum("mpl,mp->l", gate_all,
                               jax.nn.one_hot(act, gate_all.shape[1]))
        switched = (act != s.prev_phase).astype(jnp.float32)   # [M]
        # yellow window: lanes of switched nodes see no green for the
        # first yellow_interval_sec substeps (reference step ~L260)
        lane_switch = jnp.einsum("ml,m->l",
                                 jnp.asarray(self._node_lane_mask), switched)
        demand_t = jax.lax.dynamic_index_in_dim(
            jnp.asarray(topo.demand, jnp.float32),
            jnp.minimum(s.t, topo.demand.shape[0] - 1), keepdims=False)

        route_out = route.sum(1)                                # [L]
        delay_onehot = jnp.asarray(self._delay_onehot)          # [D, L]

        def substep(carry, k):
            q, transit, w, dropped = carry
            # vehicles finishing link traversal join the stop-line queue
            arriving = transit[0]
            transit = jnp.concatenate(
                [transit[1:], jnp.zeros_like(transit[:1])])
            q = q + arriving
            # arrivals past capacity (space was an expectation shared by
            # several upstream lanes, not a reserved budget) are counted
            # in `dropped` rather than destroyed silently
            overflow = jnp.maximum(q - cap, 0.0)
            q = q - overflow
            yellow = (k < c.yellow_interval_sec).astype(jnp.float32)
            g = lane_gate * (1.0 - yellow * lane_switch)       # [L]
            # downstream space counts queued AND in-transit occupancy
            occ = q + transit.sum(0)
            space = route @ jnp.maximum(cap - occ, 0.0)
            # lanes whose flow exits the network are never blocked
            space = jnp.where(route_out > 1e-6,
                              space / jnp.maximum(route_out, 1e-6), cap)
            dq = jnp.minimum(jnp.minimum(q, g * c.sat_flow), space)
            q2 = q - dq
            # routed vehicles enter the downstream link and arrive after
            # lane_delay[l'] substeps (one-hot scatter by static delay)
            routed = route.T @ dq
            transit = transit + delay_onehot * routed[None, :]
            # entry demand enters its boundary link, same travel delay
            inflow = demand_t * entry
            free = jnp.maximum(cap - (q2 + transit.sum(0)), 0.0)
            accepted = jnp.minimum(inflow, free)
            transit = transit + delay_onehot * accepted[None, :]
            dropped = dropped + jnp.sum(inflow - accepted) + jnp.sum(overflow)
            served = (dq > 1e-4).astype(jnp.float32)
            w2 = (w + 1.0) * (q2 > 0.1).astype(jnp.float32) * (1.0 - served)
            # arrived = vehicles leaving the network (non-routed fraction);
            # entered = demand actually admitted — the trip bookkeeping
            # behind the reference tripinfo outputs (eval artifact parity)
            arrived = jnp.sum(dq * jnp.maximum(1.0 - route_out, 0.0))
            return ((q2, transit, w2, dropped),
                    (jnp.sum(dq), arrived, jnp.sum(accepted)))

        # fully unrolled: control_interval_sec (=5) substeps fuse into one
        # XLA computation instead of a scan loop with per-iteration
        # dispatch overhead (the ops are tiny; trip-count overhead wins)
        ((q, transit, w, dropped),
         (flows, arrivals_out, entered_in)) = jax.lax.scan(
            substep, (s.queue, s.transit, s.wait, s.dropped),
            jnp.arange(c.control_interval_sec),
            unroll=c.control_interval_sec)

        t_new = s.t + 1
        done = t_new >= self.episode_steps
        s_new = NetworkState(queue=q, transit=transit, wait=w,
                             prev_phase=act, t=t_new,
                             done=done, dropped=dropped)
        node_mask = jnp.asarray(self._node_lane_mask)
        node_queue = node_mask @ q                              # [M]
        node_wait = node_mask @ w
        if c.objective == "queue":
            reward = -node_queue
        elif c.objective == "wait":
            reward = -node_wait
        else:  # hybrid
            reward = -(node_queue + c.coef_wait * node_wait)
        info = {"avg_queue": jnp.mean(node_queue),
                "avg_wait": jnp.mean(node_wait),
                "throughput": jnp.sum(flows),
                "arrived": jnp.sum(arrivals_out),
                "entered": jnp.sum(entered_in),
                "dropped": dropped}
        return s_new, self._obs(s_new), reward.astype(jnp.float32), done, info

    def record(self, s: NetworkState):
        """Per-step traffic series (reference _measure_traffic_step /
        output_data: queue/wait per node csv)."""
        node_mask = jnp.asarray(self._node_lane_mask)
        in_transit = s.transit.sum(0)
        return {"node_queue": node_mask @ s.queue,
                "node_wait": node_mask @ s.wait,
                "node_wave": node_mask @ (s.queue + in_transit),
                "total_queue": jnp.sum(s.queue),
                "total_transit": jnp.sum(in_transit),
                "dropped": s.dropped}

    # ---- greedy baseline (reference LargeGridController/RealNetController)

    def greedy_action(self, s: NetworkState, on: str = "wave",
                      delta: float = 0.0) -> jax.Array:
        """Pick, per node, the valid phase serving the largest demand
        (reference greedy controllers, SURVEY.md section 2.2 items 7-8).

        ``on='wave'`` scores phases by all vehicles on the served lanes
        (queued + approaching) — the reference controller's input, the
        same observation the learned policies get. ``on='queue'`` scores
        by stop-line queues only (serve only vehicles physically present).

        ``delta > 0`` adds HYSTERESIS: keep the current phase unless the
        best competing phase's score exceeds it by more than ``delta``
        vehicles — every switch buys ``yellow_interval_sec`` of lost
        discharge, so a small holding margin dominates the myopic argmax.
        Delta-swept on the 5x5 grid defaults (results/README.md):
        queue-scored delta=3 reaches -140k vs greedy argmax -277k. This is
        the strongest hand controller and the bar every "learned beats the
        baseline" claim in this repo compares against (VERDICT round 2,
        Missing #6)."""
        gate = jnp.asarray(self.topo.phase_gate, jnp.float32)
        valid = jnp.asarray(self.topo.phase_valid, jnp.float32)
        x = s.queue if on == "queue" else s.queue + s.transit.sum(0)
        served = jnp.einsum("mpl,l->mp", gate, x)
        served = jnp.where(valid > 0, served, -jnp.inf)
        best = jnp.argmax(served, axis=-1).astype(jnp.int32)
        if delta <= 0:
            return best
        prev = s.prev_phase.astype(jnp.int32)
        keep = jnp.take_along_axis(served, prev[:, None], 1)[:, 0]
        top = jnp.take_along_axis(served, best[:, None], 1)[:, 0]
        return jnp.where(top > keep + delta, best, prev).astype(jnp.int32)

    def controller_action(self, s: NetworkState) -> jax.Array:
        """The STRONGEST known hand controller for this env family:
        hysteresis at cfg.hysteresis_delta, scored on
        cfg.hysteresis_on ("queue" on the grid, "wave" on Monaco-28 —
        per-scenario delta/form sweeps in results/README.md). All naive /
        beats-baseline comparisons use this (plus the weaker greedy forms
        as diagnostics); it is also the kickstart teacher."""
        return self.greedy_action(s, on=str(self.cfg.hysteresis_on),
                                  delta=float(self.cfg.hysteresis_delta))

    def prev_action(self, s: NetworkState) -> jax.Array:
        """[M] previous control action (current signal phase) — used by
        training-only switch-cost shaping (ModelConfig.switch_penalty)."""
        return s.prev_phase

"""Typed configuration system, .ini-compatible with the reference configs.

The reference (main.py ~L80, SURVEY.md section 2.2 item 10) reads a
``configparser`` .ini file with three sections — ``[ENV_CONFIG]``,
``[MODEL_CONFIG]``, ``[TRAIN_CONFIG]`` — one file per (algorithm x scenario),
and snapshots the file into the run dir. We keep that surface: the same .ini
files load 1:1 here, but are parsed into typed frozen dataclasses so that
everything reaching jitted code is a static Python value.
"""

from __future__ import annotations

import configparser
import dataclasses
import os
from dataclasses import dataclass, field
from typing import Optional, Tuple


def _parse_scalar(v: str):
    s = v.strip()
    if s.lower() in ("true", "false"):
        return s.lower() == "true"
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    return s


def _parse_list(v: str, typ=float):
    return [typ(x) for x in v.replace(" ", "").split(",") if x != ""]


@dataclass(frozen=True)
class ModelConfig:
    """[MODEL_CONFIG] — reference agents/models.py + agents/policies.py knobs.

    Defaults follow SURVEY.md Appendix B (grid MA2C values, [M] confidence).
    """

    rmsp_alpha: float = 0.99
    rmsp_epsilon: float = 1e-5
    max_grad_norm: float = 40.0
    gamma: float = 0.99
    lr_init: float = 5e-4
    lr_min: float = 0.0
    lr_decay: str = "constant"  # constant | linear
    entropy_coef: float = 0.01
    entropy_decay: str = "constant"
    entropy_ratio: float = 0.5
    value_coef: float = 0.5
    num_lstm: int = 64
    num_fc: int = 64
    batch_size: int = 120  # n_step rollout length T
    reward_norm: float = 2000.0
    reward_clip: float = 2.0
    neighbor_obs: bool = False  # alpha-scaled neighbor observations in
                                # the policy input (reference atsc_env.py
                                # _get_state ~L340: MA2C variants see
                                # neighbor obs scaled by coop_gamma;
                                # SURVEY 2.2 item 6 [M]). Off by default:
                                # the r4 3-seed A/B (results/README.md
                                # "neighbor_obs A/B") measured ON ~+30%
                                # at 150M (every ON seed beats every OFF
                                # seed) but the 600M headline recipe
                                # reached -128k with OFF — ON is the
                                # budget-constrained accelerator, OFF
                                # the headline default.
    consensus_masked: bool = True  # shape-aware IA2C_CU weight consensus
                                # on heterogeneous graphs: actor-head
                                # columns / obs-embedding rows average
                                # only across neighbors for which that
                                # slice is valid (reference TF1 per-agent
                                # variables have different shapes across
                                # Monaco node types, so its consensus can
                                # only average shape-compatible weights —
                                # blind padded-head averaging was an r2-r4
                                # rebuild artifact, VERDICT r4 Weak #2).
                                # Identical on homogeneous specs; False
                                # restores the blind average for A/B.
    # TPU-native additions (no reference equivalent):
    num_envs: int = 1           # B parallel env instances per replica
    remat: bool = False         # rematerialize BPTT activations: ~10x less
                                # activation memory (use for very large B),
                                # but multiplies XLA-TPU compile time by
                                # minutes — keep off at B <= 512
    sparse_comm: bool = False   # pack per-edge comm weight blocks to the
                                # actual neighbor lists [N, K=max_degree]
                                # instead of dense [N, N] einsums in the
                                # hot scan — same math (tested), ~N/K
                                # fewer comm FLOPs (6x on the 5x5 grid).
                                # Measured NEUTRAL on v5e at the flagship
                                # shape (1.154M vs 1.148M steps/s at
                                # B=512) but DECISIVE at N=100: 217k vs
                                # 48k steps/s on the 10x10 grid at bf16
                                # (4.5x; bench_variants_r3_clean.jsonl
                                # n100 rows). Off by default; turn it on
                                # for large/sparse graphs where the N^2
                                # blocks stop paying.
    use_pallas: bool = False    # run the per-agent LSTM cell as one fused
                                # Pallas TPU kernel (ops/pallas_lstm.py,
                                # custom VJP, round-2 backward recomputes
                                # gates in-kernel instead of spilling
                                # residuals) instead of XLA's tail of
                                # small batched matmuls + gate ops per
                                # scan step. Equivalence tested; falls
                                # back to interpret mode off-TPU.
                                # Clean exclusive-chip A/B (round 3,
                                # results/bench_variants_r3_clean.jsonl,
                                # B=512): f32+pallas 833k vs XLA f32
                                # 1.074M; bf16+pallas 909k vs XLA bf16
                                # 1.224M — XLA's fused autodiff still
                                # wins at H=64, so the flag stays
                                # opt-in for large-H shapes. The kernel
                                # is dtype-generic (bf16 I/O, f32
                                # accumulation).
    compute_dtype: str = "float32"  # "bfloat16" runs the policy compute
                                # path (obs embed, comm einsums, LSTM,
                                # heads) in bf16 with f32 master params,
                                # optimizer, returns and losses: matmuls
                                # hit the bf16 MXU path and BPTT residual
                                # bytes halve (docs/ROOFLINE.md).
                                # Measured +14% over f32 at the flagship
                                # shape on a clean chip (1.224M vs
                                # 1.074M steps/s, B=512, round 3 —
                                # results/bench_variants_r3_clean.jsonl)
                                # and is bench.py's config of record.
                                # Logits/values are cast back to f32
                                # before sampling/losses.
    switch_penalty: float = 0.0  # TRAINING-ONLY reward shaping (raw
                                # reward units, applied before
                                # normalization/spatial mixing): subtract
                                # this per agent whose action changed from
                                # the previous control step. The yellow
                                # interval makes switching genuinely
                                # costly, but the cost arrives diffused
                                # over downstream queues; this makes it
                                # immediate and local. Evaluation always
                                # uses the TRUE env reward — eval episode
                                # returns are unshaped.
    kickstart_coef: float = 0.0  # weight of an auxiliary cross-entropy
                                # loss toward env.controller_action (the
                                # hysteresis hand controller) during
                                # training, annealed linearly to zero at
                                # kickstart_ratio * total_step
                                # (kickstarting; training-only, the
                                # evaluated policy is the network alone).
    kickstart_ratio: float = 0.5
    scan_unroll: int = 1        # unroll factor for the T-step rollout
                                # scan. >1 amortizes per-iteration scan
                                # overhead (the roofline charges ~150us x
                                # 240 iterations/update at the flagship
                                # shape) at the price of a longer XLA
                                # compile; measured on v5e in round 4
                                # (results/bench_variants_r4.jsonl)
                                # before changing any default.
    fused_grad: bool = True     # differentiate through the rollout scan
                                # itself (one T-step scan/update) instead
                                # of replaying the window for BPTT (two
                                # scans, the reference's explore+backward
                                # split). Same math — equivalence is
                                # tested — but ~1/3 fewer policy FLOPs and
                                # half the scan dispatches per update.

    @property
    def n_step(self) -> int:
        return self.batch_size


@dataclass(frozen=True)
class TrainConfig:
    """[TRAIN_CONFIG] — reference utils.py Counter knobs."""

    total_step: int = 1_000_000
    test_interval: int = 20_000
    log_interval: int = 10_000
    save_interval: int = 0      # checkpoint cadence in env steps;
                                # 0 = save on every log interval (the
                                # round-3 behavior). The r4 CLI-vs-bench
                                # run measured per-log-interval orbax
                                # saves as the main residual CLI
                                # overhead (results/README.md) — set
                                # this larger for throughput-sensitive
                                # runs.


@dataclass(frozen=True)
class EnvConfig:
    """[ENV_CONFIG] — superset of reference keys across CACC and ATSC.

    CACC keys per SURVEY.md section 2.2 item 9 / Appendix B; ATSC keys per
    section 2.2 item 6. Unused keys for a given scenario are ignored by that
    env's constructor.
    """

    scenario: str = "cacc_catchup"
    coop_gamma: float = -1.0
    seed: int = 12
    test_seeds: Tuple[int, ...] = (2000, 2500, 3000)

    # --- CACC (envs/cacc_env.py) ---
    n_vehicle: int = 8
    dt: float = 0.1
    episode_length: int = 600        # steps (60 s at dt=0.1)
    h_star: float = 20.0
    v_star: float = 15.0
    h_st: float = 5.0
    h_go: float = 35.0
    v_max: float = 30.0
    u_max: float = 2.5
    h_min: float = 1.0               # collision threshold
    catchup_ratio: float = 2.0       # headway multiple for lead vehicle
    slowdown_v0: float = 30.0        # initial leader speed (slow-down)
    slowdown_t: float = 30.0         # seconds over which leader decelerates
    w_h: float = 1.0                 # headway cost weight
    w_v: float = 5.0                 # velocity cost weight
    w_u: float = 1.0                 # control cost weight
    collision_penalty: float = 1000.0
    init_noise_h: float = 1.0        # uniform +- noise on initial headway [M]
    init_noise_v: float = 1.0        # uniform +- noise on initial velocity [M]
    v_target: str = "profile"        # velocity the w_v cost (and the obs
                                     # v-error channel) is charged
                                     # against: "profile" (spec of
                                     # record since r5) = the leader's
                                     # scenario profile v_t (identical
                                     # for catchup, where the leader
                                     # cruises at v_star); "fixed" =
                                     # constant v_star (the r1-r4
                                     # engine). Under "fixed" the
                                     # slow-down ramp makes ~-900k of
                                     # tracking cost UNAVOIDABLE
                                     # (w_v (v-15)^2 while the scenario
                                     # forces v 30->15, 97.9% of the
                                     # surviving return), so crashing
                                     # early is return-OPTIMAL and the
                                     # paper's teacher-free result cannot
                                     # hold on that engine; "profile"
                                     # removes exactly the unavoidable
                                     # term, making survival strictly
                                     # return-preferred (decomposition:
                                     # scripts/cacc_reward_decompose.py,
                                     # results/README.md round-5 CACC).

    # --- ATSC (envs/atsc_env.py / large_grid_env.py / real_net_env.py) ---
    episode_length_sec: int = 3600
    control_interval_sec: int = 5
    yellow_interval_sec: int = 2
    objective: str = "queue"         # queue | wait | hybrid
    norm_wave: float = 5.0
    norm_wait: float = 100.0
    clip_wave: float = 2.0
    clip_wait: float = 2.0
    coef_wait: float = 0.2
    peak_flow1: float = 1100.0       # veh/hr, grid demand group 1
    peak_flow2: float = 925.0        # veh/hr, grid demand group 2
    init_density: float = 0.0        # initial queue fill fraction
    sat_flow: float = 0.5            # veh/s saturation discharge per lane
    lane_capacity: float = 40.0      # veh per movement-queue
    demand_scale: float = 1.0
    link_delay_sec: int = 10         # seconds to traverse a link before
                                     # joining the downstream stop-line
                                     # queue (SUMO ~200m links at ~20 m/s;
                                     # grid uses it uniformly, Monaco
                                     # scales it by edge length). >= 1.
    phase_in_obs: bool = False       # append the node's CURRENT phase
                                     # (one-hot of prev action) to its
                                     # observation. The reference state
                                     # is wave(+wait) only [M], but its
                                     # SUMO controller state is implicit
                                     # in the lights; without it a
                                     # stochastic policy cannot know
                                     # which switch incurs the yellow
                                     # penalty (hysteresis is
                                     # inexpressible). Off by default;
                                     # A/B in results/README.md.
    queue_in_obs: bool = False       # append each lane's HALTED count
                                     # (the stop-line queue) next to its
                                     # wave. The queue is what the reward
                                     # charges for, and it is the signal
                                     # the strongest hand controllers
                                     # score on (greedy_action on="queue"
                                     # / hysteresis; SUMO exposes it as
                                     # getLastStepHaltingNumber). wave
                                     # alone conflates queued with
                                     # approaching vehicles; measured on
                                     # the 5x5 grid defaults, queue-scored
                                     # hysteresis reaches -140k vs -167k
                                     # for the best wave-scored form, so a
                                     # wave-only policy cannot even
                                     # express the baseline it must beat.
                                     # Off by default (reference state is
                                     # wave-only [M]); tuned grid configs
                                     # enable it. A/B in results/README.md.
    hysteresis_delta: float = 3.0    # score margin (vehicles) a competing
                                     # phase must win by before the
                                     # hysteresis controller switches
                                     # (greedy_action(..., delta>0));
                                     # delta-swept on the 5x5 defaults:
                                     # 3.0 is the strongest (results/
                                     # README.md controller table)
    hysteresis_on: str = "queue"     # scoring form of controller_action
                                     # (the bar/teacher/naive
                                     # controller): "queue" = stop-line
                                     # queues only, "wave" = queued +
                                     # in-transit. Queue wins on the 5x5
                                     # grid; the Monaco-28 topology's
                                     # delta sweep favors wave at large
                                     # delta (results/README.md).
    network_data: str = ""           # optional JSON graph file for the
                                     # real_net scenario (real OSM data
                                     # drop-in; see monaco.py
                                     # load_network_data). Default:
                                     # the checked-in monaco_28.json.

    def __post_init__(self):
        # a typo'd scoring form ("Queue") would otherwise silently fall
        # through greedy_action's string compare to "wave" and change the
        # baseline bar / kickstart teacher (ADVICE r4)
        if self.hysteresis_on not in ("queue", "wave"):
            raise ValueError(
                f"hysteresis_on must be 'queue' or 'wave', got "
                f"{self.hysteresis_on!r}")
        if self.v_target not in ("fixed", "profile"):
            raise ValueError(
                f"v_target must be 'fixed' or 'profile', got "
                f"{self.v_target!r}")

    @property
    def episode_steps_atsc(self) -> int:
        return self.episode_length_sec // self.control_interval_sec


@dataclass(frozen=True)
class Config:
    agent: str = "ma2c_nc"
    env: EnvConfig = field(default_factory=EnvConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    @property
    def scenario(self) -> str:
        return self.env.scenario


_SECTION_TO_CLS = {
    "ENV_CONFIG": EnvConfig,
    "MODEL_CONFIG": ModelConfig,
    "TRAIN_CONFIG": TrainConfig,
}

# reference key -> our field, where names differ
_KEY_ALIASES = {
    "n_step": "batch_size",
}


def _load_section(cls, section: configparser.SectionProxy):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, raw in section.items():
        name = _KEY_ALIASES.get(key, key)
        if name not in fields:
            continue  # tolerate unknown reference keys
        f = fields[name]
        if f.type in ("Tuple[int, ...]",):
            kwargs[name] = tuple(_parse_list(raw, int))
        else:
            val = _parse_scalar(raw)
            if f.type == "float" and isinstance(val, int):
                val = float(val)
            if f.type == "int" and isinstance(val, float):
                val = int(val)
            kwargs[name] = val
    return cls(**kwargs)


def load_config(path: str, agent: Optional[str] = None) -> Config:
    """Load a reference-style .ini file (reference main.py ~L80 reads these).

    ``agent`` may be given explicitly or via an ``agent`` key in
    [MODEL_CONFIG]/[ENV_CONFIG]; otherwise it is inferred from the filename
    (config_<agent>_<scenario>.ini, the reference naming scheme).
    """
    cp = configparser.ConfigParser()
    if not cp.read(path):
        raise FileNotFoundError(path)
    sections = {}
    for sec_name, cls in _SECTION_TO_CLS.items():
        if cp.has_section(sec_name):
            sections[sec_name] = _load_section(cls, cp[sec_name])
        else:
            sections[sec_name] = cls()
    if agent is None:
        for sec in ("MODEL_CONFIG", "ENV_CONFIG"):
            if cp.has_section(sec) and cp.has_option(sec, "agent"):
                agent = cp.get(sec, "agent")
                break
    if agent is None:
        base = os.path.basename(path)
        if base.startswith("config_"):
            parts = base[len("config_"):].rsplit(".", 1)[0]
            for known in ("ia2c_fp", "ia2c_cu", "ma2c_nc", "ma2c_cnet",
                          "ma2c_dial", "ia2c"):
                if parts.startswith(known):
                    agent = known
                    break
    if agent is None:
        agent = "ia2c"
    return Config(
        agent=agent,
        env=sections["ENV_CONFIG"],
        model=sections["MODEL_CONFIG"],
        train=sections["TRAIN_CONFIG"],
    )


def save_config(cfg: Config, path: str) -> None:
    """Snapshot the config into the run dir (reference main.py copy_file)."""
    cp = configparser.ConfigParser()
    for sec_name, obj in (
        ("ENV_CONFIG", cfg.env),
        ("MODEL_CONFIG", cfg.model),
        ("TRAIN_CONFIG", cfg.train),
    ):
        cp.add_section(sec_name)
        for f in dataclasses.fields(obj):
            v = getattr(obj, f.name)
            if isinstance(v, tuple):
                v = ",".join(str(x) for x in v)
            cp.set(sec_name, f.name, str(v))
    cp.set("MODEL_CONFIG", "agent", cfg.agent)
    with open(path, "w") as fh:
        cp.write(fh)

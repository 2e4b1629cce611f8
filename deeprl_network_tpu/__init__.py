"""deeprl_network_tpu — a TPU-native networked multi-agent RL framework.

Built from scratch in JAX with the capabilities of the reference codebase
``cts198859/deeprl_network`` (ICLR 2020, "Multi-agent Reinforcement Learning
for Networked System Control", arXiv:2004.01339):

- Vectorized pure-JAX environment engines: CACC vehicle-platoon OVM dynamics
  (reference: envs/cacc_env.py) and SUMO-free queue/flow traffic-signal
  networks for the 5x5 grid and a Monaco-scale irregular net
  (reference: envs/atsc_env.py, envs/large_grid_env.py, envs/real_net_env.py).
- The six algorithm families: IA2C, IA2C_FP, IA2C_CU (consensus), MA2C_NC
  (NeurComm), MA2C_CNET (CommNet), MA2C_DIAL (reference: agents/models.py,
  agents/policies.py) realized as masked gather/matmul message passing over a
  static agent adjacency graph inside one jitted train step.
- Synchronous n-step A2C with per-agent LSTM policies, spatial reward
  discounting, TF1-parity optimizer/init semantics (reference:
  agents/utils.py), orbax checkpoints, and multi-host scale-out via
  shard_map/pjit collectives.

See SURVEY.md at the repo root for the reference blueprint (and its
provenance caveat: the reference mount was empty; the survey's appendices
are the behavioral spec of record).
"""

__version__ = "0.1.0"

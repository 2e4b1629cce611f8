from deeprl_network_tpu.envs.base import Env, EnvSpec  # noqa: F401
from deeprl_network_tpu.envs.cacc import CACCEnv  # noqa: F401

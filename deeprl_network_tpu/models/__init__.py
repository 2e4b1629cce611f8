from deeprl_network_tpu.models.layers import (  # noqa: F401
    FCParams, LSTMParams, fc_init, fc_apply, lstm_init, lstm_step,
    one_hot, ortho_init, tf1_rmsprop,
)
from deeprl_network_tpu.models.policies import (  # noqa: F401
    AGENT_TO_COMM, Carry, CommType, PolicyParams, PolicySpec,
    consensus_update, init_carry, init_fingerprint, init_policy_params,
    mask_comm_params, policy_step,
)
from deeprl_network_tpu.models.a2c import (  # noqa: F401
    LossStats, Rollout, a2c_loss, normalize_rewards, nstep_returns,
    spatial_mix,
)

from deeprl_network_tpu.ops.pallas_lstm import fused_agent_lstm  # noqa: F401

from deeprl_network_tpu.utils.scheduler import Scheduler, make_schedule  # noqa: F401

from deeprl_network_tpu.parallel.train import (  # noqa: F401
    make_mesh, make_parallel_a2c, ParallelA2C,
)

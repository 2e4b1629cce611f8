"""Force a hermetic 8-virtual-device CPU JAX for the test suite
(SURVEY.md section 4: the standard TPU-substitute-free test pattern).

Note: the sandbox pre-imports jax via sitecustomize (PYTHONPATH
/root/.axon_site) with JAX_PLATFORMS=axon, so setting the env var here is
too late — we must go through jax.config before the backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

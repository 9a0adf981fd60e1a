import os

# The container's sitecustomize imports jax and registers the axon (remote TPU)
# PJRT plugin before conftest runs, so JAX_PLATFORMS in os.environ is already
# consumed — the config must be updated through jax.config instead. Tests run
# on a virtual 8-device CPU mesh (sharding/collectives without TPU hardware);
# the real chip is reserved for bench.py.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

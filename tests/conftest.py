"""Test configuration: force the CPU platform with 8 virtual devices.

The container's sitecustomize registers a remote TPU (axon) backend and
forces JAX_PLATFORMS=axon; tests must run locally on a virtual 8-device CPU
mesh so multi-chip sharding logic is exercised hermetically (the driver
separately dry-runs the real multi-chip path via
__graft_entry__.dryrun_multichip).  jax.config.update after import is the
only override that sticks.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import crypto_tpu.jax_setup  # noqa: F401, E402  (persistent compilation cache)

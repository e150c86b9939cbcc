import os
# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs the real
# multi-chip path via __graft_entry__.dryrun_multichip).
os.environ.setdefault("XLA_FLAGS", os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

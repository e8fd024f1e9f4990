"""Test configuration: force a virtual 8-device CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (the driver dry-runs the
real multi-chip path separately via __graft_entry__.dryrun_multichip)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import plonky2_merkle_trees_tpu  # noqa: E402,F401  (enables jax x64 before any array creation)

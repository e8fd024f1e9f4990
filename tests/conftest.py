"""Test configuration: force a virtual 8-device CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (the driver dry-runs the
real multi-chip path separately via __graft_entry__.dryrun_multichip)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize pins JAX_PLATFORMS=axon (the TPU tunnel);
# tests must run on the virtual 8-device CPU mesh, so override via config.
# PMT_TEST_TPU=1 keeps the real device so tests/test_pallas_tpu.py can run.
if os.environ.get("PMT_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import plonky2_merkle_trees_tpu  # noqa: E402,F401  (enables jax x64 before any array creation)

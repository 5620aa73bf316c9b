import os

# Tests run on CPU with 8 virtual devices so sharding/collective paths can be
# exercised without TPU hardware (SURVEY.md §4: the invariant GPy's manual
# mpi_test__.py checks — sharded == serial — becomes an automated test here).
#
# NOTE: the axon TPU plugin ignores the JAX_PLATFORMS env var, so we must
# force the platform through jax.config before any backend initialization.
# The CPU path also gives true float64 (the TPU backend silently computes
# x64 at ~f32 precision), which the finite-difference gradient oracles need.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("GPY_TPU_X64", "1")

import jax

jax.config.update("jax_platforms", "cpu")

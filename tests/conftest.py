"""Test config: force JAX onto CPU with 8 virtual devices so multi-chip sharding
paths (mesh/pjit/shard_map) are exercised without TPU hardware.

NOTE: this environment's axon TPU plugin overrides the JAX_PLATFORMS env var at
interpreter start (sitecustomize), so the platform must be forced through
jax.config *after* importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# on a 1-core host the 8 virtual devices run serially; the default 40s
# CPU-collective rendezvous termination timeout kills full-shape DP steps
# (each device takes minutes to reach the grad all-reduce). The warn_stuck
# timeout must match terminate: this XLA build ABORTS the process at
# warn_stuck, not just warns (observed: full-shape DP step SIGABRTs at
# exactly ~600s once per-device time grew past ~85s). Appended even when the
# caller pre-set the device count in XLA_FLAGS — an external
# `XLA_FLAGS=--xla_force_host_platform_device_count=8 pytest` run must not
# silently lose the timeout raise and abort mid-suite.
for _flag in (
    "--xla_cpu_collective_call_warn_stuck_timeout_seconds",
    "--xla_cpu_collective_call_terminate_timeout_seconds",
    "--xla_cpu_collective_timeout_seconds",
):
    # Checked per flag: a caller pre-setting one collective flag must not
    # silently drop the other raises (warn_stuck ABORTS in this XLA build).
    if _flag not in flags:
        flags += f" {_flag}=7200"
os.environ["XLA_FLAGS"] = flags.strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(19260817)

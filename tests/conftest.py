"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-world analogue of multi-node testing without a cluster
(SURVEY.md §4): sharding/collective code paths compile and execute against
8 host devices, and all numerics run in float32 on CPU for determinism.
"""

import os

# Hard override: the session environment pins JAX_PLATFORMS to the TPU tunnel
# (and a sitecustomize registers the PJRT plugin before this file runs), so we
# must both set the env var and update jax.config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# 8 virtual devices time-share ONE core here; XLA CPU kills the process if a
# collective's participants don't all arrive within 40 s (rendezvous.cc
# "Termination timeout"), which a heavy per-device kernel or a loaded host
# easily exceeds — observed as flaky SIGABRTs in the mesh train-step and
# hermetic dryrun tests. Raise the terminate timeout; keep warn_stuck low so
# genuinely wedged collectives still log.
if "collective_call_terminate_timeout" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=60"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the two heaviest tests (the 8-way mesh joint
# step and the hermetic driver dryrun) spend nearly all their time in XLA CPU
# compilation of the same graphs run after run — with a warm cache they drop
# from minutes to seconds. Entries invalidate automatically when the traced
# HLO changes.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/neraf_jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)

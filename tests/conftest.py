"""Test configuration: run on local CPU with 8 virtual devices.

The container's sitecustomize registers a remote TPU ("axon") backend and
pins JAX_PLATFORMS=axon; every op then takes a ~0.5s RPC round-trip, which
is unusable for a test suite. Tests force the in-process CPU backend with 8
virtual devices — the TPU-world equivalent of "test multi-node without a
cluster" (SURVEY.md §4). Benchmarks (bench.py) run on the real chip.
"""

import os

# hard override — the environment ships JAX_PLATFORMS=axon
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

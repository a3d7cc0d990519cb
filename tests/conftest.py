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

# persistent XLA compile cache for the CPU test backend: the container has a
# single core, so the 40-min suite wall time is almost entirely serial
# compilation — cached entries make repeat runs (and identical HLO compiled
# by different test modules within one run) near-free. The dir is keyed by
# cpuinfo identity + kernel BOOT ID: CPU cache entries embed AOT machine
# code whose cache key ignores the host target, and loading another
# machine's entry risks SIGILL (the r2 intermittent 'Fatal Python error');
# per-boot isolation makes cross-machine loads impossible by construction —
# full evidence trail in transfusion_tpu/utils/hostfp.py.
# NOTE: a cpu_aot_loader.cc "Target machine feature +prefer-no-gather is not
# supported on the host machine" WARNING can still appear on cache hits
# produced by THIS very boot: LLVM tuning flags (+prefer-no-gather/-scatter,
# the SPR gather-erratum workaround) are baked into the compile-time feature
# string but are not CPUID features, so XLA's strict load-time feature-set
# comparison flags them even same-host. Benign: prefer-no-gather codegen
# AVOIDS instructions, so the cached code is strictly more conservative.
from transfusion_tpu.utils.hostfp import cpu_cache_fingerprint  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("TRANSFUSION_TEST_CACHE_DIR")  # override: cold-run timing
    or os.path.expanduser(
        "~/.cache/transfusion_tpu/jax-cpu-tests/" + cpu_cache_fingerprint()
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# build the native fastpack extension once per session if it's absent, so
# the C++-vs-numpy parity test (test_packing.py) actually runs in CI
# instead of skipping
import importlib  # noqa: E402
import subprocess  # noqa: E402
import sys  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
try:
    importlib.import_module("transfusion_tpu._fastpack")
except ImportError:
    r = subprocess.run(
        [sys.executable, "setup.py", "build_ext", "--inplace"],
        cwd=_REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    if r.returncode != 0:
        sys.stderr.write(
            "fastpack build failed (tests will skip native parity):\n"
            + r.stderr[-2000:]
        )

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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The suite is serial-COMPILE-bound on this 1-core host and the CPU cache
# is boot-keyed (hostfp.py), so every fresh boot pays the full compile
# bill. Tests don't need optimized machine code: -O0 cuts cold-compile
# wall time ~25% (measured r5: test_cached_sampling+test_transformer cold
# 300s -> 231s, all green). Parity/bitwise tests compare programs that are
# BOTH compiled at -O0, so equality contracts are unaffected. Set
# TRANSFUSION_TEST_XLA_OPT=1 to restore default optimization.
if (
    "xla_backend_optimization_level" not in flags
    and not os.environ.get("TRANSFUSION_TEST_XLA_OPT")
):
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags

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


# ---------------------------------------------------------------------------
# Incremental per-test timing log: every finished test appends one JSONL row
# immediately, so even a killed/timed-out run yields a complete ranking of
# where the wall time went (pytest's own --durations prints only at exit).
# File: .pytest_timings.jsonl at the repo root (gitignored).
# ---------------------------------------------------------------------------
import json as _json  # noqa: E402
import time as _time  # noqa: E402

_TIMINGS_PATH = os.path.join(_REPO, ".pytest_timings.jsonl")


def pytest_sessionstart(session):
    try:
        with open(_TIMINGS_PATH, "w") as f:
            f.write(_json.dumps({"session_start": _time.time()}) + "\n")
    except OSError:
        pass


def pytest_runtest_logreport(report):
    if report.when != "call" and not (
        report.when == "setup" and report.duration > 1.0
    ):
        return
    try:
        with open(_TIMINGS_PATH, "a") as f:
            f.write(_json.dumps({
                "id": report.nodeid,
                "when": report.when,
                "s": round(report.duration, 2),
                "outcome": report.outcome,
            }) + "\n")
    except OSError:
        pass

"""Host fingerprint for XLA:CPU persistent-cache isolation.

XLA:CPU persistent-cache entries embed AOT machine code, and the cache key
does NOT include the host CPU target: loading another machine's entry
triggers `cpu_aot_loader.cc` "could lead to execution errors such as
SIGILL" and can hard-crash the process (the r2 intermittent 'Fatal Python
error').

History of this fix:
  * r2: no isolation — observed cross-host AOT loads.
  * r3: keyed the dir on /proc/cpuinfo identity lines (flags, model,
    stepping, microcode, vendor, family). STILL insufficient: the r3
    multichip-gate tail again contained cpu_aot_loader errors. Virtualized
    hosts can surface byte-identical cpuinfo across different silicon /
    LLVM feature sets (LLVM detects the target via CPUID + its own tuning
    tables, e.g. +prefer-no-gather for the SPR gather erratum), so no
    cpuinfo-derived key can be proven collision-free.
  * r4 (this module): additionally key on the kernel boot id. A cache dir
    is then only ever reused within ONE boot of ONE machine, so cached
    machine code can never cross machines BY CONSTRUCTION — zero
    cpu_aot_loader loads of foreign code are possible. Cost: the CPU cache
    goes cold once per boot; cross-boot reuse was exactly the unsafe path,
    and warm-within-session reuse (the test suite's serial-compile
    bottleneck, the dryrun child's repeat compiles) is preserved.

TPU executables are produced by the (remote) TPU compiler and are not host
machine code — the TPU cache dir intentionally stays shared across hosts.
"""

from __future__ import annotations

import hashlib


def cpu_cache_fingerprint() -> str:
    """Stable-within-boot, unique-across-machines cache-dir suffix."""
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            parts.append(
                "".join(
                    ln
                    for ln in f
                    if ln.startswith(
                        ("flags", "model", "stepping", "microcode",
                         "vendor_id", "cpu family")
                    )
                )
            )
    except OSError:  # pragma: no cover - non-linux
        import platform

        parts.append(platform.processor())
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            parts.append(f.read().strip())
    except OSError:  # pragma: no cover - non-linux
        import uuid

        # no boot id available: fall back to per-process isolation (safe,
        # never shared) rather than risking a cross-machine load
        parts.append(uuid.uuid4().hex)
    return hashlib.md5("\n".join(parts).encode()).hexdigest()[:12]

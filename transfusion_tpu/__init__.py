"""transfusion_tpu — TPU-native Transfusion framework (JAX/XLA/Pallas/pjit).

Re-designed from scratch with the full capability surface of
lucidrains/transfusion-pytorch (reference mounted at /root/reference).
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: sampling/training entry points compile
# several sizeable programs; caching them across processes matters even more
# when the TPU backend compiles remotely. Disable with TRANSFUSION_JAX_CACHE=0.
if _os.environ.get("TRANSFUSION_JAX_CACHE", "1") != "0":
    import jax as _jax

    _cache_dir = _os.environ.get(
        "TRANSFUSION_JAX_CACHE_DIR",
        _os.path.expanduser("~/.cache/transfusion_tpu/jax"),
    )
    # CPU-backend entries embed XLA:CPU AOT machine code whose cache key
    # does NOT include the host CPU target — an entry written on one
    # machine loads on another with a "could lead to execution errors such
    # as SIGILL" warning (cpu_aot_loader.cc). The cache dir is keyed on
    # cpuinfo identity + the kernel BOOT ID, so cached machine code can
    # never cross machines by construction (cpuinfo alone proved
    # insufficient under virtualization — full evidence trail in
    # utils/hostfp.py). TPU executables are compiled by the (remote) TPU
    # compiler and are not host machine code, so they keep the shared dir.
    if "cpu" in _os.environ.get("JAX_PLATFORMS", "").lower():
        from transfusion_tpu.utils.hostfp import cpu_cache_fingerprint

        _cache_dir = _os.path.join(
            _cache_dir + "-cpu", cpu_cache_fingerprint()
        )
    try:
        # respect a cache dir configured before import (e.g. tests/conftest)
        if _jax.config.jax_compilation_cache_dir is None:
            _jax.config.update("jax_compilation_cache_dir", _cache_dir)
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
    except Exception:  # pragma: no cover - older jax without the flags
        pass

# public export surface (parity with reference transfusion_pytorch/__init__.py)
from transfusion_tpu.utils import print_modality_sample  # noqa: F401


def __getattr__(name):  # lazy: importing jax/flax stacks only when used
    if name in ("Transfusion", "LossBreakdown", "TransfusionCore"):
        from transfusion_tpu.models import transfusion as _m

        return getattr(_m, name)
    if name == "Transformer":
        from transfusion_tpu.models.transformer import Transformer

        return Transformer
    if name == "create_dataloader":
        from transfusion_tpu.data.dataloader import create_dataloader

        return create_dataloader
    raise AttributeError(name)

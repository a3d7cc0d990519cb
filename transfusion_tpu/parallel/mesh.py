"""Device mesh + sharding rules — the framework's parallelism layer.

The reference has no in-library parallelism (SURVEY.md §2.5: DP only via HF
accelerate in two example scripts). Here DP/FSDP/TP are first-class:

  axes: 'data'   — batch sharding (gradient all-reduce rides ICI)
        'fsdp'   — parameter/optimizer sharding over the data replicas
        'tensor' — megatron-style tensor parallelism (attention heads and
                   feedforward inner dim split column/row-wise)

Everything uses jax.sharding + jit (GSPMD): we annotate parameter and batch
shardings and let XLA insert the collectives (psum for DP grads,
all-gather/reduce-scatter for FSDP, all-reduce pairs for TP matmuls).

Sharding rules are path-based over the linen param tree:
  to_qk/to_v/proj_in/to_time_cond kernels [d_in, d_out]: (fsdp, tensor)
      — column-parallel (heads / GEGLU inner split over tensor)
  to_out/proj_out kernels [d_in, d_out]: (tensor, fsdp)
      — row-parallel (contracting dim sharded; XLA inserts the all-reduce)
  embeddings / logit heads: vocab over tensor
  everything else (norms, gates, film, biases): replicated.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLUMN_PARALLEL = ("to_qk", "to_v", "proj_in", "to_time_cond", "skip_proj")
ROW_PARALLEL = ("to_out", "proj_out")


def initialize_distributed(
    coordinator_address=None,
    num_processes=None,
    process_id=None,
    local_device_ids=None,
):
    """Multi-host (DCN) entry point: call ONCE per process before any other
    jax API, then build meshes with `make_mesh` as usual — `jax.devices()`
    returns the global device list afterwards and GSPMD handles cross-host
    collectives transparently.

    All arguments default to the standard env vars / TPU metadata
    (`jax.distributed.initialize` resolves JAX_COORDINATOR_ADDRESS etc.;
    on Cloud TPU pods every argument is auto-detected). No-ops when the
    runtime is already initialized so wrapper scripts can call it
    unconditionally.

    Topology assumption (see `make_mesh`): the 'data' (outermost) axis is
    the one that crosses hosts — gradient all-reduce is the only collective
    that rides DCN; fsdp/tensor/context/pipe collectives stay on ICI within
    a host's devices.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:  # already initialized — idempotent entry
        if "already initialized" not in str(e):
            raise
    return jax.process_index(), jax.process_count()


def order_devices_for_dcn(devices, n: int):
    """Order a (possibly multi-process) device list so each host's devices
    are contiguous: with the C-order reshape in `make_mesh`, inner axes
    (tensor/context/pipe, then fsdp) land inside one host's block and ride
    ICI, while the outermost 'data' axis spans hosts and rides DCN — the
    scaling-book layout (DP over DCN, model parallelism over ICI).

    Works with any objects exposing `process_index`/`id` (unit-testable
    without real multi-host hardware)."""
    ordered = sorted(
        devices,
        key=lambda d: (getattr(d, "process_index", 0), getattr(d, "id", 0)),
    )
    return ordered[:n]


def make_mesh(
    data: int = 1,
    fsdp: int = 1,
    tensor: int = 1,
    context: int = 1,
    pipe: int = 1,
    devices=None,
) -> Mesh:
    """5-axis device mesh: data x fsdp x tensor x context x pipe.

    'context' shards the packed sequence dimension (ring / all-gather
    attention, parallel/context.py); 'pipe' carries pipeline stages
    (parallel/pipeline.py); size 1 axes cost nothing under GSPMD.

    Multi-host: after `initialize_distributed()`, jax.devices() is global
    and devices are ordered host-contiguous (`order_devices_for_dcn`), so
    keep model-parallel axis products within one host's device count and
    let 'data' span hosts — then only the gradient all-reduce crosses DCN.
    """
    devices = devices if devices is not None else jax.devices()
    n = data * fsdp * tensor * context * pipe
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    dev_array = np.asarray(
        order_devices_for_dcn(devices, n), dtype=object
    ).reshape(data, fsdp, tensor, context, pipe)
    return Mesh(
        dev_array, axis_names=("data", "fsdp", "tensor", "context", "pipe")
    )


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def param_partition_spec(path, p) -> P:
    name = _path_str(path)

    if p.ndim == 2:
        if "text_embed" in name or "embedding" in name:
            return P("tensor", "fsdp")
        if "to_text_logits" in name:
            return P("fsdp", "tensor")
        if any(s in name for s in COLUMN_PARALLEL) and "kernel" in name:
            return P("fsdp", "tensor")
        if any(s in name for s in ROW_PARALLEL) and "kernel" in name:
            return P("tensor", "fsdp")
        if "kernel" in name:
            return P("fsdp", None)
    return P()


def _feasible_spec(spec: P, shape, mesh: Mesh) -> P:
    """Drop sharding on any dim not divisible by its mesh axis size."""
    out = []
    for i, axis in enumerate(spec):
        if axis is None:
            out.append(None)
            continue
        size = mesh.shape[axis]
        if i < len(shape) and shape[i] % size == 0:
            out.append(axis)
        else:
            out.append(None)
    return P(*out)


def shard_params(params, mesh: Mesh):
    """NamedSharding tree for the model params under `mesh`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, p: NamedSharding(
            mesh, _feasible_spec(param_partition_spec(path, p), p.shape, mesh)
        ),
        params,
    )


def batch_sharding(mesh: Mesh, packed) -> object:
    """Shard the packed batch: [b, ...] buffers over 'data'; latent groups
    (instance-major, not batch-aligned) replicated — their scatter targets
    land on the right data shard via XLA's gather/scatter handling."""
    dp = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    return packed.replace(
        text=jax.device_put(packed.text, dp),
        cfg_mask=jax.device_put(packed.cfg_mask, dp),
        spans=jax.device_put(packed.spans, dp),
        lengths=jax.device_put(packed.lengths, dp),
        total_tokens=jax.device_put(packed.total_tokens, rep),
        groups=jax.tree.map(lambda x: jax.device_put(x, rep), packed.groups),
    )

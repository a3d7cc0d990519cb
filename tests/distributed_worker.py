"""Worker process for test_distributed.py: one real multi-process DP run.

Invoked as `python distributed_worker.py <process_id> <num_processes> <port>`
in its own interpreter (NOT under the test conftest — it configures its own
backend before importing jax, exactly like a real multi-host launcher
would). Runs the REAL multi-host entry points — `initialize_distributed`
(jax.distributed + Gloo CPU collectives), `order_devices_for_dcn`,
`make_mesh(data=...)` — then two Trainer.train_step DP steps on a batch
sharded across both processes' devices, and prints per-step losses for the
parent test to compare across processes and against a single-process run.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_N_DEV = os.environ.get("DIST_WORKER_DEVICES", "2")  # per-process devices
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={_N_DEV}"
)
# the worker must not share the test suite's AOT cache dir settings —
# leave the persistent cache off (fresh tiny compiles, seconds)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    from transfusion_tpu.parallel.mesh import (
        initialize_distributed,
        make_mesh,
        order_devices_for_dcn,
    )

    idx, cnt = initialize_distributed(f"localhost:{port}", nproc, pid)
    assert idx == pid and cnt == nproc, (idx, cnt)

    devs = order_devices_for_dcn(jax.devices(), jax.device_count())
    # each host's devices contiguous -> the outermost 'data' axis is the
    # only one crossing processes (the DCN axis)
    procs = [getattr(d, "process_index", 0) for d in devs]
    assert procs == sorted(procs), procs
    mesh = make_mesh(data=len(devs), devices=devs)

    import jax.numpy as jnp

    from transfusion_tpu.models.transfusion import Transfusion
    from transfusion_tpu.training.trainer import Trainer

    m = Transfusion(
        num_text_tokens=16,
        dim_latent=4,
        modality_default_shape=(2,),
        transformer=dict(
            dim=16, depth=1, dim_head=8, heads=2, attn_impl="dense"
        ),
        pad_multiple=16,
        dtype=jnp.float32,
    )
    tr = Trainer(m, learning_rate=1e-3, mesh=mesh)
    state = tr.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    batch = [[rng.integers(0, 16, 6).astype(np.int32)] for _ in range(4)]
    packed = m.pack(batch, shift_friendly=True)
    for step in range(2):
        state, metrics = tr.train_step(
            state, packed, jax.random.PRNGKey(1 + step)
        )
        print(f"LOSS {idx} {step} {float(metrics['loss']):.8f}", flush=True)
    print(f"DONE {idx}", flush=True)


if __name__ == "__main__":
    main()

"""Real 2-process validation of the multi-host (DCN) hook (VERDICT r4 #6).

`initialize_distributed` / `order_devices_for_dcn` (parallel/mesh.py) were
previously exercised only with injected fake device lists; here two actual
processes join one `jax.distributed` runtime (CPU backend, Gloo
collectives), build a data mesh spanning both, and run two REAL
Trainer.train_step DP steps. The contract:

  * both processes compute identical per-step losses (the gradient
    all-reduce crossed the process boundary correctly);
  * those losses equal a single-process run of the same mesh shape on the
    same data (DP process-count invariance).
"""

import os
import socket
import subprocess
import sys

import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
_WORKER = os.path.join(_HERE, "distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _parse_losses(out: str, pid: int):
    losses = {}
    for ln in out.splitlines():
        parts = ln.split()
        if parts[:1] == ["LOSS"] and int(parts[1]) == pid:
            losses[int(parts[2])] = float(parts[3])
    return [losses[i] for i in sorted(losses)]


@pytest.mark.slow
def test_two_process_dp_step():
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=_HERE,
        )
        for pid in range(2)
    ]
    outs = []
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=420)
        outs.append(out)
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"DONE {pid}" in out

    l0, l1 = _parse_losses(outs[0], 0), _parse_losses(outs[1], 1)
    assert len(l0) == len(l1) == 2, (outs[0][-500:], outs[1][-500:])
    assert l0 == l1, "processes disagree on the all-reduced loss"

    # single-process reference: same mesh SHAPE (4 devices on one host),
    # same data and rng -> identical trajectory
    ref = subprocess.run(
        [sys.executable, _WORKER, "0", "1", str(_free_port())],
        capture_output=True,
        text=True,
        timeout=420,
        env={
            **env,
            # one process now owns all 4 virtual devices
            "DIST_WORKER_DEVICES": "4",
        },
        cwd=_HERE,
    )
    assert ref.returncode == 0, ref.stdout[-3000:] + ref.stderr[-2000:]
    lref = _parse_losses(ref.stdout, 0)
    assert len(lref) == 2
    for a, b in zip(l0, lref):
        assert abs(a - b) < 1e-5, (l0, lref)

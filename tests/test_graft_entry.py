"""Driver-contract tests for __graft_entry__.py.

The driver (a) compile-checks entry() on one chip and (b) runs
dryrun_multichip(8) in an environment with a SINGLE device — the round-1
failure mode was asserting on device count instead of self-hosting a CPU
backend. These tests pin both paths.
"""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_entry_jits():
    fn, args = graft.entry()
    loss = jax.jit(fn)(*args)
    assert float(loss) > 0 and float(loss) < 100


@pytest.mark.slow  # >30s on the 1-core CI host (VERDICT r4 #3 tiering)
def test_dryrun_multichip_inline():
    # conftest gives 8 virtual CPU devices -> runs in-process
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_subprocess(monkeypatch):
    # mimic the driver's real environment: pretend no backend with >=8
    # devices exists so the subprocess self-hosting path is exercised
    monkeypatch.setattr(graft, "_have_n_devices", lambda n: False)
    monkeypatch.delenv("_TRANSFUSION_TPU_DRYRUN_CHILD", raising=False)
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_nonfactor2():
    # device counts that are not powers of two must still factor
    graft.dryrun_multichip(6)

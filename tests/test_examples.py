"""Smoke tests for example scripts (subset — full runs are manual).

Each example is executed in-process with tiny step counts on CPU.
"""

import pathlib
import runpy
import sys

import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parents[1] / "examples"


def run_example(name, argv):
    old_argv = sys.argv
    sys.path.insert(0, str(EXAMPLES))
    try:
        sys.argv = ["x"] + argv
        runpy.run_path(str(EXAMPLES / name), run_name="__main__")
    finally:
        sys.argv = old_argv
        sys.path.remove(str(EXAMPLES))


def test_train_toy_smoke():
    run_example(
        "train_toy.py",
        ["--steps", "3", "--sample-every", "1000", "--batch-size", "2"],
    )


def test_train_mnist_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    run_example(
        "train_mnist.py",
        ["--steps", "2", "--sample-every", "1000", "--batch-size", "2"],
    )


def test_train_latent_only_smoke():
    run_example(
        "train_latent_only.py",
        ["--steps", "2", "--sample-every", "1000", "--batch-size", "2"],
    )

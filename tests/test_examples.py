"""Smoke tests for ALL NINE example scripts (reference acceptance configs,
SURVEY.md §2.6) — tiny step counts, offline data fallbacks, CPU.

Most are marked `slow` (each spawns a full training loop = a pile of cold
compiles on the 1-core CI host); the default tier keeps train_toy (the
canonical end-to-end loop) and serve_text (the serving CLI incl. engine).
Run all nine with `pytest tests/test_examples.py -m ""`.

These catch config regressions the unit tests can't see: LASER attention
(train_text_only), Muon + velocity consistency (train_image_only), unet
pre/post projections (train_mnist_with_unet / *_with_unet), recon loss 0.1 +
CFG sampling (train_latent_with_text), two-stage VAE (train_mnist_vae).
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


@pytest.mark.slow
def test_train_mnist_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    run_example(
        "train_mnist.py",
        ["--steps", "2", "--sample-every", "1000", "--batch-size", "2"],
    )


@pytest.mark.slow
def test_train_latent_only_smoke():
    run_example(
        "train_latent_only.py",
        ["--steps", "2", "--sample-every", "1000", "--batch-size", "2"],
    )


@pytest.mark.slow
def test_train_text_only_smoke():
    # exercises LASER attention + grad accumulation (ref train_text_only.py)
    run_example(
        "train_text_only.py",
        ["--steps", "2", "--sample-every", "1000", "--batch-size", "2"],
    )


@pytest.mark.slow
def test_train_mnist_vae_smoke(tmp_path, monkeypatch):
    # two-stage: conv autoencoder pretrain, then transfusion on its latents
    monkeypatch.chdir(tmp_path)
    run_example(
        "train_mnist_vae.py",
        ["--steps", "2", "--sample-every", "1000", "--batch-size", "2",
         "--ae-steps", "2"],
    )


@pytest.mark.slow
def test_train_mnist_with_unet_smoke(tmp_path, monkeypatch):
    # pre_post_transformer_enc_dec conv down/up pair
    monkeypatch.chdir(tmp_path)
    run_example(
        "train_mnist_with_unet.py",
        ["--steps", "2", "--sample-every", "1000", "--batch-size", "2"],
    )


@pytest.mark.slow
def test_train_image_only_smoke(tmp_path, monkeypatch):
    # Muon optimizer + velocity-consistency vs EMA + recon loss
    monkeypatch.chdir(tmp_path)
    run_example(
        "train_image_only.py",
        ["--steps", "2", "--sample-every", "1000", "--batch-size", "2"],
    )


@pytest.mark.slow
def test_train_image_only_with_unet_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    run_example(
        "train_image_only_with_unet.py",
        ["--steps", "2", "--sample-every", "1000", "--batch-size", "2"],
    )


@pytest.mark.slow
def test_train_latent_with_text_smoke(tmp_path, monkeypatch):
    # recon loss 0.1 + unet projections + CFG sampling via EMA
    monkeypatch.chdir(tmp_path)
    run_example(
        "train_latent_with_text.py",
        ["--steps", "2", "--sample-every", "1000", "--batch-size", "2"],
    )


@pytest.mark.slow
def test_train_distributed_smoke(tmp_path, monkeypatch):
    # dp x fsdp x tp mesh auto-factored over the 8 virtual devices
    monkeypatch.chdir(tmp_path)
    run_example(
        "train_distributed.py",
        ["--steps", "2", "--batch-size", "4"],
    )


@pytest.mark.slow
def test_train_distributed_context_smoke(tmp_path, monkeypatch):
    # sequence parallelism: --context 2 selects ring attention
    monkeypatch.chdir(tmp_path)
    run_example(
        "train_distributed.py",
        ["--steps", "2", "--batch-size", "4", "--context", "2"],
    )


@pytest.mark.slow
def test_train_distributed_pipeline_smoke(tmp_path, monkeypatch):
    # pipeline parallelism: GPipe over a data=2 x pipe=4 mesh
    monkeypatch.chdir(tmp_path)
    run_example(
        "train_distributed.py",
        ["--steps", "2", "--batch-size", "4", "--pipeline", "4"],
    )


@pytest.mark.slow  # >30s on the 1-core CI host (VERDICT r4 #3 tiering)
def test_serve_text_smoke():
    # serving demo: flash prefill + Pallas decode kernel + int8 KV cache
    run_example(
        "serve_text.py",
        ["--history", "32", "--tokens", "4", "--batch", "2",
         "--dim", "64", "--depth", "2", "--kv-quantize", "--multimodal",
         "--ragged", "--engine", "--mm-engine"],
    )

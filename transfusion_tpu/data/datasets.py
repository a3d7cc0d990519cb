"""Offline-friendly datasets for the example scripts.

This container has no network and ships no MNIST/enwik8 archives, so every
loader has a deterministic synthetic fallback (clearly logged). Real data is
used automatically when present at the conventional paths.
"""

from __future__ import annotations

import gzip
import logging
import os
from pathlib import Path

import numpy as np

logger = logging.getLogger("transfusion_tpu")

DATA_DIR = Path(os.environ.get("TRANSFUSION_DATA_DIR", "./data"))


def load_enwik8(path=None, n_bytes: int = 5_000_000) -> np.ndarray:
    """enwik8 bytes; fallback: this repository's own source files (real text,
    always available offline)."""
    candidates = [path, DATA_DIR / "enwik8.gz", DATA_DIR / "enwik8"]
    for c in candidates:
        if c and Path(c).exists():
            p = Path(c)
            raw = (
                gzip.open(p, "rb").read(n_bytes)
                if p.suffix == ".gz"
                else p.read_bytes()[:n_bytes]
            )
            return np.frombuffer(raw, np.uint8).copy()

    logger.warning("enwik8 not found — falling back to repo source text")
    root = Path(__file__).resolve().parents[2]
    chunks = []
    total = 0
    for p in sorted(root.rglob("*.py")) + sorted(root.rglob("*.md")):
        if ".git" in p.parts:
            continue
        b = p.read_bytes()
        chunks.append(b)
        total += len(b)
        if total >= n_bytes:
            break
    data = b"".join(chunks)
    reps = max(1, n_bytes // max(len(data), 1) + 1)
    data = (data * reps)[:n_bytes]
    return np.frombuffer(data, np.uint8).copy()


def _synthetic_digit(rng: np.random.Generator, label: int) -> np.ndarray:
    """Procedural 28x28 'digit': a label-dependent stroke pattern. Enough
    structure for a generative smoke-train (label-conditional modes)."""
    img = np.zeros((28, 28), np.float32)
    yy, xx = np.mgrid[0:28, 0:28].astype(np.float32)
    cx, cy = 14 + 3 * np.cos(label), 14 + 3 * np.sin(label * 2)
    r_out = 6.0 + (label % 5)
    r_in = max(1.0, r_out - 2.5)
    d = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
    ring = (d < r_out) & (d > r_in)
    img[ring] = 1.0
    if label % 2 == 1:  # vertical bar
        img[6:22, 13 + (label % 3) : 15 + (label % 3)] = 1.0
    if label >= 5:  # horizontal bar
        img[13:15, 6:22] = 1.0
    img += rng.normal(0, 0.05, img.shape).astype(np.float32)
    return np.clip(img, 0, 1)


def load_mnist(path=None, n: int = 4096):
    """(images [n,28,28] float32 in [0,1], labels [n] int) — real MNIST when
    an idx/npz file exists at ./data/mnist.npz, else synthetic digits."""
    candidates = [path, DATA_DIR / "mnist.npz"]
    for c in candidates:
        if c and Path(c).exists():
            with np.load(c) as z:
                imgs = z["x_train"][:n].astype(np.float32) / 255.0
                labels = z["y_train"][:n].astype(np.int32)
            return imgs, labels

    logger.warning("MNIST not found — using synthetic procedural digits")
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 10, n).astype(np.int32)
    imgs = np.stack([_synthetic_digit(rng, int(l)) for l in labels])
    return imgs, labels


def load_flowers_latents(n: int = 1024, hw: int = 32, c: int = 4):
    """Stand-in for Oxford-flowers AutoencoderKL latents (diffusers VAE is
    unavailable offline): smooth random fields with channel correlations,
    scaled by the SD latent factor 0.18215."""
    logger.warning("flowers VAE latents unavailable — using synthetic latents")
    rng = np.random.default_rng(0)
    base = rng.normal(size=(n, hw * 2, hw * 2, c)).astype(np.float32)
    # low-pass: average-pool to induce spatial smoothness
    lat = base.reshape(n, hw, 2, hw, 2, c).mean(axis=(2, 4))
    return lat * 0.18215


def load_flowers_labels() -> list[str]:
    p = Path("/root/reference/data/flowers/labels.txt")
    if p.exists():
        return [l.strip() for l in p.read_text().splitlines() if l.strip()]
    return [f"flower species {i}" for i in range(100)]

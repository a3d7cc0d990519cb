"""Shared bits for the example scripts."""

import argparse

import jax
import numpy as np


def parse_args(default_steps=200, default_sample_every=100, **extra):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=default_steps)
    p.add_argument("--sample-every", type=int, default=default_sample_every)
    p.add_argument("--batch-size", type=int, default=extra.pop("batch_size", 4))
    p.add_argument("--seed", type=int, default=0)
    for k, v in extra.items():
        p.add_argument(f"--{k.replace('_','-')}", type=type(v), default=v)
    return p.parse_args()


def train_loop(trainer, state, iter_dl, steps, rng, log_every=10, hook=None):
    for step in range(1, steps + 1):
        rng, k = jax.random.split(rng)
        state, metrics = trainer.train_step(state, next(iter_dl), k)
        if step % log_every == 0 or step == 1:
            print(f"{step}: {float(metrics['loss']):.4f}")
        if hook is not None:
            hook(step, state)
    return state, rng


def save_image_grid(images, path, pad=1):
    """images: [n, h, w] or [n, h, w, 1] floats in [0,1] -> PNG-ish .npy dump
    plus an ASCII preview (no PIL dependency guaranteed offline)."""
    images = np.asarray(images)
    if images.ndim == 4 and images.shape[-1] == 1:
        images = images[..., 0]
    np.save(str(path) + ".npy", images)
    img = images[0]
    chars = " .:-=+*#%@"
    h, w = img.shape
    rows = []
    for y in range(0, h, 2):
        rows.append(
            "".join(
                chars[int(np.clip(img[y, x], 0, 1) * (len(chars) - 1))]
                for x in range(w)
            )
        )
    print("\n".join(rows))

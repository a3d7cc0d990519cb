"""Elementwise numeric primitives.

Behavioral parity with reference transfusion.py:295-319 (tensor math helpers)
and transfusion.py:832-839 (RMSNorm math). All functions are pure jnp and fuse
into surrounding XLA computations (VPU ops on TPU).
"""

from __future__ import annotations

import jax.numpy as jnp


def l2norm(t, axis: int = -1, eps: float = 1e-12):
    """x / max(||x||_2, eps) along `axis` (torch F.normalize semantics)."""
    norm = jnp.linalg.norm(t, axis=axis, keepdims=True)
    return t / jnp.maximum(norm, eps)


def rms_norm(x, gamma, scale: float):
    """l2norm(x) * sqrt(dim) * (gamma + 1)  — unit-offset RMSNorm.

    Reference transfusion.py:832-839. `scale` is dim ** 0.5.
    """
    return l2norm(x) * scale * (gamma + 1.0)


def softclamp(t, value: float = 50.0):
    """tanh soft clamp: tanh(t / v) * v. Reference transfusion.py:298-299."""
    return jnp.tanh(t / value) * value


def safe_log(t, eps: float = 1e-20):
    """log(max(t, eps)). Reference transfusion.py:310-311."""
    return jnp.log(jnp.maximum(t, eps))


def max_neg_value(dtype=jnp.float32):
    return -jnp.finfo(dtype).max

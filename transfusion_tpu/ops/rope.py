"""Rotary position embeddings with arbitrary per-batch position ids.

The reference uses `rotary-embedding-torch` (transfusion.py:45, 1465) with the
default "lang" frequency schedule and *interleaved* pair rotation, applied to a
position-id tensor that can differ per batch (modality interiors share one
position — transfusion.py:402-416). We reproduce the same convention so that
weights ported from the reference produce identical attention logits.

Convention (interleaved / GPT-NeoX "rotate every other"):
    freqs_j = theta ** (-2j / d),  j in [0, d/2)
    angle[..., 2j] = angle[..., 2j+1] = pos * freqs_j
    rotate_half(x)[..., 2j]   = -x[..., 2j+1]
    rotate_half(x)[..., 2j+1] =  x[..., 2j]
    out = x * cos(angle) + rotate_half(x) * sin(angle)
"""

from __future__ import annotations

import jax.numpy as jnp
from einops import rearrange, repeat


def rope_angles(positions, dim_head: int, theta: float = 10000.0):
    """Compute rotation angles for given integer/float positions.

    positions: Int[...] or Float[...] — any shape, typically [n] or [b, n]
    returns angles Float[..., dim_head] (interleaved-duplicated frequencies).
    """
    assert dim_head % 2 == 0
    freqs = 1.0 / (
        theta ** (jnp.arange(0, dim_head, 2, dtype=jnp.float32) / dim_head)
    )
    angles = positions.astype(jnp.float32)[..., None] * freqs  # [..., d/2]
    return repeat(angles, "... f -> ... (f r)", r=2)  # [..., d]


def _rotate_half(x):
    x = rearrange(x, "... (d r) -> ... d r", r=2)
    x1, x2 = x[..., 0], x[..., 1]
    x = jnp.stack([-x2, x1], axis=-1)
    return rearrange(x, "... d r -> ... (d r)")


def apply_rope(angles, t):
    """Apply rotary embedding.

    angles: Float[..., n, d] broadcastable to t's shape; if angles has more
        positions than t along the sequence axis (-2), the *last* t positions
        are used (matches rotary-embedding-torch when decoding with a cache —
        the tail of the sequence is the new tokens).
    t: Float[..., n, d] queries or keys.
    """
    seq_len = t.shape[-2]
    if angles.shape[-2] > seq_len:
        angles = angles[..., -seq_len:, :]

    angles = angles.astype(jnp.float32)
    t32 = t.astype(jnp.float32)
    out = t32 * jnp.cos(angles) + _rotate_half(t32) * jnp.sin(angles)
    return out.astype(t.dtype)

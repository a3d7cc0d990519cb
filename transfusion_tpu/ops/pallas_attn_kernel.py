"""Pallas TPU flash-attention kernel for the transfusion mask (stub gate).

Filled in by `flash_attention`; until the kernel lands, `supported` returns
False so callers take the dense path.
"""

from __future__ import annotations


def supported(n: int, d: int) -> bool:
    return False


def flash_attention(q, k, v, spans=None, causal=False, softcap=50.0):
    raise NotImplementedError

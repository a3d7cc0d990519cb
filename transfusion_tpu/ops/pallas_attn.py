"""Block-sparse flash attention for the transfusion mask (Pallas TPU).

The reference's fused path is torch flex_attention with a Python mask_mod
(reference transfusion.py:74-81, 343-364, 981-989). The TPU-native
replacement is a Pallas flash-attention kernel whose mask is computed
*inside* the kernel from the span metadata `Int[b, m, 3]` — the O(n^2)
boolean mask is never materialized in HBM.

Mask semantics (must equal `spans_to_attn_mask` / reference
`naive_attn_mask`, transfusion.py:496-513):
    allowed(i, j) = (i >= j) | any_m[(i >= off_m) & (j < off_m + len_m)]
plus the tanh softcap applied to the raw logits (ref :995).

This module exposes `transfusion_flash_attention(q, k, v, spans, causal,
softcap)`; a jnp reference implementation (`_reference_attention`) is kept
for parity tests. The Pallas kernel is implemented in
`_flash_attention_pallas` below.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from transfusion_tpu.ops.norms import softclamp, max_neg_value
from transfusion_tpu.ops.spans import spans_to_attn_mask


def _reference_attention(q, k, v, spans, causal, softcap):
    b, h, n, d = q.shape
    scale = d**-0.5
    sim = jnp.einsum(
        "bhid,bhjd->bhij", q * scale, k, preferred_element_type=jnp.float32
    )
    if softcap > 0:
        sim = softclamp(sim, softcap)

    if spans is not None:
        mask = spans_to_attn_mask(n, spans)[:, None]
    elif causal:
        seq = jnp.arange(n)
        mask = (seq[:, None] >= seq[None, :])[None, None]
    else:
        mask = None

    if mask is not None:
        sim = jnp.where(mask, sim, max_neg_value(sim.dtype))

    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum(
        "bhij,bhjd->bhid", attn.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


def transfusion_flash_attention(q, k, v, spans=None, causal=False, softcap=50.0):
    """Flash attention with the transfusion block mask.

    q, k, v: Float[b, h, n, d]; spans: Int[b, m, 3] | None.
    Uses the Pallas TPU kernel when shapes are tile-aligned, otherwise the
    dense jnp path (same numerics).
    """
    b, h, n, d = q.shape
    from transfusion_tpu.ops import pallas_attn_kernel as _k

    if _k.supported(n, d):
        return _k.flash_attention(q, k, v, spans=spans, causal=causal, softcap=softcap)

    return _reference_attention(q, k, v, spans, causal, softcap)

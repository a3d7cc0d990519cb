"""Span metadata ops — the vectorized heart of the packed-sequence design.

A batch's modality layout is described by `spans: Int[b, m, 3]` holding
`(modality_type, offset, length)` triples, zero-padded (length <= 0 rows are
inert). These functions reproduce the reference's mask/position semantics

  - naive transfusion attention mask   reference transfusion.py:496-513
  - is-modality masks                  reference transfusion.py:465-493
  - rotary position collapse           reference transfusion.py:402-416
  - per-token time conditioning        reference transfusion.py:2772-2776
  - span ordering                      reference transfusion.py:386-399

entirely with static-shape jnp ops so a single `jit` covers every batch.
"""

from __future__ import annotations

import jax.numpy as jnp

from transfusion_tpu.utils.typing import Array, Bool, Float, Int, typecheck


@typecheck
def sort_spans_by_offset(spans: Int[Array, "b m 3"]):
    """Sort spans by ascending offset, pushing empty (length<=0) rows last.

    spans: Int[b, m, 3] -> (sorted spans Int[b, m, 3], sort indices Int[b, m])
    """
    offsets = spans[..., 1]
    lengths = spans[..., 2]
    sort_keys = jnp.where(lengths <= 0, jnp.iinfo(jnp.int32).max, offsets)
    order = jnp.argsort(sort_keys, axis=-1)
    sorted_spans = jnp.take_along_axis(spans, order[..., None], axis=1)
    return sorted_spans, order


@typecheck
def spans_to_instance_mask(
    seq_len: int, spans: Int[Array, "b m 3"]
) -> Bool[Array, "b m {seq_len}"]:
    """Bool[b, m, n]: token j belongs to span instance m.

    Empty spans (length <= 0) produce all-False rows.
    """
    offsets = spans[..., 1:2]  # [b, m, 1]
    lengths = spans[..., 2:3]
    pos = jnp.arange(seq_len)[None, None, :]
    return (pos >= offsets) & (pos < offsets + lengths)


@typecheck
def spans_to_modality_mask(
    seq_len: int, spans: Int[Array, "b m 3"], num_modalities: int = 1
) -> Bool[Array, "b {num_modalities} m {seq_len}"]:
    """Bool[b, t, m, n]: instance mask split per modality type.

    Matches reference `modality_positions_to_is_modality_mask`
    (transfusion.py:465-493).
    """
    inst = spans_to_instance_mask(seq_len, spans)  # [b, m, n]
    types = spans[..., 0]  # [b, m]
    type_match = types[:, None, :] == jnp.arange(num_modalities)[None, :, None]
    return type_match[..., None] & inst[:, None, :, :]


@typecheck
def spans_to_is_any_modality(
    seq_len: int, spans: Int[Array, "b m 3"]
) -> Bool[Array, "b {seq_len}"]:
    """Bool[b, n]: token is inside any modality span."""
    return spans_to_instance_mask(seq_len, spans).any(axis=1)


@typecheck
def spans_to_attn_mask(
    seq_len: int, spans: Int[Array, "b m 3"]
) -> Bool[Array, "b {seq_len} {seq_len}"]:
    """Bool[b, i, j] transfusion mask: causal OR any modality rectangle.

    rectangle_m = (i >= offset_m) & (j < offset_m + length_m)

    Semantics of reference `naive_attn_mask` (transfusion.py:496-513) — the
    source of truth the Pallas kernel must reproduce.
    """
    seq = jnp.arange(seq_len)
    is_causal = seq[:, None] >= seq[None, :]  # [i, j]

    offsets = spans[..., 1]  # [b, m]
    lengths = spans[..., 2]

    q_ok = seq[None, None, :, None] >= offsets[:, :, None, None]  # [b, m, i, 1]
    k_ok = seq[None, None, None, :] < (offsets + lengths)[:, :, None, None]
    rect = (q_ok & k_ok).any(axis=1)  # [b, i, j]

    return is_causal[None] | rect


@typecheck
def spans_to_rotary_positions(
    seq_len: int, spans: Int[Array, "b m 3"]
) -> Int[Array, "b {seq_len}"]:
    """Int[b, n] rotary position ids with modality interiors collapsed.

    All tokens of one modality share a single rotary position: the span is
    shrunk by (+1, -1) and positions are arange(n) - cumsum(in_shrunk_span).
    Reference transfusion.py:402-416.
    """
    shrunk = jnp.concatenate(
        [spans[..., 0:1], spans[..., 1:2] + 1, spans[..., 2:3] - 1], axis=-1
    )
    is_any = spans_to_is_any_modality(seq_len, shrunk)  # [b, n]
    return jnp.arange(seq_len)[None, :] - jnp.cumsum(
        is_any.astype(jnp.int32), axis=-1
    )


@typecheck
def spans_to_token_times(
    seq_len: int, spans: Int[Array, "b m 3"], times: Float[Array, "b m"]
) -> Float[Array, "b {seq_len}"]:
    """Float[b, n] per-token time conditioning.

    Token inside span instance m gets times[b, m]; text tokens get 0.
    Reference transfusion.py:2772-2776.
    """
    inst = spans_to_instance_mask(seq_len, spans)  # [b, m, n]
    return jnp.einsum("bmn,bm->bn", inst.astype(times.dtype), times)

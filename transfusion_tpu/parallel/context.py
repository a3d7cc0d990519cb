"""Context (sequence) parallelism: attention sharded over the sequence axis.

SURVEY.md §2.5/§5.7: the reference has no long-context story at all (dense
O(n^2) masks, ~1k-token sequences). Here the sequence dimension can be
sharded over a 'context' mesh axis:

  * every chip holds its slice of the queries (and of K/V);
  * K/V are all-gathered over the context axis (one ICI collective);
  * the transfusion mask is evaluated against *global* row indices, so
    causality and modality rectangles are exact across shards.

Two schedules, same signature, both tested against the dense oracle on the
8-device CPU mesh:

  * `context_parallel_attention` — all-gather KV (one collective; O(n)
    KV memory per chip, minimal latency at moderate n);
  * `ring_attention` — KV chunks rotate around the ring via ppermute with
    local online-softmax accumulation (O(n/c) memory per chip; XLA
    overlaps the permute with block compute) — the long-context schedule.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from transfusion_tpu.ops.norms import softclamp, max_neg_value


def _global_allowed(batch, rows, cols, spans, causal):
    """The transfusion mask (causal | modality rectangles) at GLOBAL
    (row, col) indices — the one mask construction both CP schedules share.

    rows: [nl, 1]; cols: [1, nc]. Returns Bool[b, nl, nc] or None (no
    structural mask)."""
    allowed = None
    if causal or spans is not None:
        allowed = jnp.broadcast_to(
            (rows >= cols)[None], (batch, rows.shape[0], cols.shape[1])
        )
    if spans is not None:
        offs, lens = spans[..., 1], spans[..., 2]  # [b, m]
        rect = (
            (rows[None, None] >= offs[:, :, None, None])
            & (cols[None, None] < (offs + lens)[:, :, None, None])
        ).any(axis=1)
        allowed = allowed | rect
    return allowed


def _offset_attention(q, k, v, spans, causal, softcap, row_offset):
    """Dense attention where q rows are global positions row_offset + i.

    q: [b, h, nl, d]; k, v: [b, h, n, d]; spans: Int[b, m, 3] | None.
    """
    b, h, nl, d = q.shape
    n = k.shape[2]
    scale = d**-0.5

    sim = jnp.einsum(
        "bhid,bhjd->bhij", q * scale, k, preferred_element_type=jnp.float32
    )
    if softcap > 0:
        sim = softclamp(sim, softcap)

    rows = row_offset + jnp.arange(nl)[:, None]  # [nl, 1] global
    cols = jnp.arange(n)[None, :]
    allowed = _global_allowed(b, rows, cols, spans, causal)

    if allowed is not None:
        sim = jnp.where(allowed[:, None], sim, max_neg_value(sim.dtype))

    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum(
        "bhij,bhjd->bhid", attn.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


def _online_block_update(state, q, k_chunk, v_chunk, spans, causal, softcap,
                         row_offset, col_offset):
    """One online-softmax update of (m, l, acc) against a KV chunk whose
    global column range starts at col_offset."""
    m_prev, l_prev, acc = state
    b, h, nl, d = q.shape
    nc = k_chunk.shape[2]
    scale = d**-0.5

    s = jnp.einsum(
        "bhid,bhjd->bhij", q * scale, k_chunk,
        preferred_element_type=jnp.float32,
    )
    if softcap > 0:
        s = softclamp(s, softcap)

    rows = row_offset + jnp.arange(nl)[:, None]
    cols = col_offset + jnp.arange(nc)[None, :]
    allowed = _global_allowed(b, rows, cols, spans, causal)
    if allowed is not None:
        s = jnp.where(allowed[:, None], s, NEG_INF_RING)

    m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + p.sum(axis=-1, keepdims=True)
    acc_new = acc * alpha + jnp.einsum(
        "bhij,bhjd->bhid", p, v_chunk.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return m_new, l_new, acc_new


NEG_INF_RING = -1e30


def _cp_specs(mesh: Mesh, axis: str, spans):
    """shard_map specs for q/k/v [b,h,n,d] + spans [b,m,3] on a mesh that may
    also carry 'data' (batch) and 'tensor' (heads) axes. Axes of size 1 are
    omitted so single-purpose context meshes keep their original specs."""
    names = mesh.axis_names
    batch = "data" if ("data" in names and mesh.shape["data"] > 1) else None
    heads = "tensor" if ("tensor" in names and mesh.shape["tensor"] > 1) else None
    qkv = P(batch, heads, axis, None)
    span = (P(batch, None, None) if spans is not None else None)
    return qkv, span


def ring_attention(
    q, k, v, spans=None, causal=False, softcap: float = 50.0,
    mesh: Mesh = None, axis: str = "context",
):
    """Ring-scheduled context-parallel transfusion attention.

    Unlike the all-gather variant, each chip only ever holds ONE KV chunk
    (O(n/c) memory): chunks rotate around the ring via `ppermute` while the
    online-softmax state (m, l, acc) accumulates locally; XLA overlaps the
    permute with the block computation. The span mask is evaluated at global
    (row, col) indices so causality and modality rectangles are exact.
    """
    assert mesh is not None

    def body(q_loc, k_loc, v_loc, spans_loc):
        size = jax.lax.axis_size(axis)
        idx = jax.lax.axis_index(axis)
        b, h, nl, d = q_loc.shape
        row_off = idx * nl

        perm = [(i, (i + 1) % size) for i in range(size)]

        def step(i, carry):
            state, k_c, v_c = carry
            # chunk currently held came from shard (idx - i) mod size
            src = (idx - i) % size
            state = _online_block_update(
                state, q_loc, k_c, v_c, spans_loc, causal, softcap,
                row_off, src * nl,
            )
            k_c = jax.lax.ppermute(k_c, axis, perm)
            v_c = jax.lax.ppermute(v_c, axis, perm)
            return state, k_c, v_c

        init = (
            jnp.full((b, h, nl, 1), NEG_INF_RING, jnp.float32),
            jnp.zeros((b, h, nl, 1), jnp.float32),
            jnp.zeros((b, h, nl, d), jnp.float32),
        )
        # the accumulators become device-varying after the first update;
        # mark the (constant) init values as varying too so the fori_loop
        # carry types match under shard_map's axis tracking (over every
        # mesh axis the q/k/v shards vary on, not just the ring axis)
        init = jax.tree.map(
            lambda x: jax.lax.pcast(x, vary_axes, to="varying"), init
        )
        (m, l, acc), _, _ = jax.lax.fori_loop(
            0, size, step, (init, k_loc, v_loc)
        )
        return (acc / jnp.maximum(l, 1e-30)).astype(q_loc.dtype)

    seq_spec, span_spec = _cp_specs(mesh, axis, spans)
    vary_axes = tuple(a for a in seq_spec if a is not None)

    from jax import shard_map

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec, span_spec),
        out_specs=seq_spec,
    )(q, k, v, spans)


def context_parallel_attention(
    q, k, v, spans=None, causal=False, softcap: float = 50.0,
    mesh: Mesh = None, axis: str = "context",
):
    """Transfusion attention with q/k/v sharded over `axis` on `mesh`.

    q, k, v: global Float[b, h, n, d] (n divisible by the axis size);
    spans replicated. Returns the global output, sharded the same way.
    """
    assert mesh is not None

    def body(q_loc, k_loc, v_loc, spans_loc):
        size = jax.lax.axis_size(axis)
        idx = jax.lax.axis_index(axis)
        nl = q_loc.shape[2]

        k_full = jax.lax.all_gather(k_loc, axis, axis=2, tiled=True)
        v_full = jax.lax.all_gather(v_loc, axis, axis=2, tiled=True)

        return _offset_attention(
            q_loc, k_full, v_full, spans_loc, causal, softcap, idx * nl
        )

    seq_spec, span_spec = _cp_specs(mesh, axis, spans)

    from jax import shard_map

    shmap = shard_map(
        body,
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec, span_spec),
        out_specs=seq_spec,
    )
    return shmap(q, k, v, spans)

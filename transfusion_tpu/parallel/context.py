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


def _kernel_eligible(nl, nkv, d, causal, spans):
    """Route the per-shard compute through the Pallas flash kernel (global
    q/kv offsets) when the workload fits its envelope; the dense jnp path
    stays as the oracle/fallback. The kernel needs a structural mask
    (causal|spans), a supported head dim, and block-aligned shard/chunk
    lengths."""
    import jax as _jax

    if not (causal or spans is not None):
        return False
    if _jax.default_backend() not in ("tpu", "cpu"):
        return False
    return d in (32, 64, 128, 256) and nl % 8 == 0 and nkv % 8 == 0


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
        use_kernel = _kernel_eligible(nl, nl, d, causal, spans_loc)

        perm = [(i, (i + 1) % size) for i in range(size)]

        def chunk_need(src, col_off):
            """Chunk-level visibility summary: False when nothing in
            [row_off, row_off+nl) can see [col_off, col_off+nl) — for
            causal attention chip idx only needs chunks src <= idx (~2x
            FLOP cut), plus any span rectangle that spills into a later
            chunk. Causal visibility is part of the transfusion mask
            whenever ANY structural mask exists (_global_allowed seeds
            `allowed` with rows >= cols for spans too). The ppermute still
            runs either way (the rotation carries the chunk onward); exact
            parity: a fully-masked chunk's contribution is wiped by the
            online-softmax rescale anyway."""
            need = src <= idx
            if spans_loc is not None:
                offs = spans_loc[..., 1]
                lens = spans_loc[..., 2]
                need = need | (
                    (lens > 0)
                    & (row_off + nl - 1 >= offs)
                    & (col_off < offs + lens)
                ).any()
            return need

        if use_kernel:
            # Pallas flash kernel per chunk (global offsets, lse returned);
            # partials merge via the standard log-sum-exp combination:
            #   out = sum_i out_i e^{lse_i - m} / sum_i e^{lse_i - m}
            from transfusion_tpu.ops.pallas_attn_kernel import flash_attention

            def step(i, carry):
                (m_prev, r, acc), k_c, v_c = carry
                src = (idx - i) % size
                col_off = src * nl

                def update(state):
                    m_prev, r, acc = state
                    out_i, lse_i = flash_attention(
                        q_loc, k_c, v_c, spans_loc, causal=causal,
                        softcap=softcap, q_offset=row_off,
                        kv_offset=col_off, return_lse=True,
                    )
                    m_new = jnp.maximum(m_prev, lse_i)
                    alpha = jnp.exp(m_prev - m_new)
                    w = jnp.exp(lse_i - m_new)
                    acc = acc * alpha[..., None] + (
                        out_i.astype(jnp.float32) * w[..., None]
                    )
                    return m_new, r * alpha + w, acc

                state = jax.lax.cond(
                    chunk_need(src, col_off), update, lambda s: s,
                    (m_prev, r, acc),
                )
                k_c = jax.lax.ppermute(k_c, axis, perm)
                v_c = jax.lax.ppermute(v_c, axis, perm)
                return state, k_c, v_c

            init = (
                jnp.full((b, h, nl), NEG_INF_RING, jnp.float32),
                jnp.zeros((b, h, nl), jnp.float32),
                jnp.zeros((b, h, nl, d), jnp.float32),
            )
            # check_vma=False on the enclosing shard_map (the Pallas
            # kernel takes device-varying offset scalars, which the vma
            # checker rejects) — no pcast needed
            (m, r, acc), _, _ = jax.lax.fori_loop(
                0, size, step, (init, k_loc, v_loc)
            )
            return (acc / jnp.maximum(r, 1e-30)[..., None]).astype(
                q_loc.dtype
            )

        def step(i, carry):
            state, k_c, v_c = carry
            # chunk currently held came from shard (idx - i) mod size
            src = (idx - i) % size
            col_off = src * nl

            def update(s):
                return _online_block_update(
                    s, q_loc, k_c, v_c, spans_loc, causal, softcap,
                    row_off, col_off,
                )

            if causal or spans_loc is not None:
                state = jax.lax.cond(
                    chunk_need(src, col_off), update, lambda s: s, state
                )
            else:
                state = update(state)  # full attention: every chunk counts
            k_c = jax.lax.ppermute(k_c, axis, perm)
            v_c = jax.lax.ppermute(v_c, axis, perm)
            return state, k_c, v_c

        init = (
            jnp.full((b, h, nl, 1), NEG_INF_RING, jnp.float32),
            jnp.zeros((b, h, nl, 1), jnp.float32),
            jnp.zeros((b, h, nl, d), jnp.float32),
        )
        # (check_vma=False on the enclosing shard_map — no vma tracking,
        # so the constant init needs no pcast)
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
        # the Pallas chunk kernel consumes device-varying offset scalars
        # (axis_index-derived), which the vma checker cannot express
        check_vma=False,
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
        b, h, nl, d = q_loc.shape

        k_full = jax.lax.all_gather(k_loc, axis, axis=2, tiled=True)
        v_full = jax.lax.all_gather(v_loc, axis, axis=2, tiled=True)

        if _kernel_eligible(nl, nl * size, d, causal, spans_loc):
            # local q slice against the gathered KV through the Pallas
            # flash kernel — q_offset places the slice's rows at their
            # global positions so the in-kernel mask (and its block
            # skipping) is exact
            from transfusion_tpu.ops.pallas_attn_kernel import flash_attention

            return flash_attention(
                q_loc, k_full, v_full, spans_loc, causal=causal,
                softcap=softcap, q_offset=idx * nl,
            )

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
        check_vma=False,  # see ring_attention: varying offsets into Pallas
    )
    return shmap(q, k, v, spans)

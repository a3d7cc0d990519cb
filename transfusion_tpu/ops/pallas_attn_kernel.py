"""Pallas TPU flash attention with the transfusion block mask.

Replaces the reference's flex_attention path (torch CUDA/Triton,
reference transfusion.py:74-81, 981-989) with a TPU Mosaic kernel:

  * online-softmax flash attention (O(n) memory — the O(n^2) bool mask of
    the reference's naive path is never materialized in HBM);
  * the mask is evaluated *inside* the kernel from the span metadata
    Int[b, m, 3] held in SMEM via scalar prefetch:
        allowed(i,j) = causal(i,j) | any_m[(i >= off_m) & (j < off_m+len_m)]
    (semantics of reference naive_attn_mask :496-513 — the source of truth,
    tested against `spans_to_attn_mask`);
  * tanh softcap fused on the logits (reference :995);
  * fully-masked (q-block, kv-block) tiles skip the matmul work via
    predication (block-level mask summarization from the spans).

Forward-only Pallas; gradients take the dense path via custom_vjp
(flash backward kernel is the planned follow-up — training currently
defaults to the dense implementation anyway).

Grid: (b, h, n/BQ, n/BK), kv innermost; VMEM scratch accumulators persist
across the kv dimension per (b, h, q-block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 128
BK = 128
NEG_INF = -1e30


def _kernel(
    # scalar prefetch
    spans_ref,  # i32[b, m, 3] in SMEM
    # inputs
    q_ref,  # [1, 1, BQ, D]
    k_ref,  # [1, 1, BK, D]
    v_ref,  # [1, 1, BK, D]
    # outputs
    o_ref,  # [1, 1, BQ, D]
    # scratch
    m_scr,  # [BQ, 1] f32
    l_scr,  # [BQ, 1] f32
    acc_scr,  # [BQ, D] f32
    *,
    use_spans: bool,
    softcap: float,
    num_spans: int,
    scale: float,
):
    # mask = causal | span rectangles (when use_spans); the transfusion mask
    # always includes the causal part (reference naive_attn_mask :496-513)
    b = pl.program_id(0)
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    q_start = iq * BQ
    k_start = ik * BK

    # ---- block-level mask summary ----
    blk_any = (q_start + BQ - 1) >= k_start  # any causal interaction
    blk_full = q_start >= (k_start + BK - 1)  # fully causal-visible
    if use_spans:
        for s in range(num_spans):
            off = spans_ref[b, s, 1]
            ln = spans_ref[b, s, 2]
            has = ln > 0
            rect_any = has & ((q_start + BQ - 1) >= off) & (k_start < off + ln)
            rect_full = has & (q_start >= off) & ((k_start + BK - 1) < off + ln)
            blk_any = blk_any | rect_any
            blk_full = blk_full | rect_full

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(blk_any)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)  # [BQ, D]
        k = k_ref[0, 0].astype(jnp.float32)  # [BK, D]
        v = v_ref[0, 0].astype(jnp.float32)

        s = jax.lax.dot_general(
            q * scale, k,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, BK]

        if softcap > 0:
            s = jnp.tanh(s / softcap) * softcap

        def masked(s):
            rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0)
            cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)
            allowed = rows >= cols  # causal
            if use_spans:
                for sp in range(num_spans):
                    off = spans_ref[b, sp, 1]
                    ln = spans_ref[b, sp, 2]
                    allowed = allowed | (
                        (ln > 0) & (rows >= off) & (cols < off + ln)
                    )
            return jnp.where(allowed, s, NEG_INF)

        s = jax.lax.cond(blk_full, lambda s: s, masked, s)

        m_prev = m_scr[:]  # [BQ, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)

        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_scr[:] = m_new

    @pl.when(ik == nk - 1)
    def _finalize():
        l = jnp.maximum(l_scr[:], 1e-30)
        o_ref[0, 0] = (acc_scr[:] / l).astype(o_ref.dtype)


def _flash_fwd(q, k, v, spans, causal, softcap):
    b, h, n, d = q.shape
    use_spans = spans is not None
    assert use_spans or causal, "flash path requires causal and/or spans"
    if spans is None:
        spans = jnp.zeros((b, 1, 3), jnp.int32)
    m = spans.shape[1]
    scale = d**-0.5

    grid = (b, h, n // BQ, n // BK)

    kernel = functools.partial(
        _kernel,
        use_spans=use_spans,
        softcap=float(softcap),
        num_spans=m,
        scale=scale,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, BQ, d), lambda b, h, iq, ik, *_: (b, h, iq, 0)
            ),
            pl.BlockSpec(
                (1, 1, BK, d), lambda b, h, iq, ik, *_: (b, h, ik, 0)
            ),
            pl.BlockSpec(
                (1, 1, BK, d), lambda b, h, iq, ik, *_: (b, h, ik, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, BQ, d), lambda b, h, iq, ik, *_: (b, h, iq, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((BQ, 1), jnp.float32),
            pltpu.VMEM((BQ, 1), jnp.float32),
            pltpu.VMEM((BQ, d), jnp.float32),
        ],
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


def supported(n: int, d: int) -> bool:
    if jax.default_backend() not in ("tpu", "cpu"):
        return False
    return n % BQ == 0 and n % BK == 0 and d in (32, 64, 128, 256)

"""Pallas TPU decode attention over the preallocated KV ring-buffer cache.

Serving-path companion to the training flash kernel
(ops/pallas_attn_kernel.py). Cached decode is bound by streaming the KV
cache from HBM every step; the XLA dense path additionally

  * materializes the dequantized cache when it is int8-quantized (XLA
    cannot fuse elementwise producers into a dot), tripling the traffic
    the quantization was meant to save, and
  * builds an f32 score matrix [b, h, nq, cap] plus a boolean mask of the
    same shape in HBM.

This kernel streams K/V blocks (bf16/f32, or int8 + per-token scales)
through VMEM with double-buffered manual DMA, dequantizes in registers,
applies the tanh softcap and an additive validity bias, and accumulates an
online softmax — one pass over the cache at its stored width, no
intermediate tensors in HBM.

Design notes (why this shape):
  * grid is (b, h) only — a (b, h, kv-block) grid pays ~1-3 us of Mosaic
    grid-step overhead per tile, which at 32k-token caches (4096 tiles)
    dwarfs the actual streaming time. The kv loop runs inside the kernel
    with pltpu.make_async_copy double buffering.
  * the cache is stored TRANSPOSED, [b, h, d, cap] ("kT"/"vT" in
    make_kv_cache): sliced HBM DMA requires the trailing dimension to be
    128-aligned, which head_dim=64 is not but the capacity (a 128
    multiple) is. The transposed layout also makes both attention matmuls
    direct (no in-kernel transposes) and lets per-token scales broadcast
    across sublanes.

The reference has no serving path at all — its generate_text_only
re-forwards the full prefix per token (reference transfusion.py:2015-2038);
this kernel is the TPU-native answer to what vLLM-style decode kernels do
for CUDA serving stacks.

Mask contract: validity is a per-(batch, kv-slot) additive bias
(0 or -inf), broadcast over query rows — exactly the masking cached decode
needs (the reference likewise disables structural masking during cached
decode, transfusion.py:938-939). Within-chunk causality for multi-token
text chunks is NOT expressible here; callers decode text one token at a
time (they do) or fall back to the dense path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel_dma(
    *refs,
    quant: bool,
    softcap: float,
    scale: float,
    nq: int,
    bk: int,
    nk: int,
):
    if quant:
        (lens_ref, q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, bias_ref, o_ref,
         k_buf, v_buf, ks_buf, vs_buf, sems) = refs
    else:
        (lens_ref, q_ref, k_hbm, v_hbm, bias_ref, o_ref,
         k_buf, v_buf, sems) = refs
        ks_buf = vs_buf = None

    bi = pl.program_id(0)
    hi = pl.program_id(1)

    # per-row early exit (ragged batched serving): this row's valid slots
    # are the prefix [0, lens[bi]) — stream only the blocks that cover it,
    # so a short request in a batch doesn't pay the longest one's traffic
    nk_row = jnp.clip((lens_ref[bi] + bk - 1) // bk, 1, nk)

    def dmas(slot, ik):
        start = ik * bk
        out = [
            pltpu.make_async_copy(
                k_hbm.at[bi, hi, :, pl.ds(start, bk)],
                k_buf.at[slot], sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[bi, hi, :, pl.ds(start, bk)],
                v_buf.at[slot], sems.at[slot, 1],
            ),
        ]
        if quant:
            out += [
                pltpu.make_async_copy(
                    ks_hbm.at[bi, hi, :, pl.ds(start, bk)],
                    ks_buf.at[slot], sems.at[slot, 2],
                ),
                pltpu.make_async_copy(
                    vs_hbm.at[bi, hi, :, pl.ds(start, bk)],
                    vs_buf.at[slot], sems.at[slot, 3],
                ),
            ]
        return out

    for dma in dmas(0, 0):
        dma.start()

    q = q_ref[0, 0] * scale  # [nq, d] f32

    def body(ik, carry):
        m_prev, l_prev, acc = carry
        slot = jax.lax.rem(ik, 2)
        next_slot = jax.lax.rem(ik + 1, 2)

        @pl.when(ik + 1 < nk_row)
        def _prefetch():
            for dma in dmas(next_slot, ik + 1):
                dma.start()

        for dma in dmas(slot, ik):
            dma.wait()

        # blocks are [d, bk]; per-token scales [1, bk] broadcast over
        # sublanes (no transposes anywhere in the compute)
        if quant:
            k_blk = k_buf[slot].astype(jnp.float32) * ks_buf[slot]
            v_blk = v_buf[slot].astype(jnp.float32) * vs_buf[slot]
        else:
            k_blk = k_buf[slot].astype(jnp.float32)
            v_blk = v_buf[slot].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [nq, bk]
        if softcap > 0:
            s = jnp.tanh(s / softcap) * softcap
        s = s + bias_ref[0, 0:1, pl.ds(ik * bk, bk)]

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [nq, d]
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        return m_new, l_new, acc

    d = q_ref.shape[-1]
    init = (
        jnp.full((nq, 1), NEG_INF, jnp.float32),
        jnp.zeros((nq, 1), jnp.float32),
        jnp.zeros((nq, d), jnp.float32),
    )
    m_f, l_f, acc = jax.lax.fori_loop(0, nk_row, body, init)
    # a fully-masked row (lens=0 / all -inf bias) would otherwise average
    # garbage V rows with uniform weights — return zeros instead
    valid = m_f > NEG_INF / 2
    o_ref[0, 0] = jnp.where(valid, acc / jnp.maximum(l_f, 1e-30), 0.0)


def decode_attention(
    q,  # Float[b, h, nq, d] — the chunk being decoded (nq small)
    kT,  # [b, h, d, cap] float | int8 — the full cache buffer, transposed
    vT,  # like kT
    bias,  # Float[b, 8, cap] — additive validity (0 | -inf), sublane-
    # duplicated 8x (a trailing singleton would pad to 128 lanes in HBM)
    k_scale=None,  # Float[b, h, 1, cap] — required when kT is int8
    v_scale=None,
    softcap: float = 50.0,
    lens=None,  # Int[b] — per-row valid-slot count (prefix); bounds each
    # row's kv streaming so ragged batches don't all pay the longest
    # row's traffic. None = stream the full capacity.
):
    b, h, nq, d = q.shape
    cap = kT.shape[3]
    quant = kT.dtype == jnp.int8
    assert quant == (k_scale is not None), "int8 cache needs scales"
    if lens is None:
        lens = jnp.full((b,), cap, jnp.int32)

    bk = _pick_bk(cap)
    assert bk is not None, f"cap {cap} not divisible by a supported block"
    nk = cap // bk

    nq_pad = max(8, -(-nq // 8) * 8)
    qf = q.astype(jnp.float32)
    if nq_pad != nq:
        qf = jnp.pad(qf, ((0, 0), (0, 0), (0, nq_pad - nq), (0, 0)))

    kernel = functools.partial(
        _decode_kernel_dma,
        quant=quant,
        softcap=float(softcap),
        scale=d**-0.5,
        nq=nq_pad,
        bk=bk,
        nk=nk,
    )

    in_specs = [
        pl.BlockSpec((1, 1, nq_pad, d), lambda b, h, *_: (b, h, 0, 0)),  # q
        pl.BlockSpec(memory_space=pltpu.ANY),  # kT — HBM, manual DMA
        pl.BlockSpec(memory_space=pltpu.ANY),  # vT
    ]
    args = [lens.astype(jnp.int32), qf, kT, vT]
    n_streams = 2
    scratch = [
        pltpu.VMEM((2, d, bk), kT.dtype),
        pltpu.VMEM((2, d, bk), vT.dtype),
    ]
    if quant:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.ANY),  # k_scale [b, h, 1, cap]
            pl.BlockSpec(memory_space=pltpu.ANY),  # v_scale
        ]
        args += [k_scale, v_scale]
        scratch += [
            pltpu.VMEM((2, 1, bk), jnp.float32),
            pltpu.VMEM((2, 1, bk), jnp.float32),
        ]
        n_streams = 4
    in_specs.append(
        pl.BlockSpec((1, 8, cap), lambda b, h, *_: (b, 0, 0))  # bias (VMEM)
    )
    args.append(bias)
    scratch.append(pltpu.SemaphoreType.DMA((2, n_streams)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # lens — read before the kv loop starts
        grid=(b, h),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, nq_pad, d), lambda b, h, *_: (b, h, 0, 0)
        ),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, nq_pad, d), jnp.float32),
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
    )(*args)

    return out[:, :, :nq, :].astype(q.dtype)


def _pick_bk(cap: int):
    # prefer the largest block: fewer fori_loop iterations and DMA issues
    # (measured fastest at 32k caps); VMEM stays < ~2 MB either way
    for c in (2048, 1024, 512, 256, 128):
        if cap % c == 0:
            return c
    return None


def decode_supported(cap: int, d: int, nq: int) -> bool:
    """Decode-kernel eligibility: cache capacity divisible by a block size,
    supported head dim, chunk small enough to stay VMEM-resident."""
    if jax.default_backend() not in ("tpu", "cpu"):
        return False
    return _pick_bk(cap) is not None and d in (32, 64, 128, 256) and nq <= 1024

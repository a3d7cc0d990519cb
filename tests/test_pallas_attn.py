"""Pallas flash-attention kernel parity vs the dense oracle.

The dense path (`_reference_attention` == reference naive_attn_mask
semantics) is the source of truth, exactly as the reference treats its naive
mask (SURVEY.md §4). Runs in interpret mode on CPU; compiled on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transfusion_tpu.ops.pallas_attn import (
    _reference_attention,
    transfusion_flash_attention,
)
from transfusion_tpu.ops.pallas_attn_kernel import flash_attention, supported


def make_qkv(b=2, h=2, n=256, d=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (b, h, n, d)
    return tuple(jax.random.normal(k, shape) * 0.5 for k in ks)


def test_supported_gate():
    assert supported(256, 64)
    assert not supported(100, 64)
    assert not supported(256, 48)


def test_causal_parity():
    q, k, v = make_qkv()
    got = flash_attention(q, k, v, None, True, 50.0)
    want = _reference_attention(q, k, v, None, True, 50.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_span_mask_parity():
    q, k, v = make_qkv(b=2, n=256)
    spans = jnp.array(
        [
            [[0, 40, 40], [1, 130, 64]],
            [[0, 10, 100], [0, 0, 0]],
        ],
        jnp.int32,
    )
    got = flash_attention(q, k, v, spans, False, 50.0)
    want = _reference_attention(q, k, v, spans, False, 50.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_span_crossing_block_boundaries():
    q, k, v = make_qkv(b=1, n=384)
    spans = jnp.array([[[0, 100, 200]]], jnp.int32)  # spans blocks 0..2
    got = flash_attention(q, k, v, spans, False, 50.0)
    want = _reference_attention(q, k, v, spans, False, 50.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_no_softcap():
    q, k, v = make_qkv(n=128)
    got = flash_attention(q, k, v, None, True, 0.0)
    want = _reference_attention(q, k, v, None, True, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_gradients_via_dense_bwd():
    q, k, v = make_qkv(b=1, h=1, n=128)
    spans = jnp.array([[[0, 20, 30]]], jnp.int32)

    def f_flash(q, k, v):
        return flash_attention(q, k, v, spans, False, 50.0).sum()

    def f_dense(q, k, v):
        return _reference_attention(q, k, v, spans, False, 50.0).sum()

    gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_dispatcher_fallback_small():
    # non-tile-aligned seq falls back to dense silently
    q, k, v = make_qkv(n=96)
    out = transfusion_flash_attention(q, k, v, causal=True)
    want = _reference_attention(q, k, v, None, True, 50.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)


def test_transformer_flash_flag_matches_dense():
    from transfusion_tpu.models import Transformer

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 32))
    spans = jnp.array(
        [[[0, 30, 50]], [[0, 100, 80]]], jnp.int32
    )
    times = jnp.zeros((2, 256))
    kw = dict(spans=spans, times=times)

    dense = Transformer(dim=32, depth=2, dim_head=64, heads=2, attn_impl="dense")
    flash = Transformer(dim=32, depth=2, dim_head=64, heads=2, attn_impl="flash")
    params = dense.init(jax.random.PRNGKey(1), x, **kw)

    out_d, _ = dense.apply(params, x, **kw)
    out_f, _ = flash.apply(params, x, **kw)
    np.testing.assert_allclose(
        np.asarray(out_d), np.asarray(out_f), atol=5e-4
    )


def test_gradients_multi_span_and_causal():
    for spans, causal in [
        (jnp.array([[[0, 40, 100], [1, 150, 64]]], jnp.int32), False),
        (None, True),
    ]:
        q, k, v = make_qkv(b=1, h=2, n=256)

        def f_flash(q, k, v):
            return (flash_attention(q, k, v, spans, causal, 50.0) ** 2).sum()

        def f_dense(q, k, v):
            return (_reference_attention(q, k, v, spans, causal, 50.0) ** 2).sum()

        gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_streamed_kernel_matches_dense(monkeypatch):
    """Force the HBM-streaming variant and check parity."""
    import transfusion_tpu.ops.pallas_attn_kernel as K

    monkeypatch.setattr(K, "_MAX_N_TIMES_D_RESIDENT", 1)  # force streaming
    q, k, v = make_qkv(b=1, h=2, n=512, d=64)
    spans = jnp.array([[[0, 100, 150]]], jnp.int32)
    got = K.flash_attention(q, k, v, spans, False, 50.0)
    want = _reference_attention(q, k, v, spans, False, 50.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

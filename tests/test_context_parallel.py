"""Context-parallel attention vs the dense oracle (8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from transfusion_tpu.ops.pallas_attn import _reference_attention
from transfusion_tpu.parallel.context import context_parallel_attention


def make_mesh_ctx(n_ctx):
    devs = np.asarray(jax.devices()[:n_ctx])
    return Mesh(devs, axis_names=("context",))


@pytest.mark.parametrize("n_ctx", [2, 4])
def test_context_parallel_matches_dense(n_ctx):
    mesh = make_mesh_ctx(n_ctx)
    b, h, n, d = 2, 2, 64, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, n, d)) * 0.5 for kk in ks)
    spans = jnp.array(
        [[[0, 10, 20], [1, 40, 12]], [[0, 5, 30], [0, 0, 0]]], jnp.int32
    )

    got = context_parallel_attention(
        q, k, v, spans=spans, causal=False, softcap=50.0, mesh=mesh
    )
    want = _reference_attention(q, k, v, spans, False, 50.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_context_parallel_causal_only():
    mesh = make_mesh_ctx(4)
    b, h, n, d = 1, 2, 64, 16
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (b, h, n, d)) * 0.5 for kk in ks)

    got = context_parallel_attention(
        q, k, v, causal=True, softcap=50.0, mesh=mesh
    )
    want = _reference_attention(q, k, v, None, True, 50.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_context_parallel_grads():
    mesh = make_mesh_ctx(2)
    b, h, n, d = 1, 1, 32, 8
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q, k, v = (jax.random.normal(kk, (b, h, n, d)) * 0.5 for kk in ks)
    spans = jnp.array([[[0, 4, 10]]], jnp.int32)

    f_cp = lambda q, k, v: context_parallel_attention(
        q, k, v, spans=spans, mesh=mesh
    ).sum()
    f_dn = lambda q, k, v: _reference_attention(q, k, v, spans, False, 50.0).sum()

    g_cp = jax.grad(f_cp, argnums=(0, 1, 2))(q, k, v)
    g_dn = jax.grad(f_dn, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_cp, g_dn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


@pytest.mark.parametrize("n_ctx", [2, 4])
def test_ring_attention_matches_dense(n_ctx):
    from transfusion_tpu.parallel.context import ring_attention

    mesh = make_mesh_ctx(n_ctx)
    b, h, n, d = 2, 2, 64, 16
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = (jax.random.normal(kk, (b, h, n, d)) * 0.5 for kk in ks)
    spans = jnp.array(
        [[[0, 10, 20], [1, 40, 12]], [[0, 5, 30], [0, 0, 0]]], jnp.int32
    )

    got = ring_attention(q, k, v, spans=spans, mesh=mesh)
    want = _reference_attention(q, k, v, spans, False, 50.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    got_c = ring_attention(q, k, v, causal=True, mesh=mesh)
    want_c = _reference_attention(q, k, v, None, True, 50.0)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c), atol=2e-5)


def test_ring_attention_grads():
    from transfusion_tpu.parallel.context import ring_attention

    mesh = make_mesh_ctx(2)
    b, h, n, d = 1, 1, 32, 8
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    q, k, v = (jax.random.normal(kk, (b, h, n, d)) * 0.5 for kk in ks)
    spans = jnp.array([[[0, 4, 10]]], jnp.int32)

    f_rg = lambda q, k, v: ring_attention(q, k, v, spans=spans, mesh=mesh).sum()
    f_dn = lambda q, k, v: _reference_attention(q, k, v, spans, False, 50.0).sum()
    g_rg = jax.grad(f_rg, argnums=(0, 1, 2))(q, k, v)
    g_dn = jax.grad(f_dn, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_rg, g_dn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)

"""Context-parallel attention vs the dense oracle (8-device CPU mesh),
plus end-to-end training with the sequence sharded over a 'context' mesh
axis (ring and all-gather schedules reachable via attn_impl)."""

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


# ---------------------------------------------------------------------------
# end-to-end: training with the model's sequence sharded over 'context'
# ---------------------------------------------------------------------------


def _cp_model(attn_impl, mesh=None):
    from transfusion_tpu.models.transfusion import Transfusion

    tcfg = dict(dim=32, depth=2, dim_head=8, heads=4, attn_impl=attn_impl)
    if mesh is not None:
        tcfg["mesh"] = mesh
    return Transfusion(
        num_text_tokens=32,
        dim_latent=8,
        modality_default_shape=(2, 2),
        transformer=tcfg,
        pad_multiple=16,
    )


def _cp_batch():
    rng = np.random.default_rng(0)
    return [
        [
            rng.integers(0, 32, 6).astype(np.int32),
            (0, rng.standard_normal((2, 2, 8)).astype(np.float32)),
        ]
        for _ in range(4)
    ]


def _train_losses(model, mesh, steps=3):
    from transfusion_tpu.training.trainer import Trainer

    trainer = Trainer(model, mesh=mesh, learning_rate=1e-3)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = _cp_batch()
    losses = []
    for i in range(steps):
        state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    return losses


@pytest.mark.parametrize(
    "attn_impl",
    ["ring", pytest.param("cp_allgather", marks=pytest.mark.slow)],
)
def test_train_data_x_context_matches_single_device(attn_impl):
    """3 optimizer steps with data x context sharding == dense single-device."""
    from transfusion_tpu.parallel import make_mesh

    mesh = make_mesh(data=2, context=2)
    want = _train_losses(_cp_model("dense"), mesh=None)
    got = _train_losses(_cp_model(attn_impl, mesh=mesh), mesh=mesh)
    np.testing.assert_allclose(got, want, rtol=2e-4)


@pytest.mark.slow  # >30s cold on the 1-core CI host
def test_train_context_only_ring():
    """Pure sequence sharding (context=4), ring schedule."""
    from transfusion_tpu.parallel import make_mesh

    mesh = make_mesh(context=4)
    want = _train_losses(_cp_model("dense"), mesh=None)
    got = _train_losses(_cp_model("ring", mesh=mesh), mesh=mesh)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_cp_seq_divisibility_error():
    from transfusion_tpu.parallel import make_mesh
    from transfusion_tpu.models.transfusion import Transfusion

    mesh = make_mesh(context=8)
    model = Transfusion(
        num_text_tokens=32,
        dim_latent=8,
        modality_default_shape=(2, 2),
        transformer=dict(
            dim=32, depth=1, dim_head=8, heads=4, attn_impl="ring", mesh=mesh
        ),
        pad_multiple=12,  # not divisible by 8
    )
    params = model.init_params(jax.random.PRNGKey(0))
    packed = model.pack(_cp_batch())
    with pytest.raises(AssertionError, match="divisible by the context"):
        model._loss_impl(
            params, packed, jax.random.PRNGKey(1), None, None,
            prob_uncond=0.0, velocity_delta=1e-3, train=False,
        )


def test_cp_rejects_attention_dropout():
    """ring/cp schedules have no dropout hook — config must be rejected
    (r2 review finding: silently dropping regularization)."""
    import pytest
    from transfusion_tpu.models.transformer import Transformer
    from transfusion_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(context=2)
    t = Transformer(
        dim=32, depth=1, heads=2, dim_head=16, dropout=0.1,
        attn_impl="ring", mesh=mesh,
    )
    x = jnp.zeros((1, 8, 32))
    with pytest.raises(AssertionError, match="dropout"):
        t.init(jax.random.PRNGKey(0), x, causal=True)


# ---------------------------------------------------------------------------
# Pallas-kernel CP path (d >= 32 routes per-shard compute through the flash
# kernel with global offsets; parallel/context.py _kernel_eligible)
# ---------------------------------------------------------------------------


def _qkv32(n=128, b=2, h=2, d=32, seed=7):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(kk, (b, h, n, d)) * 0.5 for kk in ks)


@pytest.mark.parametrize("schedule", ["allgather", "ring"])
def test_cp_kernel_path_matches_dense(schedule):
    from transfusion_tpu.parallel.context import (
        _kernel_eligible,
        context_parallel_attention,
        ring_attention,
    )

    mesh = make_mesh_ctx(4)
    q, k, v = _qkv32()
    n = q.shape[2]
    spans = jnp.array(
        [[[0, 20, 40], [1, 80, 24]], [[0, 10, 60], [0, 0, 0]]], jnp.int32
    )
    assert _kernel_eligible(n // 4, n // 4, 32, False, spans)

    fn = context_parallel_attention if schedule == "allgather" else ring_attention
    got = fn(q, k, v, spans=spans, mesh=mesh)
    want = _reference_attention(q, k, v, spans, False, 50.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)

    got_c = fn(q, k, v, causal=True, mesh=mesh)
    want_c = _reference_attention(q, k, v, None, True, 50.0)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c), atol=3e-5)


@pytest.mark.parametrize("schedule", ["allgather", "ring"])
def test_cp_kernel_path_grads(schedule):
    from transfusion_tpu.parallel.context import (
        context_parallel_attention,
        ring_attention,
    )

    mesh = make_mesh_ctx(2)
    q, k, v = _qkv32(n=64, b=1, h=1, seed=8)
    spans = jnp.array([[[0, 8, 20]]], jnp.int32)

    fn = context_parallel_attention if schedule == "allgather" else ring_attention
    f_cp = lambda q, k, v: (fn(q, k, v, spans=spans, mesh=mesh) ** 2).sum()
    f_dn = lambda q, k, v: (
        _reference_attention(q, k, v, spans, False, 50.0) ** 2
    ).sum()
    g_cp = jax.grad(f_cp, argnums=(0, 1, 2))(q, k, v)
    g_dn = jax.grad(f_dn, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_cp, g_dn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4)

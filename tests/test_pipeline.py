"""Pipeline parallelism (parallel/pipeline.py): GPipe schedule over 'pipe'.

Equivalence target: `Transformer.apply` on a single device (the pipelined
stack must be numerically identical — the layer-0 value-residual mix
injection is exact, see pipeline.py docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from transfusion_tpu.models.transformer import Transformer
from transfusion_tpu.parallel.mesh import make_mesh
from transfusion_tpu.parallel.pipeline import (
    pipeline_transformer_forward,
    stack_block_params,
    unstack_block_params,
)

DIM, DEPTH, HEADS, DH = 64, 4, 2, 16


def _transformer(**kw):
    cfg = dict(
        dim=DIM,
        depth=DEPTH,
        heads=HEADS,
        dim_head=DH,
        unet_skips=False,
        num_residual_streams=1,
    )
    cfg.update(kw)
    return Transformer(**cfg)


def _init(t, b=4, n=32, with_times=True):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n, DIM)), jnp.float32)
    spans = jnp.asarray(
        np.stack([[[0, 4, 8], [1, 16, 8]]] * b), jnp.int32
    )
    times_inst = jnp.asarray(rng.uniform(size=(b, 2)), jnp.float32)
    if with_times:
        params = t.init(
            jax.random.PRNGKey(0), x, times_inst=times_inst, spans=spans,
            rotary_pos=jnp.arange(n),
        )["params"]
    else:
        params = t.init(
            jax.random.PRNGKey(0), x, causal=True, rotary_pos=jnp.arange(n)
        )["params"]
    return params, x, spans, times_inst


def test_stack_unstack_roundtrip():
    t = _transformer()
    params, *_ = _init(t)
    stacked = stack_block_params(params, DEPTH)
    # every leaf leads with depth
    for leaf in jax.tree.leaves(stacked):
        assert leaf.shape[0] == DEPTH
    restored = unstack_block_params(stacked, params, DEPTH)
    jax.tree.map(
        np.testing.assert_array_equal,
        {k: v for k, v in params.items() if k.startswith("block_")},
        {k: v for k, v in restored.items() if k.startswith("block_")},
    )


@pytest.mark.parametrize(
    "data,pipe,microbatches",
    [pytest.param(2, 4, 2, marks=pytest.mark.slow), (1, 2, 4)],
)
def test_pipeline_matches_transformer_joint(data, pipe, microbatches):
    """Joint path: spans + per-instance times, dense mask."""
    t = _transformer()
    params, x, spans, times_inst = _init(t)
    n = x.shape[1]

    ref, _ = t.apply(
        {"params": params}, x, times_inst=times_inst, spans=spans,
        rotary_pos=jnp.arange(n),
    )

    mesh = make_mesh(data=data, pipe=pipe)
    out = pipeline_transformer_forward(
        params, t, mesh, microbatches=microbatches, x=x,
        times_inst=times_inst, spans=spans, rotary_pos=jnp.arange(n),
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=2e-5)


def test_pipeline_matches_transformer_causal_text():
    """Text path: causal, no time conditioning."""
    t = _transformer()
    params, x, *_ = _init(t, with_times=False)
    n = x.shape[1]

    ref, _ = t.apply(
        {"params": params}, x, causal=True, rotary_pos=jnp.arange(n)
    )

    mesh = make_mesh(pipe=4)
    out = pipeline_transformer_forward(
        params, t, mesh, microbatches=4, x=x, causal=True,
        rotary_pos=jnp.arange(n),
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=2e-5)


@pytest.mark.slow  # >30s on the 1-core CI host (VERDICT r4 #3 tiering)
def test_pipeline_grads_match():
    """Gradients through the GPipe schedule equal single-device grads."""
    t = _transformer()
    params, x, spans, times_inst = _init(t)
    n = x.shape[1]
    mesh = make_mesh(pipe=4)

    def loss_single(p):
        out, _ = t.apply(
            {"params": p}, x, times_inst=times_inst, spans=spans,
            rotary_pos=jnp.arange(n),
        )
        return jnp.sum(out**2)

    def loss_pp(p):
        out = pipeline_transformer_forward(
            p, t, mesh, microbatches=2, x=x,
            times_inst=times_inst, spans=spans, rotary_pos=jnp.arange(n),
        )
        return jnp.sum(out**2)

    g_ref = jax.grad(loss_single)(params)
    g_pp = jax.grad(loss_pp)(params)

    # layer-0 mix has no gradient path in either tree; compare real leaves
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pp = dict(
        (jax.tree_util.keystr(kp), v)
        for kp, v in jax.tree_util.tree_leaves_with_path(g_pp)
    )
    checked = 0
    for kp, v in flat_ref:
        key = jax.tree_util.keystr(kp)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_pp[key]), atol=5e-4,
            err_msg=key,
        )
        checked += 1
    assert checked > 10


@pytest.mark.slow  # >30s on the 1-core CI host (VERDICT r4 #3 tiering)
def test_pipeline_remat_matches():
    t = _transformer()
    params, x, spans, times_inst = _init(t)
    n = x.shape[1]
    mesh = make_mesh(pipe=4)
    out = pipeline_transformer_forward(
        params, t, mesh, microbatches=2, x=x,
        times_inst=times_inst, spans=spans, rotary_pos=jnp.arange(n),
    )
    out_r = pipeline_transformer_forward(
        params, t, mesh, microbatches=2, x=x,
        times_inst=times_inst, spans=spans, rotary_pos=jnp.arange(n),
        remat=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-6)


def test_pipeline_requires_unet_skips_off():
    t = _transformer(unet_skips=True)
    b, n = 2, 16
    x = jnp.zeros((b, n, DIM))
    params = t.init(
        jax.random.PRNGKey(0), x, causal=True, rotary_pos=jnp.arange(n)
    )["params"]
    mesh = make_mesh(pipe=4)
    with pytest.raises(AssertionError, match="unet_skips"):
        pipeline_transformer_forward(
            params, t, mesh, microbatches=2, x=x, causal=True,
            rotary_pos=jnp.arange(n),
        )


@pytest.mark.slow  # >30s on the 1-core CI host (VERDICT r4 #3 tiering)
def test_pipeline_text_training_matches_single_device():
    """End-to-end: 3 Adam steps of a causal-LM loss through the pipeline
    equal 3 single-device steps (same init, same data)."""
    t = _transformer()
    vocab, b, n = 64, 4, 32
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, vocab, (b, n)), jnp.int32)

    emb = jnp.asarray(rng.standard_normal((vocab, DIM)) * 0.02, jnp.float32)
    head = jnp.asarray(rng.standard_normal((DIM, vocab)) * 0.02, jnp.float32)
    x0 = emb[tokens]
    tparams = t.init(
        jax.random.PRNGKey(0), x0, causal=True, rotary_pos=jnp.arange(n)
    )["params"]
    params0 = {"emb": emb, "head": head, "transformer": tparams}

    def ce(logits, labels):
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(
            jnp.take_along_axis(logp[:, :-1], labels[:, 1:, None], -1)
        )

    mesh = make_mesh(data=2, pipe=4)

    def loss_pp(p):
        x = p["emb"][tokens]
        out = pipeline_transformer_forward(
            p["transformer"], t, mesh, microbatches=2, x=x, causal=True,
            rotary_pos=jnp.arange(n),
        )
        return ce(out @ p["head"], tokens)

    def loss_sd(p):
        x = p["emb"][tokens]
        out, _ = t.apply(
            {"params": p["transformer"]}, x, causal=True,
            rotary_pos=jnp.arange(n),
        )
        return ce(out @ p["head"], tokens)

    tx = optax.adam(1e-3)

    def train(loss_fn):
        p = params0
        opt = tx.init(p)
        losses = []
        for _ in range(3):
            l, g = jax.value_and_grad(loss_fn)(p)
            upd, opt = tx.update(g, opt, p)
            p = optax.apply_updates(p, upd)
            losses.append(float(l))
        return losses

    l_pp = train(loss_pp)
    l_sd = train(loss_sd)
    np.testing.assert_allclose(l_pp, l_sd, rtol=1e-4)
    assert l_pp[-1] < l_pp[0]


@pytest.mark.slow  # >30s on the 1-core CI host (VERDICT r4 #3 tiering)
def test_pipeline_bf16_matches_transformer():
    """bf16 models: the pipelined time-conditioning must run at the model
    dtype like nn.Dense(dtype=...) does (r2 review finding)."""
    t = _transformer(dtype=jnp.bfloat16)
    params, x, spans, times_inst = _init(t)
    n = x.shape[1]
    ref, _ = t.apply(
        {"params": params}, x, times_inst=times_inst, spans=spans,
        rotary_pos=jnp.arange(n),
    )
    mesh = make_mesh(data=2, pipe=4)
    out = pipeline_transformer_forward(
        params, t, mesh, microbatches=2, x=x,
        times_inst=times_inst, spans=spans, rotary_pos=jnp.arange(n),
    )
    np.testing.assert_allclose(
        np.asarray(ref, np.float32), np.asarray(out, np.float32), atol=3e-2
    )


def test_pipeline_rejects_depth_one():
    t = _transformer(depth=1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, DIM)), jnp.float32)
    params = t.init(
        jax.random.PRNGKey(0), x, causal=True, rotary_pos=jnp.arange(16)
    )["params"]
    with pytest.raises(AssertionError, match="depth >= 2"):
        stack_block_params(params, 1)


@pytest.mark.slow  # >30s on the 1-core CI host (VERDICT r4 #3 tiering)
def test_trainer_pipeline_joint_matches_single_device():
    """Pipeline parallelism through the MODEL API: Trainer(
    pipeline_microbatches=) trains a real Transfusion model (joint
    multimodal packed loss) over a data x pipe mesh, matching 3
    single-device steps exactly (same init, same data, same rng)."""
    from transfusion_tpu.models.transfusion import Transfusion
    from transfusion_tpu.training.trainer import Trainer

    def build():
        return Transfusion(
            num_text_tokens=32,
            dim_latent=8,
            modality_default_shape=(2, 2),
            transformer=dict(
                dim=DIM, depth=DEPTH, dim_head=DH, heads=HEADS,
                unet_skips=False, num_residual_streams=1,
            ),
            pad_multiple=16,
        )

    rng = np.random.default_rng(0)
    # batch 8 / microbatches 4 -> 2 rows per microbatch, divisible by data=2
    batch = [
        [
            rng.integers(0, 32, 6).astype(np.int32),
            (0, rng.standard_normal((2, 2, 8)).astype(np.float32)),
        ]
        for _ in range(8)
    ]

    def run(trainer):
        model = trainer.model
        state = trainer.init_state(jax.random.PRNGKey(0))
        packed = model.pack(batch, shift_friendly=True)
        losses = []
        for i in range(3):
            # fixed key: the stochastic objective (times/noise/CFG drop) is
            # stationary, so the loss must both match single-device AND drop
            state, metrics = trainer.train_step(
                state, packed, jax.random.PRNGKey(7)
            )
            losses.append(float(metrics["loss"]))
        return losses

    mesh = make_mesh(data=2, pipe=4)
    l_pp = run(Trainer(mesh=mesh, pipeline_microbatches=4, model=build()))
    l_sd = run(Trainer(model=build()))
    np.testing.assert_allclose(l_pp, l_sd, rtol=2e-4)
    assert l_pp[-1] < l_pp[0]


def test_trainer_pipeline_validates_config():
    """Actionable errors instead of deep shard_map failures."""
    from transfusion_tpu.models.transfusion import Transfusion
    from transfusion_tpu.training.trainer import Trainer

    def model(**tkw):
        cfg = dict(dim=DIM, depth=DEPTH, dim_head=DH, heads=HEADS,
                   unet_skips=False, num_residual_streams=1)
        cfg.update(tkw)
        return Transfusion(
            num_text_tokens=32, dim_latent=8, modality_default_shape=(2, 2),
            transformer=cfg, pad_multiple=16,
        )

    mesh = make_mesh(data=2, pipe=4)
    with pytest.raises(AssertionError, match="pipe"):
        Trainer(model(), pipeline_microbatches=8)  # no mesh
    with pytest.raises(AssertionError, match="unet_skips"):
        Trainer(model(unet_skips=True), mesh=mesh, pipeline_microbatches=8)
    with pytest.raises(AssertionError, match="depth"):
        Trainer(model(depth=6), mesh=mesh, pipeline_microbatches=8)
    with pytest.raises(AssertionError, match="microbatches"):
        Trainer(model(), mesh=mesh, pipeline_microbatches=2)

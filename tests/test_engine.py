"""Continuous-batching serving engine (models/engine.py).

Greedy parity: a request served through the slot pool — admitted mid-flight
next to other requests, decoded in chunks, retired on budget — must produce
exactly the tokens its prompt gets from a solo `generate_text_only` run.
"""

import jax
import numpy as np
import pytest

from transfusion_tpu.models.engine import ServingEngine, _width_bucket
from transfusion_tpu.models.transfusion import Transfusion


def make_model(attn_impl="dense", **kw):
    return Transfusion(
        num_text_tokens=8,
        dim_latent=16,
        modality_default_shape=(4,),
        transformer=dict(dim=32, depth=2, dim_head=32, heads=2,
                         attn_impl=attn_impl),
        pad_multiple=16,
        **kw,
    )


def solo_greedy(model, params, prompt, n_new):
    import jax.numpy as jnp

    out = model.generate_text_only(
        params, jnp.asarray(prompt)[None], seq_len=len(prompt) + n_new,
        rng=jax.random.PRNGKey(5), temperature=0.0,
    )
    return np.asarray(out)[0].tolist()


def test_width_bucket():
    assert _width_bucket(1) == 128
    assert _width_bucket(128) == 128
    assert _width_bucket(129) == 256
    assert _width_bucket(257) == 512
    assert _width_bucket(512) == 512


@pytest.mark.parametrize("attn_impl", ["dense", "flash"])
def test_engine_matches_solo_greedy(attn_impl):
    """5 ragged requests through a 2-slot pool == their solo greedy runs.

    With max_batch=2 the later requests are admitted only as earlier ones
    retire, so this exercises slot reuse on a dirty cache row too."""
    model = make_model(attn_impl)
    params = model.init_params(jax.random.PRNGKey(0))
    prompts = [
        [model.sos_id, 1, 2],
        [model.sos_id, 3, 4, 5, 6, 7],
        [model.sos_id, 2],
        [model.sos_id, 7, 1],
        [model.sos_id, 5, 5, 5],
    ]
    n_new = 6
    eng = ServingEngine(
        model, params, max_batch=2, max_seq_len=64, decode_chunk=4,
        temperature=0.0,
    )
    done = eng.run([np.asarray(p, np.int32) for p in prompts], n_new)
    assert len(done) == len(prompts)
    assert eng.stats["admitted"] == len(prompts)
    assert eng.stats["generated_tokens"] == len(prompts) * n_new
    by_rid = {r.rid: r for r in done}
    for rid, p in enumerate(prompts):
        want = solo_greedy(model, params, p, n_new)
        assert by_rid[rid].tokens == want, f"request {rid} (len {len(p)})"


def test_engine_early_finish_frees_slot():
    """A short-budget request retires early and its slot is reused while
    the long request keeps decoding — the long row must be unaffected."""
    model = make_model("dense")
    params = model.init_params(jax.random.PRNGKey(0))
    long_p = [model.sos_id, 3, 4, 5, 6, 7]
    shorts = [[model.sos_id, 1], [model.sos_id, 2], [model.sos_id, 4]]

    eng = ServingEngine(
        model, params, max_batch=2, max_seq_len=64, decode_chunk=2,
        temperature=0.0,
    )
    rid_long = eng.submit(np.asarray(long_p, np.int32), 10)
    for s in shorts:
        eng.submit(np.asarray(s, np.int32), 2)
    done = eng.run()
    by_rid = {r.rid: r for r in done}
    assert by_rid[rid_long].tokens == solo_greedy(model, params, long_p, 10)
    for i, s in enumerate(shorts):
        assert by_rid[i + 1].tokens == solo_greedy(model, params, s, 2)


def test_engine_eos_stops_early():
    model = make_model("dense")
    params = model.init_params(jax.random.PRNGKey(0))
    prompt = [model.sos_id, 1, 2]
    # pick the first greedily generated token as the "eos" so the request
    # must finish after exactly one token despite a 10-token budget
    eos = solo_greedy(model, params, prompt, 1)[0]
    eng = ServingEngine(
        model, params, max_batch=2, max_seq_len=64, decode_chunk=4,
        temperature=0.0, eos_id=eos,
    )
    done = eng.run([np.asarray(prompt, np.int32)], 10)
    assert len(done) == 1
    assert done[0].tokens == [eos]
    assert not eng.has_work


def test_engine_int8_smoke():
    model = make_model("flash")
    params = model.init_params(jax.random.PRNGKey(0))
    eng = ServingEngine(
        model, params, max_batch=2, max_seq_len=64, decode_chunk=4,
        kv_quantize=True,
    )
    done = eng.run([np.asarray([model.sos_id, 1], np.int32),
                    np.asarray([model.sos_id, 2, 3], np.int32)], 4)
    assert len(done) == 2
    for r in done:
        assert len(r.tokens) == 4
        assert all(0 <= t < model.num_text_tokens for t in r.tokens)


def test_engine_capacity_guard():
    model = make_model("dense")
    params = model.init_params(jax.random.PRNGKey(0))
    eng = ServingEngine(model, params, max_batch=1, max_seq_len=64)
    with pytest.raises(AssertionError, match="capacity"):
        eng.submit(np.ones(100, np.int32), 100)


def test_engine_sampled_reproducible_per_request():
    """temperature>0: a request's sampled tokens are a pure function of
    (engine rng, rid, position) — identical whether it runs alone or
    co-scheduled with other requests under different chunk sizes
    (per-slot fold-in streams; VERDICT r3 #8)."""
    model = make_model()
    params = model.init_params(jax.random.PRNGKey(0))
    prompt = np.asarray([model.sos_id, 1, 2], np.int32)
    n_new = 5

    def run_engine(extra_prompts, chunk):
        eng = ServingEngine(
            model, params, max_batch=2, max_seq_len=64, decode_chunk=chunk,
            temperature=1.0, rng=jax.random.PRNGKey(7),
        )
        eng.submit(prompt, n_new)  # rid 0 in every configuration
        for p in extra_prompts:
            eng.submit(np.asarray(p, np.int32), n_new + 2)
        done = {r.rid: r for r in eng.run()}
        return done[0].tokens

    solo = run_engine([], chunk=8)
    crowded = run_engine(
        [[model.sos_id, 4, 5, 6], [model.sos_id, 7]], chunk=2
    )
    assert solo == crowded and len(solo) == n_new


def test_choose_chunk_cost_model():
    """The chunk chooser maximizes useful tokens/sec under RTT + k*step
    (VERDICT r3 #4: the engine must not lose to static batching).

    Expensive dispatches + mild budget skew (workload A's shape) must
    stretch chunks far past min(rem); cheap dispatches or clustered-low
    budgets (workload B) must keep admit-promptly short chunks; an empty
    queue must still stop at the drain point."""
    from transfusion_tpu.models.engine import choose_chunk

    # workload-A shape: budgets 16..192, expensive RTT -> stretch >> 16
    rem_a = [16, 40, 64, 90, 120, 150, 170, 192]
    k_a = choose_chunk(rem_a, rtt_s=0.030, step_s=0.001, max_chunk=256)
    assert k_a >= 64, k_a

    # same skew but nearly-free dispatches -> admit promptly (small chunks)
    k_cheap = choose_chunk(rem_a, rtt_s=0.0005, step_s=0.001, max_chunk=256)
    assert k_cheap <= 32, k_cheap

    # workload-B shape: budgets cluster at 16 with one straggler -> the
    # straggler must not hold chunks hostage
    rem_b = [16] * 7 + [256]
    k_b = choose_chunk(rem_b, rtt_s=0.030, step_s=0.001, max_chunk=256)
    assert k_b <= 64, k_b

    # drain: never meaningfully past the last row's budget
    assert choose_chunk([40], rtt_s=0.030, step_s=0.001, max_chunk=256) <= 64
    # degenerate
    assert choose_chunk([], 0.03, 0.001, 256) == 1
    assert choose_chunk([1], 0.03, 0.001, 256) == 1


def test_engine_warmup_is_inert_and_seeds_cost_model():
    """warmup() compiles the pow2 chunk ladder without touching the pool
    (all-inert runs), seeds clean cost samples, and a post-warmup run still
    matches solo greedy decoding."""
    model = make_model()
    params = model.init_params(jax.random.PRNGKey(0))
    eng = ServingEngine(
        model, params, max_batch=2, max_seq_len=256, decode_chunk=8,
        temperature=0.0,
    )
    idx_before = np.asarray(eng.cache["idx"]).copy()
    eng.warmup()
    np.testing.assert_array_equal(np.asarray(eng.cache["idx"]), idx_before)
    assert not eng.active.any() and eng.stats["generated_tokens"] == 0
    # one clean sample per pow2 length (plus the excluded first slot)
    assert sorted(eng._chunk_samples) == [1, 2, 4, 8]
    assert all(len(v) == 2 and v[0] == 0.0 for v in eng._chunk_samples.values())

    prompt, n_new = [model.sos_id, 1, 2], 6
    eng.submit(np.asarray(prompt, np.int32), n_new)
    done = eng.run()
    assert [r.tokens for r in done] == [
        solo_greedy(model, params, prompt, n_new)
    ]


def test_serve_auto_dispatch_routes_and_matches_solo(monkeypatch):
    """serve() picks a path via plan_dispatch and both paths return each
    prompt's solo greedy tokens in submission order."""
    import transfusion_tpu.models.serving as serving_mod

    model = make_model()
    params = model.init_params(jax.random.PRNGKey(0))
    prompts = [
        np.asarray([model.sos_id, 1, 2], np.int32),
        np.asarray([model.sos_id, 3, 4, 5], np.int32),
        np.asarray([model.sos_id, 2], np.int32),
    ]
    budgets = [3, 5, 2]
    want = [
        solo_greedy(model, params, p.tolist(), b)
        for p, b in zip(prompts, budgets)
    ]

    for force in ("engine", "static"):
        monkeypatch.setattr(
            serving_mod, "plan_dispatch", lambda *a, **k: force
        )
        eng = ServingEngine(
            model, params, max_batch=2, max_seq_len=128, decode_chunk=8,
            temperature=0.0,
        )
        got = eng.serve(prompts, budgets)
        assert got == want, force


def test_engine_metrics_schema():
    """metrics= wiring (VERDICT r4 #8): one JSONL row per tick with the
    operator-facing schema, and admitted/retired counts that conserve the
    workload."""
    from transfusion_tpu.training.metrics import MetricsLogger

    model = make_model()
    params = model.init_params(jax.random.PRNGKey(0))
    log = MetricsLogger()
    eng = ServingEngine(
        model, params, max_batch=2, max_seq_len=256, decode_chunk=8,
        temperature=0.0, metrics=log,
    )
    prompts = [[model.sos_id, 1], [model.sos_id, 2, 3], [model.sos_id, 4]]
    for p in prompts:
        eng.submit(np.asarray(p, np.int32), 5)
    done = eng.run()
    assert len(done) == len(prompts)
    assert len(log.history) >= 2  # 3 requests through a 2-slot pool
    want = {
        "admitted", "retired", "chunk_k", "chunk_seconds",
        "cost_model_residual_s", "emitted_tokens", "active_slots",
        "queue_depth",
    }
    for row in log.history:
        assert want <= set(row), sorted(want - set(row))
    assert sum(r["admitted"] for r in log.history) == len(prompts)
    assert sum(r["retired"] for r in log.history) == len(prompts)
    assert sum(r["emitted_tokens"] for r in log.history) == 5 * len(prompts)


def test_static_step_at_refits_dispatch_ratio():
    """warmup(fit_cap_slope=True) replaces the hardcoded STATIC_STEP_RATIO
    with a measured capacity slope: static_step_at(cap) must interpolate
    between the engine's own step cost (cap == engine cap -> no dead slots)
    and a floored fraction of it, and plan_dispatch must accept the
    override (VERDICT r4 weak #4)."""
    from transfusion_tpu.models.serving import plan_dispatch

    model = make_model()
    params = model.init_params(jax.random.PRNGKey(0))
    eng = ServingEngine(
        model, params, max_batch=2, max_seq_len=256, decode_chunk=8,
        temperature=0.0,
    )
    assert eng.static_step_at(128) is None  # unfitted -> fallback constant
    eng.warmup(fit_cap_slope=True)
    if eng._cap_slope is None:
        pytest.skip("slope fit rejected as noise on this host")
    full = eng.static_step_at(eng.cap)
    small = eng.static_step_at(128)
    assert abs(full - eng._step_est) < 1e-12
    assert 0 < small <= full
    assert small >= 0.2 * eng._step_est  # floor
    # the planner consumes the measured value
    assert plan_dispatch(
        [16] * 4, 2, eng._rtt_est, eng._step_est, static_step_s=small
    ) in ("engine", "static")

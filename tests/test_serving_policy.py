"""Serving auto-policy: the measured crossover table (docs_evidence.md,
"Serving decode") must be what plan_serving encodes, and the model API must
consult it when kv_quantize is left at None."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transfusion_tpu.models.serving import ServingPlan, plan_serving
from transfusion_tpu.models.transfusion import Transfusion


# the four measured corners of the serving-decode table plus the exclusions
@pytest.mark.parametrize(
    "cap,batch,kwargs,kernel,int8",
    [
        # b=1 hist=2048: dispatch-floor regime — dense + bf16
        (2048, 1, {}, False, False),
        # b=1 hist=8192: kernel + int8 both win
        (8192, 1, {}, True, True),
        # b=8 hist=2048: int8 wins but only via the in-kernel dequant;
        # kernel not at the cap crossover -> dense + bf16 (int8 through the
        # XLA dense path is measured SLOWER than bf16)
        (2048, 8, {}, False, False),
        # b=8 hist=8192: kernel + int8
        (8192, 8, {}, True, True),
        # structural exclusions always force dense + bf16
        (32768, 8, dict(laser=True), False, False),
        (32768, 8, dict(has_spans=True), False, False),
        (32768, 8, dict(tokens_per_step=4), False, False),
        (32768, 8, dict(flash=False), False, False),
    ],
)
def test_plan_serving_crossovers(cap, batch, kwargs, kernel, int8):
    plan = plan_serving(cap, batch, **kwargs)
    assert isinstance(plan, ServingPlan)
    assert plan.use_decode_kernel == kernel, plan.reasons
    assert plan.kv_quantize == int8, plan.reasons
    assert plan.reasons  # every decision records why


def test_int8_needs_kernel():
    """int8 via the XLA dense path materializes the dequantized cache in
    HBM each step (measured slower than bf16) — the policy must never pick
    int8 without the kernel."""
    for cap in (128, 1024, 2048, 4096, 8192, 32768):
        for batch in (1, 4, 8, 32):
            plan = plan_serving(cap, batch)
            assert not (plan.kv_quantize and not plan.use_decode_kernel)


def _tiny_flash_model():
    return Transfusion(
        num_text_tokens=32,
        dim_latent=8,
        modality_default_shape=(2, 2),
        transformer=dict(
            dim=32, depth=1, dim_head=16, heads=2, attn_impl="flash"
        ),
        pad_multiple=16,
    )


def test_resolver_auto_vs_explicit():
    model = _tiny_flash_model()
    # auto, small cap: dense layout, bf16
    q, t = model._resolve_serving_plan(256, 1, None)
    assert (q, t) == (False, False)
    # auto, serving-scale cap: kernel layout + int8
    q, t = model._resolve_serving_plan(8192, 1, None)
    assert (q, t) == (True, True)
    # explicit flags keep the legacy layout rule (transposed iff flash)
    q, t = model._resolve_serving_plan(8192, 1, False)
    assert (q, t) == (False, True)
    q, t = model._resolve_serving_plan(256, 1, True)
    assert (q, t) == (True, True)


def test_generate_text_only_auto_policy_runs():
    """End-to-end: default kv_quantize=None routes through the policy and
    produces tokens (small cap -> plain layout, dense cached path)."""
    model = _tiny_flash_model()
    params = model.init_params(jax.random.PRNGKey(0))
    prompt = jnp.asarray(np.zeros((1, 4), np.int32))
    out = model.generate_text_only(
        params, prompt, seq_len=12, rng=jax.random.PRNGKey(1)
    )
    assert out.shape == (1, 8)
    assert int(jnp.max(out)) < model.num_text_tokens


# ---------------------------------------------------------------------------
# engine-vs-static dispatch planning (r4)
# ---------------------------------------------------------------------------


def test_plan_dispatch_measured_workloads():
    """Fitted cost model (rtt 36.7ms, step 2.61ms — probe_engine.py), r5
    LPT world: serve() groups static pools budget-descending, so workload
    B's six 256-budget poles share ONE pool instead of dragging six —
    static batching now wins BOTH probe workloads in the sim (the r4
    "engine 1.18x on bimodal" was measured against FIFO static, a
    strictly worse baseline that serve() no longer uses). The engine's
    remaining win is online/streaming arrivals, which plan_dispatch does
    not gate."""
    import numpy as np

    from transfusion_tpu.models.serving import plan_dispatch

    rng = np.random.default_rng(0)
    rtt, step = 0.0367, 0.00261

    _ = rng.integers(64, 512, 16)  # match the probe's draw order
    budgets_a = np.concatenate(
        [rng.integers(16, 48, 12), rng.integers(128, 192, 4)]
    )
    rng.shuffle(budgets_a)
    assert plan_dispatch(budgets_a.tolist(), 8, rtt, step) == "static"

    budgets_b = [256 if i % 8 == 0 else 16 for i in range(48)]
    assert plan_dispatch(budgets_b, 8, rtt, step) == "static"

    # degenerate: empty queue
    assert plan_dispatch([], 8, rtt, step) == "static"


def test_estimate_times_are_sane():
    from transfusion_tpu.models.serving import (
        estimate_engine_time,
        estimate_static_time,
    )

    rtt, step = 0.035, 0.0025
    # one uniform pool: static = 2 dispatches + b steps; the engine can't
    # beat it (same steps, >= as many dispatches)
    s = estimate_static_time([64] * 8, 8, rtt, step)
    e = estimate_engine_time([64] * 8, 8, rtt, step)
    assert s <= e
    # deep bimodal queue at EQUAL per-step cost: LPT static (all 256-poles
    # in one pool) and the LPT engine pay nearly the same scan steps; the
    # engine adds admission dispatches, so static must not lose big and
    # the two must stay within ~35% (the engine pays ~6 extra admissions)
    bimodal = [256 if i % 8 == 0 else 16 for i in range(48)]
    s2 = estimate_static_time(bimodal, 8, rtt, step)
    e2 = estimate_engine_time(bimodal, 8, rtt, step)
    assert s2 <= e2 + 1e-9 < 1.35 * s2, (e2, s2)


# ---------------------------------------------------------------------------
# mm-engine-vs-waves dispatch planning (r5)
# ---------------------------------------------------------------------------


def test_plan_dispatch_mm_workloads():
    """r5 evolution of the static-batch dispatch decision, each step
    measured/simulated honestly:
      1. per-request budgets removed waves' over-generation (r4's 2.19x
         deep-skew engine edge was mostly that artifact);
      2. LPT ordering (budget-descending admission, serve() both branches)
         removed most of the REMAINING engine edge: waves of similar
         budgets drain together, so slot-refill has little left to
         exploit on a fully-known static pool.
    For static serve() batches the planner therefore picks waves broadly
    (sorted waves are near-optimal offline schedules); the engine's
    structural win is ONLINE serving — streaming arrivals through
    submit()/run(), which no planner gates."""
    from transfusion_tpu.models.serving import _simulate_mm, plan_dispatch_mm

    rtt, step, ode = 0.03, 0.002, 1.0

    deep = ([(24, 0)] * 7 + [(512, 0)]) * 4
    mixed = ([(24, 0)] * 7 + [(200, 2)]) * 4
    clustered = [(64, 0)] * 8
    mild = [(t, 0) for t in (48, 56, 64, 64, 72, 80, 88, 96)]

    for reqs, seg in ((deep, 0), (mixed, 196), (clustered, 196), (mild, 0)):
        assert plan_dispatch_mm(
            reqs, 8, rtt, step, ode, seg_tokens=seg
        ) == "waves"

    # degenerate: empty queue
    assert plan_dispatch_mm([], 8) == "waves"

    # ...but the margin must stay honest: LPT-engine and LPT-waves are
    # near-TIES on skewed deep queues (not waves blowouts) — if the sim
    # starts claiming waves win big, its engine model has rotted
    for reqs, seg in ((deep, 0), (probe_shape(), 196)):
        e = _simulate_mm(reqs, 8, rtt, step, ode, waves=False,
                         max_chunk=64, seg_tokens=seg)
        w = _simulate_mm(reqs, 8, rtt, step, ode, waves=True,
                         max_chunk=64, seg_tokens=seg)
        assert 0.9 < e / w < 1.15, (e, w)


def probe_shape():
    return ([(24, 0)] * 7 + [(40, 1)]) * 3

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
    """The planner must reproduce the measured probe outcomes with the
    on-TPU fitted cost model (rtt 36.7ms, step 2.61ms — probe_engine.py):
    workload A (16 req, mild skew, 2 pool waves) measured 0.59x engine ->
    static; workload B (48 req, bimodal 16/256, deep queue) measured the
    engine winning -> engine."""
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
    assert plan_dispatch(budgets_b, 8, rtt, step) == "engine"

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
    # deep bimodal queue: the engine refills retired slots -> fewer wasted
    # scan steps than 6 static pools each decoding 256
    s2 = estimate_static_time([256 if i % 8 == 0 else 16 for i in range(48)],
                              8, rtt, step)
    e2 = estimate_engine_time([256 if i % 8 == 0 else 16 for i in range(48)],
                              8, rtt, step)
    assert e2 < s2


# ---------------------------------------------------------------------------
# mm-engine-vs-waves dispatch planning (r5)
# ---------------------------------------------------------------------------


def test_plan_dispatch_mm_workloads():
    """Since sample_batch honors per-request budgets (r5), waves no longer
    over-generate — the engine's remaining structural edge is slot refill:
    a drained member's slot takes new queue work instead of idling until
    the wave's slowest member (long pole) finishes, amortizing the long
    pole's chunk dispatches across fresh requests. The planner must pick
    the engine exactly where that edge is real (budget-skewed DEEP queues)
    and waves where it isn't (clustered budgets / single wave — the r3
    text-engine lesson, 0.49x pre-cost-model)."""
    from transfusion_tpu.models.serving import _simulate_mm, plan_dispatch_mm

    rtt, step, ode = 0.03, 0.002, 1.0

    # deep queue, one 512-token long pole per 8 requests: each wave pays
    # the full pole ladder; the engine pays it ~once for the whole queue
    deep = ([(24, 0)] * 7 + [(512, 0)]) * 4
    assert plan_dispatch_mm(deep, 8, rtt, step, ode) == "engine"

    # segments mixed through a deep skewed queue: same refill edge plus
    # grouped-ODE sharing
    mixed = ([(24, 0)] * 7 + [(200, 2)]) * 4
    assert plan_dispatch_mm(
        mixed, 8, rtt, step, ode, seg_tokens=196
    ) == "engine"

    clustered = [(64, 0)] * 8
    assert plan_dispatch_mm(
        clustered, 8, rtt, step, ode, seg_tokens=196
    ) == "waves"

    # mild text-budget skew, one wave: continuous admission only adds
    # dispatches
    mild = [(t, 0) for t in (48, 56, 64, 64, 72, 80, 88, 96)]
    assert plan_dispatch_mm(mild, 8, rtt, step, ode) == "waves"

    # degenerate: empty queue
    assert plan_dispatch_mm([], 8) == "waves"

    # budget-faithful waves: the r4 probe shape (one 40-token+1-seg member
    # per 8) is now nearly tied — the planner must NOT claim a >5% engine
    # edge that per-request budgets erased
    probe = ([(24, 0)] * 7 + [(40, 1)]) * 3
    e = _simulate_mm(probe, 8, rtt, step, ode, waves=False, max_chunk=64,
                     seg_tokens=196)
    w = _simulate_mm(probe, 8, rtt, step, ode, waves=True, max_chunk=64,
                     seg_tokens=196)
    assert 0.9 < e / w <= 1.0

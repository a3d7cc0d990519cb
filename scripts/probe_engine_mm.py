"""Multimodal continuous batching vs wave-batched sample_batch on the TPU,
on BOTH workload shapes, with the fitted planner's decision checked against
the measured winner (VERDICT r4 #2).

Workloads:
  deep-skew   — N mixed requests (mostly short text-only, a minority with a
                forced 14x14 image + long text tail) on an R-slot pool.
                Waves run to the slowest member; the engine refills freed
                slots and gives each request its own budget. Engine turf.
  mild-skew   — every request carries one image + a similar text tail,
                budgets clustered. Wave members park/retire together, so
                continuous admission only adds dispatches. Waves turf
                (the text engine lost 2x here before its r4 cost model).

For each: measure both paths directly, print the engine/waves speedup, and
print what `serve(plan_only=True)` would have picked from the warmup-fitted
cost model — auto-dispatch is correct iff it picks the measured winner.

Run (real TPU): python scripts/probe_engine_mm.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

R = 8
KW = dict(
    text_temperature=0.0,
    modality_steps=16,
    cfg_scale=3.0,
    return_unprocessed_modalities=True,
)


def build_model():
    from transfusion_tpu.models.transfusion import Transfusion

    return Transfusion(
        num_text_tokens=256,
        dim_latent=32,
        modality_default_shape=(14, 14),
        transformer=dict(dim=384, depth=8, dim_head=64, heads=8,
                         attn_impl="flash"),
        pad_multiple=64,
        dtype=jnp.bfloat16,
    )


def deep_skew(m, rng, n=32):
    """Deep queue with one long pole per 8: 7/8 cheap 24-token text
    continuations, 1/8 forced image + LONG text tail (budget 512). Since
    sample_batch honors per-request budgets (r5), the engine's edge is
    slot refill: waves idle 7 slots while their pole drains; the engine
    amortizes the pole's chunk dispatches across fresh queue work."""
    som = m.som_ids[0]
    prompts, budgets, segs = [], [], []
    for i in range(n):
        h = int(rng.integers(48, 200))
        hist = rng.integers(0, 256, h).astype(np.int32)
        if i % 8 == 0:
            prompts.append(
                [np.concatenate([hist, np.asarray([som], np.int32)])]
            )
            budgets.append(512)
            segs.append(1.0)
        else:
            prompts.append([hist])
            budgets.append(24)
            segs.append(0.0)
    return prompts, budgets, segs


def mild_skew(m, rng, n=16):
    som = m.som_ids[0]
    prompts, budgets, segs = [], [], []
    for _ in range(n):
        h = int(rng.integers(48, 96))
        hist = rng.integers(0, 256, h).astype(np.int32)
        prompts.append([np.concatenate([hist, np.asarray([som], np.int32)])])
        budgets.append(int(196 + 16 + rng.integers(0, 9)))  # clustered
        segs.append(1.0)
    return prompts, budgets, segs


def useful(outs_items):
    tot = 0
    for items in outs_items:
        for it in items:
            tot += (
                int(np.prod(np.asarray(it[1]).shape[:-1]))
                if isinstance(it, tuple)
                else len(it)
            )
    return tot


def run_workload(name, m, params, prompts, budgets, segs):
    from transfusion_tpu.models.engine_mm import MultimodalServingEngine

    n = len(prompts)
    print(f"\n=== workload: {name} ({n} requests, pool {R}) ===")

    def make_engine():
        return MultimodalServingEngine.for_workload(
            m, params, prompts, max(budgets), max_requests=R,
            rng=jax.random.PRNGKey(100), **KW,
        )

    # warm every trace once (shared jit cache across instances) and keep the
    # fitted cost model around for the planner readout
    eng0 = make_engine()
    eng0.warmup()
    plan = eng0.serve(
        prompts, budgets, expected_segments=segs, plan_only=True
    )

    # ---- waves of R via sample_batch (LPT order, as serve() forms them) -
    lpt = sorted(range(n), key=lambda i: (-budgets[i], i))

    def run_waves():
        outs = [None] * n
        for i in range(0, n, R):
            idxs = lpt[i : i + R]
            got = m.sample_batch(
                params, [prompts[j] for j in idxs],
                rng=jax.random.PRNGKey(100),
                max_length=[budgets[j] for j in idxs], **KW,
            )
            for j, o in zip(idxs, got):
                outs[j] = o
        return outs

    run_waves()  # compile
    t0 = time.perf_counter()
    waves = run_waves()
    dt_w = time.perf_counter() - t0
    print(f"  sample_batch waves: {dt_w:6.2f}s ({n / dt_w:5.2f} req/s, "
          f"{useful(waves) / dt_w:6.0f} useful tok/s)")

    # ---- continuous engine ------------------------------------------------
    def run_engine():
        eng = make_engine()
        eng._rtt_est, eng._step_est = eng0._rtt_est, eng0._step_est
        eng._ode_samples = {
            k: list(v) for k, v in eng0._ode_samples.items()
        }
        eng._cost_frozen = True
        for j in lpt:  # serve()'s engine branch admits LPT too
            eng.submit(prompts[j], max_length=budgets[j])
        fin = eng.run()
        return [f.output for f in fin], eng.stats

    run_engine()  # compile any residual trace
    t0 = time.perf_counter()
    outs, stats = run_engine()
    dt_e = time.perf_counter() - t0
    print(f"  engine:             {dt_e:6.2f}s ({n / dt_e:5.2f} req/s, "
          f"{useful(outs) / dt_e:6.0f} useful tok/s)")

    speedup = dt_w / dt_e
    winner = "engine" if dt_e < dt_w else "waves"
    ok = plan == winner
    print(f"  engine/waves: {speedup:.2f}x | measured winner: {winner} | "
          f"planner chose: {plan} -> {'CORRECT' if ok else 'WRONG'}")
    print(f"  engine stats: {stats}")
    return {"workload": name, "waves_s": dt_w, "engine_s": dt_e,
            "speedup": speedup, "plan": plan, "winner": winner, "ok": ok}


def main():
    print("devices:", jax.devices())
    m = build_model()
    params = m.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    rows = [
        run_workload("deep-skew", m, params, *deep_skew(m, rng)),
        run_workload("mild-skew", m, params, *mild_skew(m, rng)),
    ]
    print("\nsummary:")
    for r in rows:
        print(f"  {r['workload']:10s} engine/waves {r['speedup']:.2f}x, "
              f"planner {r['plan']} ({'ok' if r['ok'] else 'WRONG'})")


if __name__ == "__main__":
    main()

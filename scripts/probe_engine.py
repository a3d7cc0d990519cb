"""Continuous batching vs static batching: useful tokens/sec on a mixed
workload.

Static batching (`generate_text_batch`) decodes every request in the pool
for the LONGEST budget in that pool — short requests burn slots on garbage
tokens. The engine retires rows the moment they finish and admits queued
requests into the freed slots, so useful throughput should approach the
pool's decode rate regardless of budget skew.

Workload: 16 requests, histories 64-512, budgets 16-192 (skewed), pool of
8 slots.

Run (real TPU): python scripts/probe_engine.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from transfusion_tpu.models.engine import ServingEngine
    from transfusion_tpu.models.transfusion import Transfusion

    print("devices:", jax.devices())
    model = Transfusion(
        num_text_tokens=256,
        dim_latent=32,
        modality_default_shape=(14, 14),
        transformer=dict(dim=384, depth=8, dim_head=64, heads=8,
                         attn_impl="flash"),
        pad_multiple=64,
        dtype=jnp.bfloat16,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    n_req, pool = 16, 8
    hists = rng.integers(64, 512, n_req)
    budgets = np.concatenate(
        [rng.integers(16, 48, n_req - 4), rng.integers(128, 192, 4)]
    )
    rng.shuffle(budgets)
    prompts = [
        rng.integers(0, 256, h).astype(np.int32) for h in hists
    ]
    useful = int(budgets.sum())
    print(f"{n_req} requests, budgets {sorted(budgets.tolist())}, "
          f"useful tokens {useful}")

    # --- static batching: pools of 8, everyone decodes max(budget) --------
    def run_static():
        out_toks = 0
        for i in range(0, n_req, pool):
            grp = slice(i, i + pool)
            mx = int(budgets[grp].max())
            toks = model.generate_text_batch(
                params, prompts[grp], max_new_tokens=mx,
                rng=jax.random.PRNGKey(1), temperature=0.0,
            )
            float(jnp.sum(toks))  # force
            out_toks += int(budgets[grp].sum())  # useful only
        return out_toks

    run_static()  # compile
    t0 = time.perf_counter()
    got = run_static()
    dt_static = time.perf_counter() - t0
    print(f"static: {got} useful tok in {dt_static:.2f}s "
          f"({got/dt_static:.1f} useful tok/s)")

    # --- engine ------------------------------------------------------------
    # pool cap sized to the workload (for_workload): the static path gets
    # exactly-sized caches for free, so an oversized engine cap would tax
    # every decode step's attention with dead slots
    def warmed_pair(ps, bs):
        """(warm engine, timed twin) — the twin shares the warm engine's
        compiled fns and frozen cost fit so its run compiles nothing."""
        e_warm = ServingEngine.for_workload(
            model, params, list(ps), [int(b) for b in bs],
            max_batch=pool, temperature=0.0,
        )
        e_warm.warmup()
        e_timed = ServingEngine.for_workload(
            model, params, list(ps), [int(b) for b in bs],
            max_batch=pool, temperature=0.0,
        )
        e_timed._admit_fns = e_warm._admit_fns
        e_timed._decode_fn = e_warm._decode_fn
        e_timed._rtt_est, e_timed._step_est = e_warm._rtt_est, e_warm._step_est
        e_timed._cost_frozen = True
        return e_warm, e_timed

    eng, eng2 = warmed_pair(prompts, budgets)
    for p_, b in zip(prompts, budgets):
        eng.submit(p_, int(b))
    eng.run()  # compile pass for admission widths (jits are per-engine)

    for p_, b in zip(prompts, budgets):
        eng2.submit(p_, int(b))
    t0 = time.perf_counter()
    done = eng2.run()
    dt_eng = time.perf_counter() - t0
    got = sum(len(r.tokens) for r in done)
    print(f"engine: {got} useful tok in {dt_eng:.2f}s "
          f"({got/dt_eng:.1f} useful tok/s)  "
          f"[{eng2.stats['decode_chunks']} chunks, cap {eng2.cap}, "
          f"decode {eng2.stats['decode_time_s']:.2f}s, "
          f"fit rtt={eng._rtt_est*1e3:.1f}ms step={eng._step_est*1e3:.2f}ms]")
    print(f"speedup: {dt_static/dt_eng:.2f}x")

    # --- scenario B: bimodal budgets, deep queue ---------------------------
    # (the shape continuous batching exists for: a few long generations must
    # not hold 7 of 8 slots hostage while short requests queue)
    n_req2 = 48
    hists2 = rng.integers(64, 256, n_req2)
    budgets2 = np.asarray([256 if i % 8 == 0 else 16 for i in range(n_req2)])
    prompts2 = [rng.integers(0, 256, h).astype(np.int32) for h in hists2]
    useful2 = int(budgets2.sum())
    print(f"\nscenario B: {n_req2} requests, {useful2} useful tokens, "
          "budgets 16 (7/8) / 256 (1/8)")

    def run_static2():
        for i in range(0, n_req2, pool):
            grp = slice(i, i + pool)
            toks = model.generate_text_batch(
                params, prompts2[grp], max_new_tokens=int(budgets2[grp].max()),
                rng=jax.random.PRNGKey(1), temperature=0.0,
            )
            float(jnp.sum(toks))

    run_static2()  # compile
    t0 = time.perf_counter()
    run_static2()
    dt_s2 = time.perf_counter() - t0
    print(f"static: {useful2} useful tok in {dt_s2:.2f}s "
          f"({useful2/dt_s2:.1f} useful tok/s)")

    e3, e4 = warmed_pair(prompts2, budgets2)
    for p_, b in zip(prompts2, budgets2):
        e3.submit(p_, int(b))
    e3.run()  # compile any new (width, nb)/k combos

    for p_, b in zip(prompts2, budgets2):
        e4.submit(p_, int(b))
    t0 = time.perf_counter()
    done = e4.run()
    dt_e2 = time.perf_counter() - t0
    got = sum(len(r.tokens) for r in done)
    print(f"engine: {got} useful tok in {dt_e2:.2f}s "
          f"({got/dt_e2:.1f} useful tok/s)  "
          f"[{e4.stats['decode_chunks']} chunks, cap {e4.cap}, "
          f"fit rtt={e3._rtt_est*1e3:.1f}ms step={e3._step_est*1e3:.2f}ms]")
    print(f"speedup: {dt_s2/dt_e2:.2f}x")

    # --- auto dispatch (serve(): plan_dispatch from the fitted model) ------
    from transfusion_tpu.models.serving import plan_dispatch

    def auto_twin(ps, bs, e_warm):
        """Fresh pool sharing e_warm's compiled fns + frozen fit."""
        e = ServingEngine.for_workload(
            model, params, list(ps), [int(b) for b in bs],
            max_batch=pool, temperature=0.0,
        )
        e._admit_fns, e._decode_fn = e_warm._admit_fns, e_warm._decode_fn
        e._rtt_est, e._step_est = e_warm._rtt_est, e_warm._step_est
        e._cost_frozen = True
        return e

    for name, (ps, bs, e_warm, dt_static_ref) in {
        "A": (prompts, budgets, eng, dt_static),
        "B": (prompts2, budgets2, e3, dt_s2),
    }.items():
        plan = plan_dispatch(
            [int(b) for b in bs], pool, e_warm._rtt_est, e_warm._step_est
        )
        e5 = auto_twin(ps, bs, e_warm)
        e5.serve(list(ps), [int(b) for b in bs])  # compile (static leg jits)
        e6 = auto_twin(ps, bs, e_warm)
        t0 = time.perf_counter()
        out = e6.serve(list(ps), [int(b) for b in bs])
        dt_auto = time.perf_counter() - t0
        useful_n = sum(len(r) for r in out)
        print(f"auto[{name}] -> {plan}: {useful_n} tok in {dt_auto:.2f}s "
              f"({useful_n/dt_auto:.1f} tok/s)  "
              f"vs static {dt_static_ref/dt_auto:.2f}x")


if __name__ == "__main__":
    main()

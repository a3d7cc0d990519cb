"""Multimodal continuous batching vs wave-batched sample_batch on the TPU.

Deep skewed queue: N mixed requests (mostly short text-only, a minority
with a forced 14x14 image segment + long text tail) served on a pool of R
slots. `sample_batch` processes fixed waves of R — every wave runs until
its SLOWEST member finishes, so short members idle their slots.
`MultimodalServingEngine` admits from the queue the moment a slot frees.

Run (real TPU): python scripts/probe_engine_mm.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from transfusion_tpu.models.engine_mm import MultimodalServingEngine
    from transfusion_tpu.models.transfusion import Transfusion

    print("devices:", jax.devices())
    m = Transfusion(
        num_text_tokens=256,
        dim_latent=32,
        modality_default_shape=(14, 14),
        transformer=dict(dim=384, depth=8, dim_head=64, heads=8,
                         attn_impl="flash"),
        pad_multiple=64,
        dtype=jnp.bfloat16,
    )
    params = m.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    R = 8
    N = 24
    som = m.som_ids[0]
    prompts, budgets = [], []
    for i in range(N):
        h = int(rng.integers(48, 200))
        hist = rng.integers(0, 256, h).astype(np.int32)
        if i % 8 == 0:
            # expensive: forced image (196 latent rows) + text tail
            prompts.append([np.concatenate(
                [hist, np.asarray([som], np.int32)]
            )])
            budgets.append(236)
        else:
            # cheap: short text continuation
            prompts.append([hist])
            budgets.append(24)
    kw = dict(
        text_temperature=0.0,
        modality_steps=16,
        cfg_scale=3.0,
        return_unprocessed_modalities=True,
    )

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

    # ---- waves of R via sample_batch -----------------------------------
    def run_waves():
        outs = []
        for i in range(0, N, R):
            grp = prompts[i : i + R]
            grp_budget = max(budgets[i : i + R])
            outs.extend(m.sample_batch(
                params, grp, rng=jax.random.PRNGKey(100),
                max_length=grp_budget, **kw,
            ))
        return outs

    run_waves()  # compile
    t0 = time.perf_counter()
    waves = run_waves()
    dt_w = time.perf_counter() - t0
    u_w = useful(waves)
    print(f"sample_batch waves: {N} req in {dt_w:.2f}s "
          f"({N / dt_w:.2f} req/s, {u_w / dt_w:.0f} useful tok/s)")

    # ---- continuous engine ----------------------------------------------
    def make_engine():
        return MultimodalServingEngine.for_workload(
            m, params, prompts, max(budgets), max_requests=R,
            modality_steps=16, cfg_scale=3.0, text_temperature=0.0,
            return_unprocessed_modalities=True,
            rng=jax.random.PRNGKey(100),
        )

    def run_engine():
        eng = make_engine()
        for p, b in zip(prompts, budgets):
            eng.submit(p, max_length=b)
        fin = eng.run()
        return [f.output for f in fin], eng.stats

    run_engine()  # compile
    t0 = time.perf_counter()
    outs, stats = run_engine()
    dt_e = time.perf_counter() - t0
    u_e = useful(outs)
    print(f"engine:             {N} req in {dt_e:.2f}s "
          f"({N / dt_e:.2f} req/s, {u_e / dt_e:.0f} useful tok/s)")
    print(f"engine/waves speedup: {dt_w / dt_e:.2f}x")
    print("engine stats:", stats)


if __name__ == "__main__":
    main()

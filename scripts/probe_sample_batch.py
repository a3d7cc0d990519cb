"""Batched vs solo multimodal sampling throughput on the real TPU.

The reference's sample() is batch-1; sample_batch() shares dispatches
across R requests (pooled cache, batched text ticks, shape-grouped ODE
segments). This probe times R mixed text+image requests solo (R sample()
loops) vs batched (one sample_batch() call) and reports requests/sec.

Run (real TPU): python scripts/probe_sample_batch.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
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
    som = m.som_ids[0]
    # mixed workload: every request = text history -> forced image
    # (meta-free som -> default 14x14 = 196 latent rows) -> text tail;
    # budget ~40 text tokens + one ODE segment each
    prompts = [
        [np.concatenate([
            rng.integers(0, 256, int(h)).astype(np.int32),
            np.asarray([som], np.int32),
        ])]
        for h in rng.integers(48, 200, R)
    ]
    kw = dict(
        max_length=236,  # 196 modality rows + ~40 text tokens
        text_temperature=0.0,
        modality_steps=16,
        cfg_scale=3.0,
        return_unprocessed_modalities=True,
    )

    # ---- solo: R sample(cache_kv=True) loops --------------------------
    def run_solo():
        outs = []
        for i, p in enumerate(prompts):
            outs.append(m.sample(
                params, p, rng=jax.random.PRNGKey(100 + i),
                cache_kv=True, **kw,
            ))
        return outs

    run_solo()  # compile
    t0 = time.perf_counter()
    solo = run_solo()
    dt_solo = time.perf_counter() - t0
    print(f"solo: {R} requests in {dt_solo:.2f}s "
          f"({R / dt_solo:.3f} req/s)")

    # ---- batched -------------------------------------------------------
    def run_batched():
        return m.sample_batch(
            params, prompts, rng=jax.random.PRNGKey(100), **kw
        )

    run_batched()  # compile
    t0 = time.perf_counter()
    batched = run_batched()
    dt_b = time.perf_counter() - t0
    print(f"batched: {R} requests in {dt_b:.2f}s "
          f"({R / dt_b:.3f} req/s)")
    print(f"speedup: {dt_solo / dt_b:.2f}x")

    n_mod_solo = sum(
        sum(1 for it in o if isinstance(it, tuple)) for o in solo
    )
    n_mod_b = sum(
        sum(1 for it in o if isinstance(it, tuple)) for o in batched
    )
    print(f"modality segments: solo {n_mod_solo}, batched {n_mod_b}")


if __name__ == "__main__":
    main()

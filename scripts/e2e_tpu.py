"""End-to-end drive on the real TPU (verify-skill surface): build a model,
train a few steps (loss must drop), checkpoint round-trip, then sample with
the cached path and the batched sampler. Prints PASS lines.

Run: python scripts/e2e_tpu.py   (axon backend; ~minutes cold)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import optax

    from transfusion_tpu.models.transfusion import Transfusion
    from transfusion_tpu.training.trainer import Trainer

    print("devices:", jax.devices())
    m = Transfusion(
        num_text_tokens=64,
        transformer=dict(dim=128, depth=2, dim_head=32, heads=4,
                         attn_impl="flash"),
        modality_default_shape=(4, 4),
        dim_latent=8,
        pad_multiple=32,
        dtype=jnp.bfloat16,
    )
    tr = Trainer(m, optimizer=optax.adam(3e-4))
    state = tr.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)

    def batch(seed):
        r = np.random.default_rng(seed)
        return [
            [
                r.integers(0, 64, 12).astype(np.int32),
                (0, r.standard_normal((4, 4, 8)).astype(np.float32)),
            ]
            for _ in range(4)
        ]

    # fixed eval point: same batch + same rng before/after (per-step losses
    # are NOT comparable — the times draw amplifies the x-pred -> flow
    # conversion near t=1, so raw step losses vary by 100x between rng seeds)
    def eval_loss(params):
        return float(m.loss(params, batch(0), jax.random.PRNGKey(0)))

    l_before = eval_loss(state.params)
    t0 = time.perf_counter()
    for i in range(8):
        state, metrics = tr.train_step(state, batch(i % 4), jax.random.PRNGKey(i))
    l_after = eval_loss(state.params)
    print(f"train 8 steps in {time.perf_counter() - t0:.1f}s, "
          f"fixed-point loss {l_before:.3f} -> {l_after:.3f}")
    assert l_after < l_before, "loss did not drop"
    print("PASS train")

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        tr.checkpoint_dir = d
        tr.save(state)
        fresh = tr.init_state(jax.random.PRNGKey(9))
        restored = tr.restore(fresh)
        for a, b in zip(jax.tree.leaves(restored.params),
                        jax.tree.leaves(state.params)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32))
    print("PASS checkpoint round-trip")

    prompt = [rng.integers(0, 64, 6).astype(np.int32)]
    t0 = time.perf_counter()
    out = m.sample(
        state.params, prompt, rng=jax.random.PRNGKey(1), cache_kv=True,
        max_length=24, modality_steps=4, text_temperature=0.0,
        return_unprocessed_modalities=True,
    )
    print(f"PASS sample(cache_kv) in {time.perf_counter() - t0:.1f}s "
          f"({len(out)} items)")

    prompts = [prompt,
               [np.asarray([3, 1, m.som_ids[0]], np.int32)],
               [rng.integers(0, 64, 9).astype(np.int32)]]
    t0 = time.perf_counter()
    outs = m.sample_batch(
        state.params, prompts, rng=jax.random.PRNGKey(1),
        max_length=24, modality_steps=4, text_temperature=0.0,
        return_unprocessed_modalities=True,
    )
    print(f"PASS sample_batch R=3 in {time.perf_counter() - t0:.1f}s "
          f"({[len(o) for o in outs]} items)")

    # multimodal continuous batching: 3 requests over a 2-slot pool
    from transfusion_tpu.models.engine_mm import MultimodalServingEngine

    eng = MultimodalServingEngine.for_workload(
        m, state.params, prompts, 24, max_requests=2, modality_steps=4,
        text_temperature=0.0, return_unprocessed_modalities=True,
        rng=jax.random.PRNGKey(1),
    )
    t0 = time.perf_counter()
    fin = eng.run(prompts, max_length=24)
    assert len(fin) == len(prompts), (len(fin), eng.stats)
    print(f"PASS mm-engine 3 req / 2 slots in "
          f"{time.perf_counter() - t0:.1f}s ({eng.stats})")

    print("E2E PASS")


if __name__ == "__main__":
    main()

"""A/B: fuse_projections on/off, full train step at the bench config.

The compiled HLO shows XLA's TPU pipeline does NOT merge the separate
to_qk/to_v/to_gates dots, and the h-wide gate projection wastes a full MXU
pass (8 of 128 output lanes useful). This times the end-to-end effect.

Run (real TPU, idle host): python scripts/probe_fused_proj.py
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
    from transfusion_tpu.training.trainer import Trainer

    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    batch = [
        [
            rng.integers(0, 256, 32).astype(np.int32),
            (0, rng.standard_normal((14, 14, 32)).astype(np.float32)),
            rng.integers(0, 256, 8).astype(np.int32),
        ]
        for _ in range(32)
    ]

    results = {}
    for fused in (False, True):
        model = Transfusion(
            num_text_tokens=256,
            dim_latent=32,
            modality_default_shape=(14, 14),
            transformer=dict(
                dim=384, depth=8, dim_head=64, heads=8, attn_impl="flash",
                fuse_projections=fused,
            ),
            pad_multiple=64,
            dtype=jnp.bfloat16,
        )
        trainer = Trainer(model, learning_rate=3e-4)
        state = trainer.init_state(jax.random.PRNGKey(0))
        packed = jax.tree.map(
            jnp.asarray, model.pack(batch, shift_friendly=True)
        )
        tokens = int(packed.total_tokens)
        key = jax.random.PRNGKey(1)
        state, m = trainer.train_steps(state, packed, key, 20)  # compile
        float(m["loss"])
        best = float("inf")
        for _ in range(5):
            key, k = jax.random.split(key)
            t0 = time.perf_counter()
            state, m = trainer.train_steps(state, packed, k, 20)
            float(m["loss"])
            best = min(best, time.perf_counter() - t0)
        ms = best / 20 * 1e3
        results[fused] = ms
        print(
            f"fuse_projections={fused}: {ms:.2f} ms/step "
            f"({tokens * 20 / best:.0f} tok/s) loss={float(m['loss']):.4f}"
        )
    print(f"fused speedup: {results[False] / results[True]:.3f}x")


if __name__ == "__main__":
    main()

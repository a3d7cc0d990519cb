"""Re-measure the 573M-param production-scale config (docs_evidence.md row)
after the megacore kernel semantics.

Config: dim 1024 / depth 12 / heads 16x64, vocab 50k, ~1k-token packed
samples, batch 8, bf16, flash attention + per-block remat, chunked CE.
Prior: 28.5k tok/s (276 ms/step), ~50% MFU by 6NT accounting.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import sys as _s

    remat_policy = _s.argv[1] if len(_s.argv) > 1 else "full"
    bs = int(_s.argv[2]) if len(_s.argv) > 2 else 8
    accum = int(_s.argv[3]) if len(_s.argv) > 3 else 0  # 0 = off
    from transfusion_tpu.models.transfusion import Transfusion
    from transfusion_tpu.training.trainer import Trainer

    model = Transfusion(
        num_text_tokens=50_000,
        dim_latent=32,
        modality_default_shape=(14, 14),
        transformer=dict(
            dim=1024, depth=12, dim_head=64, heads=16,
            attn_impl="flash", remat=remat_policy != "none",
            remat_policy=remat_policy if remat_policy != "none" else "full",
        ),
        pad_multiple=64,
        ce_chunk_size=256,
        dtype=jnp.bfloat16,
    )
    trainer = Trainer(
        model, learning_rate=3e-4,
        grad_accumulation=accum if accum >= 2 else None,
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    n_params = sum(
        p.size for p in jax.tree.leaves(state.params)
    )
    print(f"params: {n_params/1e6:.1f}M", flush=True)

    rng = np.random.default_rng(0)
    batch = [
        [
            rng.integers(0, 50_000, 480).astype(np.int32),
            (0, rng.standard_normal((14, 14, 32)).astype(np.float32)),
            rng.integers(0, 50_000, 300).astype(np.int32),
        ]
        for _ in range(bs)
    ]
    packed = jax.tree.map(jnp.asarray, model.pack(batch, shift_friendly=True))
    tokens = int(packed.total_tokens)
    print(f"tokens/step: {tokens}", flush=True)

    if accum >= 2:
        # pre-pack the M microbatches once (device-resident), as a steady
        # -state training loop would; total_tokens = content lengths, so
        # the per-step token count is identical to the full pack's
        splits = np.array_split(np.arange(bs), accum)
        packed = [
            jax.tree.map(
                jnp.asarray,
                model.pack([batch[i] for i in idx], shift_friendly=True),
            )
            for idx in splits
        ]

    key = jax.random.PRNGKey(1)
    for _ in range(3):
        key, k = jax.random.split(key)
        state, metrics = trainer.train_step(state, packed, k)
    float(metrics["loss"])

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            key, k = jax.random.split(key)
            state, metrics = trainer.train_step(state, packed, k)
        float(metrics["loss"])
        best = min(best, (time.perf_counter() - t0) / 5)

    tps = tokens / best
    flops_6nt = 6 * n_params * tps  # useful train FLOP/s by 6NT accounting
    print(
        f"573M config (remat={remat_policy}, batch={bs}, accum={accum}): "
        f"{best*1e3:.1f} ms/step, {tps/1e3:.1f}k tok/s, "
        f"6NT {flops_6nt/1e12:.1f} TFLOP/s = {flops_6nt/197e12*100:.1f}% "
        f"of v5e bf16 peak",
        flush=True,
    )


if __name__ == "__main__":
    main()

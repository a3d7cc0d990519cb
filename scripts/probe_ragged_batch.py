"""Serving value of ragged batching: N requests with mixed history lengths
decoded in ONE batched call (per-row cache offsets) vs sequentially.

dim 384/depth 8 bf16 flash — the serving config of probe_int8_kv.py.
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

    model = Transfusion(
        num_text_tokens=256,
        dim_latent=32,
        modality_default_shape=(14, 14),
        transformer=dict(
            dim=384, depth=8, dim_head=64, heads=8, attn_impl="flash"
        ),
        pad_multiple=64,
        dtype=jnp.bfloat16,
    )
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    lens = [2048, 1536, 1024, 768, 512, 384, 256, 128]
    prompts = [rng.integers(0, 256, l).astype(np.int32) for l in lens]
    steps = 64

    def run_batched():
        out = model.generate_text_batch(
            params, prompts, max_new_tokens=steps,
            rng=jax.random.PRNGKey(1),
        )
        _ = int(np.asarray(out)[0, -1])
        return out

    def run_sequential():
        outs = []
        for p in prompts:
            o = model.generate_text_only(
                params, jnp.asarray(p)[None], seq_len=len(p) + steps,
                rng=jax.random.PRNGKey(1),
            )
            outs.append(np.asarray(o))
        _ = int(outs[-1][0, -1])
        return outs

    for name, fn in (("batched(ragged)", run_batched),
                     ("sequential", run_sequential)):
        fn()  # warm/compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        total = len(lens) * steps
        print(
            f"{name}: {best:.2f} s for {len(lens)} requests x {steps} tok "
            f"({total / best:.0f} tok/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()

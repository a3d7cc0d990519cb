"""Serving decode probe: int8 vs model-dtype KV cache at long histories.

Long-history decode is bound by streaming the KV cache from HBM each step;
the int8 cache (make_kv_cache(quantize='int8')) halves that traffic vs bf16.
Measures generate_text_only wall-clock (prefill + N decode steps) for
history lengths H, batch b, on the flagship dim-384/depth-8 config.
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

    attn_impl = sys.argv[1] if len(sys.argv) > 1 else "flash"
    model = Transfusion(
        num_text_tokens=256,
        dim_latent=32,
        modality_default_shape=(14, 14),
        transformer=dict(
            dim=384, depth=8, dim_head=64, heads=8, attn_impl=attn_impl
        ),
        pad_multiple=64,
        dtype=jnp.bfloat16,
    )
    print(f"attn_impl={attn_impl}", flush=True)
    params = model.init_params(jax.random.PRNGKey(0))

    steps = 64
    for b in (1, 8):
        for hist in (2048, 8192):
            prompt = jnp.asarray(
                np.random.default_rng(0).integers(0, 256, (b, hist)),
                jnp.int32,
            )
            for quant in (False, True):
                # warm (compile + first run)
                toks = model.generate_text_only(
                    params, prompt, seq_len=hist + steps,
                    rng=jax.random.PRNGKey(1), kv_quantize=quant,
                )
                _ = int(np.asarray(toks)[0, -1])  # force completion
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    toks = model.generate_text_only(
                        params, prompt, seq_len=hist + steps,
                        rng=jax.random.PRNGKey(1), kv_quantize=quant,
                    )
                    _ = int(np.asarray(toks)[0, -1])
                    best = min(best, time.perf_counter() - t0)
                name = "int8" if quant else "bf16"
                print(
                    f"b={b} hist={hist} cache={name}: {best*1e3:.1f} ms "
                    f"for {steps} tokens ({best/steps*1e3:.2f} ms/tok, "
                    f"{b*steps/best:.0f} tok/s)",
                    flush=True,
                )


if __name__ == "__main__":
    main()

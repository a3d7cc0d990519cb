"""sample() warm wall-clock by text-history length — cached vs uncached,
now with the flash serving path (flash-kernel prefill + Pallas decode
kernel; optionally int8 KV).

Replicates the r2 evidence row (64-step CFG ODE, dim 384/depth 8, bf16)
that previously ran on the dense path.
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
    params = model.init_params(jax.random.PRNGKey(0))
    print(f"attn_impl={attn_impl}", flush=True)

    rng = np.random.default_rng(0)
    for hist in (32, 512, 2048):
        prompt = [
            rng.integers(0, 256, hist).astype(np.int32),
            np.asarray([model.som_ids[0]], np.int32),
        ]
        variants = [
            ("uncached", dict(cache_kv=False)),
            ("cached", dict(cache_kv=True)),
            ("cached+int8", dict(cache_kv=True, kv_quantize=True)),
        ]
        for name, kw in variants:
            def run():
                return model.sample(
                    params, prompt=list(prompt), rng=jax.random.PRNGKey(1),
                    max_length=2, modality_steps=64, cfg_scale=3.0,
                    return_unprocessed_modalities=True, **kw,
                )

            out = run()  # warm/compile
            lat = next(o[1] for o in out if isinstance(o, tuple))
            assert np.isfinite(np.asarray(lat, np.float32)).all()
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
            print(f"hist={hist} {name}: {best:.2f} s", flush=True)


if __name__ == "__main__":
    main()

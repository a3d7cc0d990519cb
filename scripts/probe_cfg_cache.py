"""Incremental CFG cache vs rebuild-per-segment (models/transfusion.py
_sample_cached): wall-clock on the real chip.

The rebuild mode pays one full O(history) uncond prefill per modality
segment (the reference's cost profile, ref transfusion.py:1847-1854); the
incremental batch-2 cache pays none. Measured on a long text history primed
to emit a modality segment immediately — the per-segment saving multiplies
by the number of modality segments a generation emits.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from transfusion_tpu.models.transfusion import Transfusion

    model = Transfusion(
        num_text_tokens=256,
        dim_latent=32,
        modality_default_shape=(14, 14),
        transformer=dict(dim=384, depth=8, dim_head=64, heads=8, attn_impl="flash"),
        pad_multiple=64,
        dtype=jnp.bfloat16,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    import jax.numpy as jnp

    def force_segments(k_segments):
        """Wrap the jitted text-decode step so the sampled token follows a
        fixed script: a som every 3rd streamed token (forcing k modality
        segments), plain text otherwise — identical in both CFG modes, so
        the A/B compares the same generation shape."""
        state = {"i": 0, "mods": 0}
        orig_get_jit = model._get_jit

        def patched(name, fn, **kw):
            f = orig_get_jit(name, fn, **kw)
            if name != "sample_decode_text":
                return f

            def wrapper(*a, **k):
                tok, logits, cache = f(*a, **k)
                state["i"] += 1
                if state["i"] % 3 == 0 and state["mods"] < k_segments:
                    state["mods"] += 1
                    forced = model.som_ids[0]
                else:
                    forced = 7  # arbitrary plain text id
                return jnp.asarray(forced, tok.dtype), logits, cache

            return wrapper

        model._get_jit = patched
        return lambda: setattr(model, "_get_jit", orig_get_jit)

    for hist, k_seg in ((2048, 3), (8192, 3)):
        prompt = [rng.integers(0, 256, hist).astype(np.int32)]
        kw = dict(
            prompt=prompt,
            max_length=620,  # room for 3 modality segments (196 rows each)
            modality_steps=16,
            cfg_scale=3.0,
            cache_kv=True,
            fixed_modality_shape=(14, 14),
            return_unprocessed_modalities=True,
        )
        for label, inc in (("rebuild", False), ("incremental", True)):
            restore = force_segments(k_seg)
            try:
                model.sample(
                    params, rng=jax.random.PRNGKey(1),
                    incremental_cfg_cache=inc, **kw,
                )
                times = []
                for _ in range(3):
                    restore()
                    restore = force_segments(k_seg)
                    t0 = time.perf_counter()
                    out = model.sample(
                        params, rng=jax.random.PRNGKey(1),
                        incremental_cfg_cache=inc, **kw,
                    )
                    times.append(time.perf_counter() - t0)
                n_mod = sum(isinstance(o, tuple) for o in out)
                print(
                    f"hist={hist:5d} {label:11s}: {min(times)*1e3:7.1f} ms "
                    f"({n_mod} modality segments)", flush=True,
                )
            finally:
                restore()


if __name__ == "__main__":
    main()

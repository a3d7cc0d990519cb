"""r3: batch-size sweep with device-resident packed batches + scanned steps.

Finds the throughput-optimal flagship batch now that the megacore kernels
and bf16 stream are in (the r2 sweep predates both and fed host batches).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from transfusion_tpu.models.transfusion import Transfusion
    from transfusion_tpu.training.trainer import Trainer

    model = Transfusion(
        num_text_tokens=256,
        dim_latent=32,
        modality_default_shape=(14, 14),
        transformer=dict(dim=384, depth=8, dim_head=64, heads=8, attn_impl="flash"),
        pad_multiple=64,
        dtype=jnp.bfloat16,
    )

    rng = np.random.default_rng(0)

    def make_packed(bs):
        batch = [
            [
                rng.integers(0, 256, 32).astype(np.int32),
                (0, rng.standard_normal((14, 14, 32)).astype(np.float32)),
                rng.integers(0, 256, 8).astype(np.int32),
            ]
            for _ in range(bs)
        ]
        return model.pack(batch, shift_friendly=True)

    for bs in (32, 64, 128):
        trainer = Trainer(model, learning_rate=3e-4)
        state = trainer.init_state(jax.random.PRNGKey(0))
        packed = make_packed(bs)
        toks = int(packed.total_tokens)
        packed_dev = jax.tree.map(jnp.asarray, packed)
        key = jax.random.PRNGKey(1)
        for _ in range(4):
            key, k = jax.random.split(key)
            state, metrics = trainer.train_step(state, packed_dev, k)
        float(metrics["loss"])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                key, k = jax.random.split(key)
                state, metrics = trainer.train_step(state, packed_dev, k)
            float(metrics["loss"])
            best = min(best, time.perf_counter() - t0)
        print(
            f"b={bs:4d}: {toks*10/best:,.0f} tok/s ({best/10*1e3:.1f} ms/step, "
            f"{toks} tok/step)", flush=True,
        )

        # scanned variant
        if trainer._step_fn is None:
            trainer._step_fn = trainer._build_step()
        step_fn = trainer._step_fn

        @functools.partial(jax.jit, donate_argnums=(0,))
        def scan10(state, packed, key):
            def body(carry, _):
                st, ky = carry
                ky, k = jax.random.split(ky)
                st, mm = step_fn(st, packed, k)
                return (st, ky), mm["loss"]

            (state, _), losses = jax.lax.scan(
                body, (state, key), None, length=10
            )
            return state, losses[-1]

        state, last = scan10(state, packed_dev, key)
        float(last)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            state, last = scan10(state, packed_dev, key)
            float(last)
            best = min(best, time.perf_counter() - t0)
        print(
            f"b={bs:4d} scan: {toks*10/best:,.0f} tok/s "
            f"({best/10*1e3:.1f} ms/step)", flush=True,
        )


if __name__ == "__main__":
    main()

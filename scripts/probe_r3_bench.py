"""r3 perf probe: where does the flagship bench step's time go?

Variants measured on the real chip:
  A. bench as-is (host packed re-converted per step)
  B. packed pre-device-put once (no per-step host->device upload)
  C. B + 20 steps fused into one jitted lax.scan dispatch (device-side
     training loop — amortizes the remote tunnel's per-dispatch cost)

Also prints XLA cost-analysis flops/bytes for the single step.
Run with run_in_background; never kill mid-compile.
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
    from transfusion_tpu.training.trainer import Trainer

    model = Transfusion(
        num_text_tokens=256,
        dim_latent=32,
        modality_default_shape=(14, 14),
        transformer=dict(dim=384, depth=8, dim_head=64, heads=8, attn_impl="flash"),
        pad_multiple=64,
        dtype=jnp.bfloat16,
    )
    trainer = Trainer(model, learning_rate=3e-4)
    state = trainer.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    batch = [
        [
            rng.integers(0, 256, 32).astype(np.int32),
            (0, rng.standard_normal((14, 14, 32)).astype(np.float32)),
            rng.integers(0, 256, 8).astype(np.int32),
        ]
        for _ in range(32)
    ]
    packed = model.pack(batch, shift_friendly=True)
    toks = int(packed.total_tokens)
    print(f"tokens/step: {toks}", flush=True)

    key = jax.random.PRNGKey(1)

    # ---- A: as-is ----
    for _ in range(6):
        key, k = jax.random.split(key)
        state, metrics = trainer.train_step(state, packed, k)
    float(metrics["loss"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(20):
            key, k = jax.random.split(key)
            state, metrics = trainer.train_step(state, packed, k)
        float(metrics["loss"])
        best = min(best, time.perf_counter() - t0)
    print(f"A host-packed      : {toks*20/best:,.0f} tok/s ({best/20*1e3:.1f} ms/step)", flush=True)

    # ---- B: pre-device-put packed ----
    packed_dev = jax.tree.map(jnp.asarray, packed)
    for _ in range(3):
        key, k = jax.random.split(key)
        state, metrics = trainer.train_step(state, packed_dev, k)
    float(metrics["loss"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(20):
            key, k = jax.random.split(key)
            state, metrics = trainer.train_step(state, packed_dev, k)
        float(metrics["loss"])
        best = min(best, time.perf_counter() - t0)
    print(f"B device packed    : {toks*20/best:,.0f} tok/s ({best/20*1e3:.1f} ms/step)", flush=True)

    # ---- C: 20-step scan (device-side loop, one dispatch) ----
    if trainer._step_fn is None:
        trainer._step_fn = trainer._build_step()
    step_fn = trainer._step_fn

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def scan20(state, packed, key):
        def body(carry, _):
            st, ky = carry
            ky, k = jax.random.split(ky)
            st, m = step_fn(st, packed, k)
            return (st, ky), m["loss"]

        (state, _), losses = jax.lax.scan(body, (state, key), None, length=20)
        return state, losses[-1]

    state2, last = scan20(state, packed_dev, key)
    float(last)  # compile + run
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state2, last = scan20(state2, packed_dev, key)
        float(last)
        best = min(best, time.perf_counter() - t0)
    print(f"C 20-step scan     : {toks*20/best:,.0f} tok/s ({best/20*1e3:.1f} ms/step)", flush=True)

    # ---- cost analysis ----
    lowered = jax.jit(step_fn, donate_argnums=(0,)).lower(state, packed_dev, key)
    cost = lowered.compile().cost_analysis()
    if cost:
        c = cost[0] if isinstance(cost, (list, tuple)) else cost
        fl = c.get("flops", float("nan"))
        by = c.get("bytes accessed", float("nan"))
        print(f"cost: {fl/1e9:.1f} GFLOP/step, {by/1e9:.2f} GB accessed", flush=True)


if __name__ == "__main__":
    main()

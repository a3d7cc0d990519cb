"""End-to-end lever test for the flagship step (floorless, scan-fused).

probe_occupancy/probe_floorless found: matmuls alone hit 80-110 TFLOP/s at
bench shapes, the flash kernel loses ~2 ms fwd to dense at n=246 (grid-step
overhead), and opt+EMA costs ~3.3 ms (suspect: per-leaf kernel overhead
across ~200 param leaves). This probe times the candidate fixes end-to-end:
  (a) full step, dense attention
  (b) full step, flash + optax.flatten'd optimizer chain
  (c) full step, dense + flatten
  (d) spans_to_attn_mask alone (is the dense path's mask build material?)
  (e) joint_embed_in scatter alone

Run (real TPU): python scripts/probe_levers.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

N_IT = 10


def timeit_scan(make_body, init_carry, reps=3):
    @jax.jit
    def run(carry):
        def body(c, i):
            return make_body(c, i), None

        c, _ = jax.lax.scan(body, carry, jnp.arange(N_IT))
        return c

    c = run(init_carry)
    float(jnp.sum(jax.tree.leaves(c)[0].astype(jnp.float32)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        c = run(init_carry)
        float(jnp.sum(jax.tree.leaves(c)[0].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / N_IT)
    return best * 1e3


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
    key = jax.random.PRNGKey(2)

    def make_model(impl):
        return Transfusion(
            num_text_tokens=256,
            dim_latent=32,
            modality_default_shape=(14, 14),
            transformer=dict(
                dim=384, depth=8, dim_head=64, heads=8, attn_impl=impl
            ),
            pad_multiple=64,
            dtype=jnp.bfloat16,
        )

    def step_ms(impl, flat):
        model = make_model(impl)
        packed = jax.tree.map(
            jnp.asarray, model.pack(batch, shift_friendly=True)
        )
        opt = (
            optax.flatten(
                optax.chain(
                    optax.clip_by_global_norm(0.5), optax.adam(3e-4)
                )
            )
            if flat
            else None
        )
        trainer = Trainer(
            model, optimizer=opt, grad_clip_norm=None if flat else 0.5
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        step_fn = trainer._build_step()

        def body(st, i):
            st, _ = step_fn(st, packed, jax.random.fold_in(key, i))
            return st

        return timeit_scan(body, state)

    print(f"(0) flash step (baseline): {step_ms('flash', False):.2f} ms")
    print(f"(a) dense step: {step_ms('dense', False):.2f} ms")
    print(f"(b) flash + flat opt: {step_ms('flash', True):.2f} ms")
    print(f"(c) dense + flat opt: {step_ms('dense', True):.2f} ms")

    # (d) mask build alone
    from transfusion_tpu.ops.spans import spans_to_attn_mask

    model = make_model("dense")
    packed = jax.tree.map(jnp.asarray, model.pack(batch, shift_friendly=True))
    n = packed.text.shape[1] - 1

    def maskonly(carry, i):
        m = spans_to_attn_mask(n, packed.spans + (i * 0))
        return carry + m.sum(dtype=jnp.int32)

    print(f"(d) spans_to_attn_mask: {timeit_scan(maskonly, jnp.zeros((), jnp.int32)):.2f} ms")

    # (e) embed_in alone
    params = model.init_params(jax.random.PRNGKey(0))

    def embedin(carry, i):
        x, _, _ = model.core.apply(
            params, packed.replace(text=packed.text + (i * 0)),
            method="joint_embed_in",
        )
        return carry + jnp.sum(x.astype(jnp.float32))

    print(f"(e) joint_embed_in: {timeit_scan(embedin, jnp.zeros(())):.2f} ms")


if __name__ == "__main__":
    main()

"""Floorless decomposition of the flagship train step.

Every variant runs 10 iterations inside ONE lax.scan dispatch (the tunnel's
per-dispatch floor, ~1.5-2.5 ms, otherwise pollutes sub-10ms readings;
probe_gap.py's PRNG row measured the floor itself). Variants: full step
(grad+adam+ema), grad only, loss fwd only, trunk fwd only, embed_in only —
each under flash and dense attention at bench shapes (dim 384/depth 8/
b 32/n 246).

Run (real TPU): python scripts/probe_floorless.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_IT = 10


def timeit_scan(make_body, init_carry, reps=3):
    """Time one jitted lax.scan of N_IT iterations; returns ms/iteration."""

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

    for impl in ("flash", "dense"):
        model = Transfusion(
            num_text_tokens=256,
            dim_latent=32,
            modality_default_shape=(14, 14),
            transformer=dict(
                dim=384, depth=8, dim_head=64, heads=8, attn_impl=impl
            ),
            pad_multiple=64,
            dtype=jnp.bfloat16,
        )
        packed = jax.tree.map(jnp.asarray, model.pack(batch, shift_friendly=True))
        params = model.init_params(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(2)

        # (1) full step via the Trainer's own step_fn
        trainer = Trainer(model)
        state = trainer.init_state(jax.random.PRNGKey(0))
        step_fn = trainer._build_step()

        def full(carry, i):
            st = carry
            st, _ = step_fn(st, packed, jax.random.fold_in(key, i))
            return st

        ms = timeit_scan(full, state)
        print(f"[{impl}] (1) full step: {ms:.2f} ms")

        # (2) grad only
        def gradonly(carry, i):
            g = jax.grad(
                lambda p: model._loss_impl(
                    p, packed, jax.random.fold_in(key, i), None, None,
                    prob_uncond=0.1, velocity_delta=0.0, train=True,
                )[0]
            )(carry)
            return jax.tree.map(lambda a, b: a + 1e-9 * b, carry, g)

        ms = timeit_scan(gradonly, params)
        print(f"[{impl}] (2) loss grad (no opt/ema): {ms:.2f} ms")

        # (3) loss fwd only
        def lossfwd(carry, i):
            p, acc = carry
            total, _ = model._loss_impl(
                p, packed, jax.random.fold_in(key, i), None, None,
                prob_uncond=0.1, velocity_delta=0.0, train=True,
            )
            return (p, acc + total)

        ms = timeit_scan(lossfwd, (params, jnp.zeros(())))
        print(f"[{impl}] (3) loss fwd: {ms:.2f} ms")

        # (4) trunk fwd only (joint_embed_in output fed through transformer)
        x0, rotary_pos, _ = model.core.apply(
            params, packed, method="joint_embed_in"
        )
        times0 = jnp.full((32, packed.spans.shape[1]), 0.5)

        from transfusion_tpu.models.transformer import Transformer

        t_module = Transformer(
            dim=model.dim, dtype=model.dtype, **model.transformer_cfg
        )

        def trunkfwd(carry, i):
            out, _ = t_module.apply(
                {"params": params["params"]["transformer"]},
                carry,
                times_inst=times0,
                spans=packed.spans,
                rotary_pos=rotary_pos,
            )
            return out.astype(carry.dtype)

        ms = timeit_scan(trunkfwd, x0)
        print(f"[{impl}] (4) trunk fwd: {ms:.2f} ms")

        # (5) embed_in only
        def embedin(carry, i):
            x, _, _ = model.core.apply(params, packed, method="joint_embed_in")
            return carry + jnp.sum(x.astype(jnp.float32))

        ms = timeit_scan(embedin, jnp.zeros(()))
        print(f"[{impl}] (5) joint_embed_in: {ms:.2f} ms  "
              "(loop-dependence weak: upper bound only if XLA kept it live)")


if __name__ == "__main__":
    main()

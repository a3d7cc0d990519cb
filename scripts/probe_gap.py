"""Follow-up to probe_occupancy: localize the remaining flagship-step time.

Measures, on the real TPU, at bench shapes (dim 384 / depth 8 / b=32 /
n=246): (1) block stack fwd+bwd under dense vs flash attention, (2) the
PRNG cost of the per-step noise/dropout draws under threefry vs rbg,
(3) the full loss fwd with pieces disabled (no velocity EMA, prob_uncond=0).

Run (real TPU): python scripts/probe_gap.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

M, DIM, HEADS, DH = 7872, 384, 8, 64


def timeit(fn, *args, reps=20):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = fn(*args)
        for _ in range(reps - 1):
            o = fn(*args)
        float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3  # ms


def block_stack(attn_impl, flash_causal):
    from transfusion_tpu.models.transformer import TransformerBlock

    return TransformerBlock(
        dim=DIM, dim_head=DH, heads=HEADS, dropout=0.0,
        ff_expansion_factor=4, attn_softcap=50.0, attn_gate_values=True,
        attn_laser=False, attn_impl=attn_impl, streams=1, fracs=4,
        layer_index=0, is_first=True, has_skip=False, modality_only=False,
        flash_causal=flash_causal, deterministic=True, dtype=jnp.bfloat16,
    )


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    b, n = 32, M // 32
    xb = jax.random.normal(key, (1, b, n, DIM), jnp.bfloat16)
    cond = jax.random.normal(key, (b, 1, 4 * DIM), jnp.bfloat16)
    iam = jnp.zeros((b, n), bool)

    # --- (1) block stack fwd+bwd: dense vs flash ---
    seq = jnp.arange(n)
    causal = jnp.broadcast_to(
        (seq[:, None] >= seq[None, :])[None, None], (b, 1, n, n)
    )
    for impl, fc, mask in (("flash", True, None), ("dense", False, causal)):
        blk = block_stack(impl, fc)
        args = (xb, None, cond, None, mask, None, iam, None, None, None, None)
        params = blk.init(jax.random.PRNGKey(1), *args)

        def run8(xb, params=params, blk=blk, args=args):
            def body(c, _):
                out = blk.apply(params, c, *args[1:])
                return out[0], None

            c, _ = jax.lax.scan(body, xb, None, length=8)
            return c

        f = jax.jit(run8)
        g = jax.jit(lambda v, f=f: jax.grad(
            lambda u: jnp.sum(f(u).astype(jnp.float32)))(v))
        print(f"(1) block x8 {impl}: fwd {timeit(f, xb):.2f} ms, "
              f"fwd+bwd {timeit(g, xb):.2f} ms")

    # --- (2) PRNG cost of the step's random draws ---
    def draws(key):
        ks = jax.random.split(key, 6)
        noise = jax.random.normal(ks[0], (32, 14, 14, 32))
        times = jax.random.uniform(ks[1], (b, 4))
        drop = jax.random.uniform(ks[2], (b,))
        return (jnp.sum(noise) + jnp.sum(times) + jnp.sum(drop)).astype(
            jnp.float32
        )

    for impl in ("threefry2x32", "rbg"):
        with jax.default_prng_impl(impl):
            k = jax.random.PRNGKey(0)
            f = jax.jit(draws)
            print(f"(2) per-step PRNG draws [{impl}]: {timeit(f, k):.3f} ms")

    # --- (3) loss fwd with pieces toggled ---
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
    packed = jax.tree.map(jnp.asarray, packed)
    params = model.init_params(jax.random.PRNGKey(0))

    def loss_fn(pu):
        def f(params, packed, key):
            total, _ = model._loss_impl(
                params, packed, key, None, None,
                prob_uncond=pu, velocity_delta=0.0, train=True,
            )
            return total

        return jax.jit(f)

    k = jax.random.PRNGKey(2)
    print(f"(3) loss fwd (prob_uncond=0.1): "
          f"{timeit(loss_fn(0.1), params, packed, k):.2f} ms")
    print(f"(3) loss fwd (prob_uncond=0.0): "
          f"{timeit(loss_fn(0.0), params, packed, k):.2f} ms")

    gradf = jax.jit(
        lambda p, b_, k_: jax.grad(
            lambda p: model._loss_impl(
                p, b_, k_, None, None, prob_uncond=0.1,
                velocity_delta=0.0, train=True,
            )[0]
        )(p)
    )
    print(f"(3) loss fwd+bwd: {timeit(gradf, params, packed, k):.2f} ms")

    with jax.default_prng_impl("rbg"):
        k2 = jax.random.PRNGKey(2)
        f2 = loss_fn(0.1)
        print(f"(3) loss fwd [rbg prng]: {timeit(f2, params, packed, k2):.2f} ms")
        g2 = jax.jit(
            lambda p, b_, k_: jax.grad(
                lambda p: model._loss_impl(
                    p, b_, k_, None, None, prob_uncond=0.1,
                    velocity_delta=0.0, train=True,
                )[0]
            )(p)
        )
        print(f"(3) loss fwd+bwd [rbg prng]: {timeit(g2, params, packed, k2):.2f} ms")


if __name__ == "__main__":
    main()

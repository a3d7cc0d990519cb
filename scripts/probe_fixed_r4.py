"""Decompose the post-NHD flagship step's FIXED (non-layer) cost.

r4 ablation (probe_step_ablation, per-dispatch windows) fit the bench step
as ~1.79 ms/layer + ~8 ms fixed — the fixed part is now ~35% of the 22 ms
step. This probe isolates where it lives, with every variant scan-fused
(20 iterations in ONE dispatch, one scalar fetch) so tunnel dispatch
overhead cannot contaminate the numbers:

  A. full train step at depth 2/8 (adam+clip+EMA)   -> F_full + d*p_full
  B. depth 8, SGD, no clip                          -> optimizer chain cost
  C. depth 8, adam, no clip                         -> clip cost
  D. fwd-only scan at depth 2/8                     -> F_fwd + d*p_fwd
  E. grad scan (no opt) at depth 2/8                -> F_grad + d*p_grad

Prints ms/iteration, best of 3 windows.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

STEPS = 20


def make(depth=8):
    from transfusion_tpu.models.transfusion import Transfusion

    return Transfusion(
        num_text_tokens=256,
        dim_latent=32,
        modality_default_shape=(14, 14),
        transformer=dict(dim=384, depth=depth, dim_head=64, heads=8,
                         attn_impl="flash"),
        pad_multiple=64,
        dtype=jnp.bfloat16,
    )


def batch32():
    rng = np.random.default_rng(0)
    return [
        [
            rng.integers(0, 256, 32).astype(np.int32),
            (0, rng.standard_normal((14, 14, 32)).astype(np.float32)),
            rng.integers(0, 256, 8).astype(np.int32),
        ]
        for _ in range(32)
    ]


def bestof(run, fetch):
    out = run()
    fetch(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = run()
        fetch(o)
        best = min(best, time.perf_counter() - t0)
    return best / STEPS * 1e3


def report(name, ms):
    print(f"{name}: {ms:.2f} ms/iter", flush=True)


def main():
    from transfusion_tpu.training.trainer import Trainer

    batch = batch32()

    # ---- A/B/C: full train step variants via train_steps (scan-fused) ----
    for name, depth, kw in [
        ("A full depth=2", 2, {}),
        ("A full depth=8", 8, {}),
        ("B sgd-noclip depth=8", 8,
         dict(optimizer=optax.sgd(3e-4), grad_clip_norm=None)),
        ("C adam-noclip depth=8", 8, dict(grad_clip_norm=None)),
    ]:
        model = make(depth)
        tr = Trainer(model, learning_rate=3e-4, **kw)
        state = tr.init_state(jax.random.PRNGKey(0))
        packed = jax.tree.map(jnp.asarray, model.pack(batch, shift_friendly=True))
        key = jax.random.PRNGKey(1)
        state, m = tr.train_steps(state, packed, key, STEPS)  # compile
        float(m["loss"])
        holder = {"s": state}

        def run(tr=tr, packed=packed, holder=holder):
            holder["s"], m = tr.train_steps(
                holder["s"], packed, jax.random.PRNGKey(2), STEPS
            )
            return m

        report(name, bestof(run, lambda m: float(m["loss"])))

    # ---- D/E: fwd-only and grad-only scans ----
    for depth in (2, 8):
        model = make(depth)
        tr = Trainer(model, learning_rate=3e-4)
        state = tr.init_state(jax.random.PRNGKey(0))
        packed = jax.tree.map(jnp.asarray, model.pack(batch, shift_friendly=True))
        params = state.params

        def loss_fn(params, rng):
            total, _ = model._loss_impl(
                params, packed, rng, None, None,
                prob_uncond=model.prob_uncond, velocity_delta=1e-3, train=True,
            )
            return total

        @jax.jit
        def fwd_scan(params, key):
            def body(carry, _):
                acc, key = carry
                key, k = jax.random.split(key)
                return (acc + loss_fn(params, k), key), None

            (acc, _), _ = jax.lax.scan(
                body, (jnp.zeros(()), key), None, length=STEPS
            )
            return acc

        @jax.jit
        def grad_scan(params, key):
            def body(carry, _):
                acc, key = carry
                key, k = jax.random.split(key)
                loss, grads = jax.value_and_grad(loss_fn)(params, k)
                return (acc + loss + optax.global_norm(grads), key), None

            (acc, _), _ = jax.lax.scan(
                body, (jnp.zeros(()), key), None, length=STEPS
            )
            return acc

        k = jax.random.PRNGKey(3)
        float(fwd_scan(params, k))
        report(f"D fwd-only depth={depth}",
               bestof(lambda: fwd_scan(params, k), float))
        float(grad_scan(params, k))
        report(f"E grad depth={depth}",
               bestof(lambda: grad_scan(params, k), float))


if __name__ == "__main__":
    main()

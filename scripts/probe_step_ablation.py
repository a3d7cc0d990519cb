"""Ablation profile of the flagship bench step on the real TPU.

Times variants of the train step to attribute the ~34 ms step:
depth sweep (per-layer cost), no-CE, loss-only (no backward), fwd-only,
no-EMA, dense vs flash. Prints ms/step (best of 3 windows of 10).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def make(depth=8, attn="flash"):
    from transfusion_tpu.models.transfusion import Transfusion

    return Transfusion(
        num_text_tokens=256,
        dim_latent=32,
        modality_default_shape=(14, 14),
        transformer=dict(
            dim=384, depth=depth, dim_head=64, heads=8, attn_impl=attn
        ),
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


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.tree.map(
        lambda x: float(jnp.sum(jnp.abs(x).astype(jnp.float32)))
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else None,
        out,
    )
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = None
        for _ in range(reps):
            o = fn(*args)
        jax.tree.map(
            lambda x: float(jnp.sum(jnp.abs(x).astype(jnp.float32)))
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else None,
            o,
        )
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def main():
    from transfusion_tpu.training.trainer import Trainer

    batch = batch32()

    # full train step at each depth
    for depth in (2, 8):
        model = make(depth)
        trainer = Trainer(model, learning_rate=3e-4)
        state = trainer.init_state(jax.random.PRNGKey(0))
        packed = jax.tree.map(jnp.asarray, model.pack(batch, shift_friendly=True))
        step = trainer._build_step()

        # warm (state is donated — keep chaining the returned one)
        s, m = step(state, packed, jax.random.PRNGKey(1))
        float(m["loss"])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                s, m = step(s, packed, jax.random.PRNGKey(1))
            float(m["loss"])
            best = min(best, (time.perf_counter() - t0) / 10)
        print(f"full step depth={depth}: {best*1e3:.2f} ms", flush=True)

    model = make(8)
    trainer = Trainer(model, learning_rate=3e-4)
    state = trainer.init_state(jax.random.PRNGKey(0))
    packed = jax.tree.map(jnp.asarray, model.pack(batch, shift_friendly=True))
    params = state.params

    # loss+grad only (no adam/clip/ema)
    def loss_fn(params, rng):
        total, _ = model._loss_impl(
            params, packed, rng, None, None,
            prob_uncond=0.1, velocity_delta=1e-3, train=True,
        )
        return total

    g = jax.jit(jax.value_and_grad(loss_fn))
    t = timeit(lambda: g(params, jax.random.PRNGKey(1)))
    print(f"loss+grad only: {t:.2f} ms", flush=True)

    # forward only
    f = jax.jit(loss_fn)
    t = timeit(lambda: f(params, jax.random.PRNGKey(1)))
    print(f"forward only: {t:.2f} ms", flush=True)

    # dense attention full step
    model_d = make(8, attn="dense")
    tr_d = Trainer(model_d, learning_rate=3e-4)
    st_d = tr_d.init_state(jax.random.PRNGKey(0))
    pk_d = jax.tree.map(jnp.asarray, model_d.pack(batch, shift_friendly=True))
    step_d = tr_d._build_step()
    s, m = step_d(st_d, pk_d, jax.random.PRNGKey(1))
    float(m["loss"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            s, m = step_d(s, pk_d, jax.random.PRNGKey(1))
        float(m["loss"])
        best = min(best, (time.perf_counter() - t0) / 10)
    print(f"full step dense: {best*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Probe: flash kernel timings after megacore dimension_semantics.

Compares flash vs dense fwd and fwd+bwd at several sequence lengths on the
real TPU. Prior numbers (docs_evidence.md): n=1024 fwd flash 1.68 ms vs
dense 1.65 ms; n=2048 fwd+bwd flash 6.46 ms vs dense 7.30 ms; n=8192
fwd+bwd resident 36.7 ms.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from transfusion_tpu.ops.pallas_attn import _reference_attention
from transfusion_tpu.ops.pallas_attn_kernel import flash_attention


def dense_attention(q, k, v, spans, causal=False):
    return _reference_attention(q, k, v, spans, causal, 50.0)


def bench(fn, *args, reps=10):
    out = fn(*args)
    jax.tree.map(lambda x: float(jnp.sum(jnp.abs(x).astype(jnp.float32))), out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.tree.map(
            lambda x: float(jnp.sum(jnp.abs(x).astype(jnp.float32))), out
        )
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    d, h = 64, 8
    for b, n in [(32, 256), (8, 1024), (2, 2048), (1, 8192)]:
        q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
        spans = jnp.asarray(
            np.stack(
                [[[0, n // 4, n // 8], [0, n // 2, n // 8]]] * b
            ),
            jnp.int32,
        )

        f_fwd = jax.jit(lambda q, k, v, s: flash_attention(q, k, v, s, causal=True))
        d_fwd = jax.jit(lambda q, k, v, s: dense_attention(q, k, v, s, causal=True))

        def loss_flash(q, k, v, s):
            return jnp.sum(
                flash_attention(q, k, v, s, causal=True).astype(jnp.float32) ** 2
            )

        def loss_dense(q, k, v, s):
            return jnp.sum(
                dense_attention(q, k, v, s, causal=True).astype(jnp.float32) ** 2
            )

        f_gr = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))
        d_gr = jax.jit(jax.grad(loss_dense, argnums=(0, 1, 2)))

        t_ff = bench(f_fwd, q, k, v, spans)
        t_df = bench(d_fwd, q, k, v, spans)
        t_fg = bench(f_gr, q, k, v, spans)
        t_dg = bench(d_gr, q, k, v, spans)
        print(
            f"b={b} n={n}: fwd flash {t_ff:.2f} ms / dense {t_df:.2f} ms | "
            f"bwd(grad) flash {t_fg:.2f} ms / dense {t_dg:.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Per-chip CP chunk compute: Pallas offset-kernel vs dense jnp.

One ring step's work on one chip — local q block [b,h,nl,d] against one KV
chunk [b,h,nc,d] with the global transfusion mask — measured both ways at
long-context shards. This is exactly the per-chip inner loop of
parallel/context.py's ring schedule (multi-chip wall-clock = this x chunks
+ overlapped ppermute), so a kernel win here is the per-chip win the ring
inherits.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from transfusion_tpu.ops.pallas_attn_kernel import flash_attention
    from transfusion_tpu.parallel.context import _offset_attention

    b, h, d = 1, 8, 64
    softcap = 50.0

    for nl in (2048, 4096, 8192):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (
            jax.random.normal(kk, (b, h, nl, d), jnp.bfloat16) * 0.5
            for kk in ks
        )
        spans = jnp.asarray([[[0, nl // 2, nl // 2]]], jnp.int32)
        row_off = jnp.int32(nl)  # chip 1 of 2: rows nl..2nl-1
        col_off = jnp.int32(0)

        def dense_fn(q, k, v):
            return _offset_attention(
                q, k, v, spans, False, softcap, row_off
            ).astype(jnp.float32).sum()

        def kernel_fn(q, k, v):
            out, lse = flash_attention(
                q, k, v, spans, False, softcap,
                q_offset=row_off, kv_offset=col_off, return_lse=True,
            )
            return out.astype(jnp.float32).sum()

        for name, fn in (("dense", dense_fn), ("kernel", kernel_fn)):
            fwd = jax.jit(fn)
            gr = jax.jit(jax.grad(fn, argnums=(0, 1, 2)))

            float(fwd(q, k, v))  # compile + run
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(10):
                    r = fwd(q, k, v)
                float(r)
                best = min(best, (time.perf_counter() - t0) / 10)
            t_fwd = best

            g = gr(q, k, v)
            float(g[0].astype(jnp.float32).sum())
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(5):
                    g = gr(q, k, v)
                float(g[0].astype(jnp.float32).sum())
                best = min(best, (time.perf_counter() - t0) / 5)
            print(
                f"nl={nl:5d} {name:6s}: fwd {t_fwd*1e3:7.2f} ms   "
                f"fwd+bwd {best*1e3:7.2f} ms", flush=True,
            )


if __name__ == "__main__":
    main()

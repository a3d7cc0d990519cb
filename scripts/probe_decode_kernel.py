"""Micro-benchmark: decode_attention kernel vs XLA dense cached attention.

Isolates the attention op (no transformer around it) to find where the
kernel loses: grid-step overhead vs streaming. Sweeps block size via
_pick_bk monkeypatch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out.astype(jnp.float32)))  # force real completion (axon)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / 10)
    return best * 1e3  # ms


def main():
    import transfusion_tpu.ops.pallas_decode_kernel as dk
    from transfusion_tpu.models.layers import _quantize_rows

    b, h, d = 8, 8, 64
    nq = 1
    softcap = 50.0

    for cap in (2048, 8192, 32768):
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, h, nq, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, h, cap, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, h, cap, d), jnp.bfloat16)
        valid = jnp.arange(cap)[None, :] < cap - 5
        valid = jnp.broadcast_to(valid, (b, cap))
        bias = jnp.broadcast_to(
            jnp.where(valid, 0.0, dk.NEG_INF)[:, None, :], (b, 8, cap)
        ).astype(jnp.float32)
        k8, ks = _quantize_rows(k)
        v8, vs = _quantize_rows(v)
        ksT, vsT = ks.swapaxes(-1, -2), vs.swapaxes(-1, -2)

        @jax.jit
        def dense(q, k, v):
            s = jnp.einsum(
                "bhid,bhjd->bhij", q * d**-0.5, k,
                preferred_element_type=jnp.float32,
            )
            s = jnp.tanh(s / softcap) * softcap
            s = jnp.where(valid[:, None, None, :], s, -1e30)
            p = jax.nn.softmax(s, axis=-1)
            return jnp.einsum(
                "bhij,bhjd->bhid", p.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            )

        @jax.jit
        def dense_q8(q, k8, ks, v8, vs):
            kf = (k8 * ks).astype(jnp.bfloat16)  # ks: [b, h, cap, 1]
            vf = (v8 * vs).astype(jnp.bfloat16)
            return dense(q, kf, vf)

        t_dense = bench(dense, q, k, v)
        t_dense_q8 = bench(dense_q8, q, k8, ks, v8, vs)
        print(
            f"cap={cap}: dense bf16 {t_dense:.3f} ms | dense int8(mat) "
            f"{t_dense_q8:.3f} ms",
            flush=True,
        )

        kT, vT = k.swapaxes(-1, -2), v.swapaxes(-1, -2)
        k8T, v8T = k8.swapaxes(-1, -2), v8.swapaxes(-1, -2)
        for bk in (512, 1024, 2048):
            if cap % bk:
                continue
            orig = dk._pick_bk
            dk._pick_bk = lambda c, _bk=bk: _bk if c % _bk == 0 else orig(c)
            try:
                kern = jax.jit(
                    lambda q, kT, vT, bias: dk.decode_attention(
                        q, kT, vT, bias, softcap=softcap
                    )
                )
                kern8 = jax.jit(
                    lambda q, k8T, ksT, v8T, vsT, bias: dk.decode_attention(
                        q, k8T, v8T, bias, k_scale=ksT, v_scale=vsT,
                        softcap=softcap,
                    )
                )
                t_k = bench(kern, q, kT, vT, bias)
                t_k8 = bench(kern8, q, k8T, ksT, v8T, vsT, bias)
                print(
                    f"  kernel bk={bk}: bf16 {t_k:.3f} ms | int8 {t_k8:.3f} ms",
                    flush=True,
                )
            finally:
                dk._pick_bk = orig


if __name__ == "__main__":
    main()

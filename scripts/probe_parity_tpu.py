"""Quick flash-vs-dense parity check on the real TPU (not interpret mode)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from transfusion_tpu.ops.pallas_attn import _reference_attention
from transfusion_tpu.ops.pallas_attn_kernel import flash_attention


def main():
    rng = np.random.default_rng(0)
    for b, n, spans_on in [(4, 256, True), (2, 1024, True), (1, 8192, True)]:
        h, d = 8, 64
        q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
        spans = (
            jnp.asarray(
                np.stack([[[0, n // 4, n // 8], [1, n // 2, n // 8]]] * b),
                jnp.int32,
            )
            if spans_on
            else None
        )

        def lf(q, k, v):
            return jnp.sum(
                flash_attention(q, k, v, spans, causal=True).astype(jnp.float32)
                ** 2
            )

        def ld(q, k, v):
            return jnp.sum(
                _reference_attention(q, k, v, spans, True, 50.0).astype(
                    jnp.float32
                )
                ** 2
            )

        of = flash_attention(q, k, v, spans, causal=True).astype(jnp.float32)
        od = _reference_attention(q, k, v, spans, True, 50.0).astype(jnp.float32)
        gf = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(ld, argnums=(0, 1, 2))(q, k, v)
        err_o = float(jnp.max(jnp.abs(of - od)))
        err_g = max(
            float(jnp.max(jnp.abs(a.astype(jnp.float32) - b_.astype(jnp.float32))))
            for a, b_ in zip(gf, gd)
        )
        print(f"b={b} n={n}: max|o| err {err_o:.4f}, max|grad| err {err_g:.4f}",
              flush=True)
        assert err_o < 0.1 and err_g < 0.5, "parity failure"
    print("PARITY OK")


if __name__ == "__main__":
    main()

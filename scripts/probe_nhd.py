"""Probe: NHD fused-RoPE batched kernel vs the head-major path, on TPU.

Measures at the flagship bench shape (b=32, h=8, n=256, d=64, bf16):
  old: 3x rearrange in + XLA rope(q,k) + flash_attention + rearrange out
  new: flash_attention_nhd (rope + layout fused in-kernel)
fwd-only and fwd+bwd, K iterations inside one jitted lax.scan so the
tunnel RTT amortizes to RTT/K (TIMING LORE: K>=100).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

from transfusion_tpu.ops.pallas_attn import _reference_attention
from transfusion_tpu.ops.pallas_attn_kernel import (
    flash_attention,
    flash_attention_nhd,
)
from transfusion_tpu.ops.rope import apply_rope, rope_angles

B, H, N, D = 32, 8, 256, 64
HD = H * D
K = 100


def timeit(fn, *args):
    out = jax.jit(fn)(*args)
    jax.tree.map(lambda x: float(jnp.asarray(x).reshape(-1)[0]), out)
    t0 = time.perf_counter()
    out = jax.jit(fn)(*args)
    jax.tree.map(lambda x: float(jnp.asarray(x).reshape(-1)[0]), out)
    return (time.perf_counter() - t0) * 1e3 / K


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, N, HD)), jnp.bfloat16)
        for _ in range(3)
    )
    spans = jnp.asarray(
        np.stack(
            [
                np.stack(
                    [[0, o, 32] for o in range(16, 16 + 8 * 24, 24)]
                )
                for _ in range(B)
            ]
        ),
        jnp.int32,
    )  # [B, 8, 3]
    pos = jnp.broadcast_to(jnp.arange(N), (B, N))
    ang = rope_angles(pos, D)
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    def old_fwd(q, k, v):
        qh, kh, vh = (
            rearrange(t, "b n (h d) -> b h n d", h=H) for t in (q, k, v)
        )
        a = ang[:, None]
        qh = apply_rope(a, qh)
        kh = apply_rope(a, kh)
        o = flash_attention(qh, kh, vh, spans=spans, causal=True)
        return rearrange(o, "b h n d -> b n (h d)")

    def new_fwd(q, k, v):
        return flash_attention_nhd(
            q, k, v, H, cos=cos, sin=sin, spans=spans, causal=True
        )

    # --- parity on hardware ---
    o_old = jax.jit(old_fwd)(q, k, v).astype(jnp.float32)
    o_new = jax.jit(new_fwd)(q, k, v).astype(jnp.float32)
    print("TPU fwd maxdiff:", float(jnp.abs(o_old - o_new).max()))

    def g_old(q, k, v):
        def f(q, k, v):
            o = old_fwd(q, k, v)
            return (o.astype(jnp.float32) ** 2).sum()

        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    def g_new(q, k, v):
        def f(q, k, v):
            o = new_fwd(q, k, v)
            return (o.astype(jnp.float32) ** 2).sum()

        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    for a, b, nm in zip(jax.jit(g_old)(q, k, v), jax.jit(g_new)(q, k, v), "qkv"):
        print(
            f"TPU d{nm} maxdiff:",
            float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max()),
            " ref scale:",
            float(jnp.abs(a.astype(jnp.float32)).max()),
        )

    # --- timing: K-iteration scans ---
    def scan_of(fn):
        def run(q):
            def body(x, _):
                y = fn(x, k, v)
                return y.astype(x.dtype), None

            x, _ = jax.lax.scan(body, q, None, length=K)
            return x

        return run

    def scan_of_grad(gfn):
        def run(q):
            def body(x, _):
                dq, dk, dv = gfn(x, k, v)
                return (dq * 1e-3 + x).astype(x.dtype), None

            x, _ = jax.lax.scan(body, q, None, length=K)
            return x

        return run

    print(f"old fwd: {timeit(scan_of(old_fwd), q):.3f} ms")
    print(f"new fwd: {timeit(scan_of(new_fwd), q):.3f} ms")
    print(f"old fwd+bwd: {timeit(scan_of_grad(g_old), q):.3f} ms")
    print(f"new fwd+bwd: {timeit(scan_of_grad(g_new), q):.3f} ms")


if __name__ == "__main__":
    main()

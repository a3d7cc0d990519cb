"""Where does the dim-384 flagship step's 22-TFLOP/s ceiling come from?

Isolates, on the real TPU, (a) the achievable matmul throughput at the
bench's exact shapes ([7872,384] x the QKV/out/GEGLU kernels, chained
like one transformer layer, x8 layers in one scan dispatch), vs (b) the
real TransformerBlock forward at the same shapes, vs (c) its attention /
feedforward sub-parts. If (a) also sits near 22 TFLOP/s the ceiling is a
shape property (occupancy story confirmed at the matmul level); any gap
between (a) and (b) is framework overhead worth hunting.

Run (real TPU): python scripts/probe_occupancy.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

M, DIM, HEADS, DH = 7872, 384, 8, 64
FF_INNER = int(DIM * 4 * 2 / 3)  # 1024 (GEGLU 2/3 rule, layers.py:80)


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


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, DIM), jnp.bfloat16)

    # --- (a) pure matmul chain: one "layer" of QK+V+out + GEGLU FF ---
    ks = jax.random.split(key, 4)
    w_qkv = jax.random.normal(ks[0], (DIM, 3 * DIM), jnp.bfloat16) * 0.02
    w_out = jax.random.normal(ks[1], (DIM, DIM), jnp.bfloat16) * 0.02
    w_ff1 = jax.random.normal(ks[2], (DIM, 2 * FF_INNER), jnp.bfloat16) * 0.02
    w_ff2 = jax.random.normal(ks[3], (FF_INNER, DIM), jnp.bfloat16) * 0.02

    def layer_mm(x):
        qkv = x @ w_qkv
        a = qkv[:, :DIM]  # stand-in for attention output
        x = x + a @ w_out
        h = x @ w_ff1
        h = h[:, :FF_INNER] * jax.nn.gelu(h[:, FF_INNER:])
        return x + h @ w_ff2

    @jax.jit
    def chain8(x):
        def body(c, _):
            return layer_mm(c), None

        c, _ = jax.lax.scan(body, x, None, length=8)
        return c

    fl = (
        2 * M * DIM * (3 * DIM)
        + 2 * M * DIM * DIM
        + 2 * M * DIM * 2 * FF_INNER
        + 2 * M * FF_INNER * DIM
    )
    ms = timeit(chain8, x)
    print(f"(a) matmul chain x8 fwd: {ms:.2f} ms -> {8*fl/ms/1e9:.1f} TFLOP/s")

    @jax.jit
    def chain8_grad(x):
        return jax.grad(lambda v: jnp.sum(chain8(v).astype(jnp.float32)))(x)

    ms = timeit(chain8_grad, x)
    print(f"(a) matmul chain x8 fwd+bwd: {ms:.2f} ms -> {3*8*fl/ms/1e9:.1f} TFLOP/s")

    for mult in (2, 4):
        xl = jnp.tile(x, (mult, 1))
        ms = timeit(chain8, xl)
        print(
            f"(a') chain x8 fwd at M={M*mult}: {ms:.2f} ms -> "
            f"{mult*8*fl/ms/1e9:.1f} TFLOP/s"
        )

    # --- (b) the real TransformerBlock at bench shapes ---
    from transfusion_tpu.models.transformer import TransformerBlock

    b, n = 32, M // 32
    xb = jax.random.normal(key, (1, b, n, DIM), jnp.bfloat16)
    cond = jax.random.normal(key, (b, 1, 4 * DIM), jnp.bfloat16)
    iam = jnp.zeros((b, n), bool)
    blk = TransformerBlock(
        dim=DIM, dim_head=DH, heads=HEADS, dropout=0.0,
        ff_expansion_factor=4, attn_softcap=50.0, attn_gate_values=True,
        attn_laser=False, attn_impl="flash", streams=1, fracs=4,
        layer_index=0, is_first=True, has_skip=False, modality_only=False,
        flash_causal=True, deterministic=True, dtype=jnp.bfloat16,
    )
    args = (xb, None, cond, None, None, None, iam, None, None, None, None)
    params = blk.init(jax.random.PRNGKey(1), *args)

    @jax.jit
    def block8(xb):
        def body(c, _):
            out = blk.apply(params, c, *args[1:])
            return out[0], None

        c, _ = jax.lax.scan(body, xb, None, length=8)
        return c

    ms = timeit(block8, xb)
    print(f"(b) real block x8 fwd: {ms:.2f} ms")

    @jax.jit
    def block8_grad(xb):
        return jax.grad(lambda v: jnp.sum(block8(v).astype(jnp.float32)))(xb)

    ms = timeit(block8_grad, xb)
    print(f"(b) real block x8 fwd+bwd: {ms:.2f} ms")

    # --- (b2) block without adaLN conditioning (cond=None) ---
    args_nc = (xb, None, None, None, None, None, iam, None, None, None, None)
    params_nc = blk.init(jax.random.PRNGKey(1), *args_nc)

    @jax.jit
    def block8_nc(xb):
        def body(c, _):
            out = blk.apply(params_nc, c, *args_nc[1:])
            return out[0], None

        c, _ = jax.lax.scan(body, xb, None, length=8)
        return c

    ms = timeit(block8_nc, xb)
    print(f"(b2) block x8 fwd, no adaLN cond: {ms:.2f} ms")

    # --- (b3) dense attention variant ---
    blk_d = blk.copy(attn_impl="dense", flash_causal=False)
    seq = jnp.arange(n)
    causal = jnp.broadcast_to((seq[:, None] >= seq[None, :])[None, None], (b, 1, n, n))
    args_d = (xb, None, cond, None, causal, None, iam, None, None, None, None)
    params_d = blk_d.init(jax.random.PRNGKey(1), *args_d)

    @jax.jit
    def block8_d(xb):
        def body(c, _):
            out = blk_d.apply(params_d, c, *args_d[1:])
            return out[0], None

        c, _ = jax.lax.scan(body, xb, None, length=8)
        return c

    ms = timeit(block8_d, xb)
    print(f"(b3) block x8 fwd, dense attn: {ms:.2f} ms")

    # --- (c) attention / ff in isolation ---
    from transfusion_tpu.models.layers import Attention, FeedForward

    x3 = xb[0]
    attn = Attention(
        dim=DIM, dim_head=DH, heads=HEADS, dropout=0.0, softcap_value=50.0,
        gate_values=True, laser=False, learned_value_residual_mix=False,
        attn_impl="flash", dtype=jnp.bfloat16,
    )
    fspec = {"spans": None, "causal": True}
    ap = attn.init(jax.random.PRNGKey(2), x3, flash_spec=fspec)

    @jax.jit
    def attn8(x3):
        def body(c, _):
            o = attn.apply(ap, c, flash_spec=fspec)
            return o[0], None

        c, _ = jax.lax.scan(body, x3, None, length=8)
        return c

    ms = timeit(attn8, x3)
    print(f"(c) attention x8 fwd (flash causal): {ms:.2f} ms")

    ff = FeedForward(dim=DIM, expansion_factor=4, dropout=0.0, dtype=jnp.bfloat16)
    fp = ff.init(jax.random.PRNGKey(3), x3)

    @jax.jit
    def ff8(x3):
        def body(c, _):
            return ff.apply(fp, c), None

        c, _ = jax.lax.scan(body, x3, None, length=8)
        return c

    ms = timeit(ff8, x3)
    ff_fl = 2 * b * n * DIM * 2 * FF_INNER + 2 * b * n * FF_INNER * DIM
    print(f"(c) feedforward x8 fwd: {ms:.2f} ms -> {8*ff_fl/ms/1e9:.1f} TFLOP/s")


if __name__ == "__main__":
    main()

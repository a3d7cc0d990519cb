"""Within-layer fwd time breakdown at the bench config (x = [32,256,384] bf16).

probe_step_ablation pinned the flagship step's time IN the layers
(~1.65 ms/layer fwd at depth 8) while probe_occupancy showed the same-shape
matmuls run at 80-110 TFLOP/s in isolation — a 3-4x gap. This probe times
the layer's pieces standalone to localize it:
  attention (flash + dense), feedforward, AdaptiveWrapper overhead
  (wrapper(ff) - ff), and a fused-vs-split QKV projection microbench.

Run (real TPU): python scripts/probe_layer_breakdown.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_IT = 100  # the tunnel dispatch RTT is ~30 ms; at 20 iterations that was
# a ~1.5 ms/iter floor swamping every module — 100 shrinks it to ~0.3 ms
B, N, DIM = 32, 256, 384


def timeit(apply_fn, x0, reps=3):
    """Scan-fused timing: N_IT sequential applications in one dispatch.

    The body output is folded back into the carry with cheap slicing adds
    (not reductions — an earlier version's per-iteration mean+sum cost a
    ~1.5 ms floor that swamped the modules being measured)."""

    @jax.jit
    def run(x):
        def body(x, _):
            y = apply_fn(x)
            d = x.shape[-1]
            if y.shape == x.shape:
                x = y
            else:
                # consume every output column without reducing: fold
                # d-wide slices into x; the (<d)-wide tail via broadcast
                for k in range(y.shape[-1] // d):
                    x = x + 1e-3 * y[..., k * d : (k + 1) * d]
                tail = y.shape[-1] % d
                if tail:
                    x = x.at[..., :tail].add(1e-3 * y[..., -tail:])
            return x, None

        x, _ = jax.lax.scan(body, x, None, length=N_IT)
        return jnp.sum(x.astype(jnp.float32))

    float(run(x0))  # compile + force
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x0))
        best = min(best, (time.perf_counter() - t0) / N_IT)
    return best * 1e3


def main():
    import flax.linen as nn

    from transfusion_tpu.models.layers import (
        AdaptiveWrapper,
        Attention,
        FeedForward,
    )
    from transfusion_tpu.ops.rope import rope_angles

    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, DIM)), dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    angles = rope_angles(jnp.arange(N), 64)

    # --- harness floor ----------------------------------------------------
    ms = timeit(lambda xx: xx * jnp.bfloat16(1.0009765625), x)
    print(f"harness floor (one elementwise pass): {ms:.3f} ms")

    # --- attention ------------------------------------------------------
    for impl in ("flash", "dense"):
        attn = Attention(dim=DIM, attn_impl=impl, dtype=jnp.bfloat16)
        kwargs = dict(rope=angles)
        if impl == "flash":
            kwargs["flash_spec"] = {"causal": True, "spans": None}
        else:
            seq = jnp.arange(N)
            kwargs["mask"] = (seq[:, None] >= seq[None, :])[None, None]
        params = attn.init(key, x, **kwargs)
        ms = timeit(lambda xx: attn.apply(params, xx, **kwargs)[0], x)
        print(f"attention ({impl}): {ms:.3f} ms")

    # --- feedforward ------------------------------------------------------
    ff = FeedForward(dim=DIM, dtype=jnp.bfloat16)
    ffp = ff.init(key, x)
    ff_ms = timeit(lambda xx: ff.apply(ffp, xx), x)
    print(f"feedforward: {ff_ms:.3f} ms")

    # --- AdaptiveWrapper(ff): wrapper overhead = this - ff ----------------
    dim_cond = DIM * 4
    wrap = AdaptiveWrapper(
        fn=FeedForward(dim=DIM, dtype=jnp.bfloat16),
        dim=DIM,
        dim_cond=dim_cond,
        dtype=jnp.bfloat16,
    )
    cond = jnp.asarray(
        rng.standard_normal((B, 3, dim_cond)), dtype=jnp.float32
    )
    cond_index = jnp.asarray(rng.integers(0, 3, (B, N)), dtype=jnp.int32)
    iam = jnp.asarray(rng.integers(0, 2, (B, N)).astype(bool))
    wkw = dict(cond=cond, cond_index=cond_index, is_any_modality=iam)
    wp = wrap.init(key, x, **wkw)
    w_ms = timeit(lambda xx: wrap.apply(wp, xx, **wkw), x)
    print(
        f"AdaptiveWrapper(ff): {w_ms:.3f} ms "
        f"(wrapper overhead {w_ms - ff_ms:.3f} ms)"
    )

    # --- plain LayerNorm alone (the wrapper's f32-stat LN) ----------------
    ln = nn.LayerNorm(use_bias=False, use_scale=False, dtype=jnp.float32)
    lnp = ln.init(key, x)
    ln_ms = timeit(lambda xx: ln.apply(lnp, xx).astype(jnp.bfloat16), x)
    print(f"layernorm (f32 stats): {ln_ms:.3f} ms")

    # --- fused vs split projections ---------------------------------------
    h, dh = 8, 64
    dims = (2 * h * dh, h * dh, h)  # to_qk, to_v, to_gates

    class Split(nn.Module):
        @nn.compact
        def __call__(self, xx):
            outs = [
                nn.Dense(d, use_bias=False, dtype=jnp.bfloat16, name=f"d{i}")(xx)
                for i, d in enumerate(dims)
            ]
            return jnp.concatenate(outs, axis=-1)

    class Fused(nn.Module):
        @nn.compact
        def __call__(self, xx):
            return nn.Dense(
                sum(dims), use_bias=False, dtype=jnp.bfloat16, name="d"
            )(xx)

    for name, mod in (("split qk/v/gates", Split()), ("fused", Fused())):
        p = mod.init(key, x)
        ms = timeit(lambda xx: mod.apply(p, xx), x)
        print(f"projections {name}: {ms:.3f} ms")


if __name__ == "__main__":
    main()

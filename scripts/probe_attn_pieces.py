"""Decompose dense-attention fwd time + the model-level fwd gap (bench cfg).

probe_layer_breakdown (docs_evidence.md) left two unexplained numbers at the
bench config (b=32 n=256 dim=384 h=8 dh=64):
  1. dense attention fwd = 0.53 ms, of which only ~0.2 ms is matmul-roof —
     where do the other 0.33 ms go? (suspects: f32 score materialization,
     softcap tanh, mask where, b n (h d) <-> b h n d transposes, rope)
  2. per-layer pieces sum to ~0.97 ms x 8 = 7.8 ms, but probe_step_ablation
     measured fwd-only = 13.19 ms — ~5.4 ms unaccounted at model level
     (suspects: fixed head/embed cost vs hidden per-layer cost: unet skip
     concat+proj, hyper-connection plumbing, span mask build, loss head).

Run on an OTHERWISE IDLE machine (TIMING LORE in CLAUDE.md):
    python scripts/probe_attn_pieces.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_IT = 100
B, N, DIM, H, DH = 32, 256, 384, 8, 64
DI = H * DH


def timeit(apply_fn, x0, reps=3):
    """Scan-fused: N_IT sequential applications in one dispatch (RTT/N_IT
    floor). The body output folds back into the carry via cheap adds."""

    @jax.jit
    def run(x):
        def body(x, _):
            y = apply_fn(x)
            if y.shape == x.shape and y.dtype == x.dtype:
                return y, None
            # fold arbitrary-shaped output back into the carry
            red = jnp.sum(y.astype(jnp.float32)) * jnp.float32(1e-9)
            return x + red.astype(x.dtype), None

        x, _ = jax.lax.scan(body, x, None, length=N_IT)
        return jnp.sum(x.astype(jnp.float32))

    float(run(x0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x0))
        best = min(best, (time.perf_counter() - t0) / N_IT)
    return best * 1e3


def main():
    from transfusion_tpu.ops.norms import softclamp, max_neg_value
    from transfusion_tpu.ops.rope import apply_rope, rope_angles

    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, DIM)), dtype=jnp.bfloat16)
    q4 = jnp.asarray(
        rng.standard_normal((B, H, N, DH)), dtype=jnp.bfloat16
    )
    k4 = jnp.asarray(
        rng.standard_normal((B, H, N, DH)), dtype=jnp.bfloat16
    )
    v4 = jnp.asarray(
        rng.standard_normal((B, H, N, DH)), dtype=jnp.bfloat16
    )
    angles = rope_angles(jnp.arange(N), DH)
    seq = jnp.arange(N)
    causal = (seq[:, None] >= seq[None, :])[None, None]

    floor = timeit(lambda xx: xx * jnp.bfloat16(1.0009765625), x)
    print(f"harness floor: {floor:.3f} ms  (subtract from everything)")

    # --- attention internals, cumulative --------------------------------
    scale = DH**-0.5

    def qk(qq):
        return jnp.einsum(
            "bhid,bhjd->bhij", qq * scale, k4,
            preferred_element_type=jnp.float32,
        )

    def pieces(qq, *, cap=False, mask=False, soft=False, av=False,
               bf16_scores=False):
        sim = qk(qq)
        if cap:
            sim = softclamp(sim, 50.0)
        if bf16_scores:
            sim = sim.astype(jnp.bfloat16)
        if mask:
            sim = jnp.where(causal, sim, max_neg_value(sim.dtype))
        if soft:
            sim = jax.nn.softmax(sim, axis=-1)
        if av:
            sim = jnp.einsum(
                "bhij,bhjd->bhid", sim.astype(v4.dtype), v4,
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        return sim

    for label, kw in [
        ("qk einsum only (f32 out)", {}),
        ("+ softcap", dict(cap=True)),
        ("+ mask", dict(cap=True, mask=True)),
        ("+ softmax", dict(cap=True, mask=True, soft=True)),
        ("+ av (full core)", dict(cap=True, mask=True, soft=True, av=True)),
        (
            "full core, bf16 scores after softcap",
            dict(cap=True, mask=True, soft=True, av=True, bf16_scores=True),
        ),
    ]:
        ms = timeit(lambda qq, kw=kw: pieces(qq, **kw), q4)
        print(f"core {label}: {ms - floor:.3f} ms")

    # rope on q+k
    ms = timeit(
        lambda qq: apply_rope(angles[None, None], qq)
        + apply_rope(angles[None, None], k4),
        q4,
    )
    print(f"rope(q)+rope(k): {ms - floor:.3f} ms")

    # the b n (h d) -> b h n d transposes exactly as the attention wrapper
    # does them: THREE inbound rearranges (q, k, v at the inner dim H*DH =
    # 512 — NOT the model dim 384) plus ONE outbound inverse.
    xi = jnp.asarray(rng.standard_normal((B, N, DI)), dtype=jnp.bfloat16)

    def transposes(xx):
        from einops import rearrange

        qh = rearrange(xx, "b n (h d) -> b h n d", h=H)
        kh = rearrange(xx + jnp.bfloat16(1.0), "b n (h d) -> b h n d", h=H)
        vh = rearrange(xx + jnp.bfloat16(2.0), "b n (h d) -> b h n d", h=H)
        t = qh + kh + vh  # keep all three live so none is DCE'd
        return rearrange(t, "b h n d -> b n (h d)")

    ms = timeit(transposes, xi)
    print(f"rearrange 3-in+1-out (b n (h d) <-> b h n d, hd={DI}): "
          f"{ms - floor:.3f} ms")

    # --- model-level gap -------------------------------------------------
    from transfusion_tpu.models.transformer import Transformer

    key = jax.random.PRNGKey(0)
    spans = jnp.asarray(
        [[[1, 32, 96], [2, 160, 224]]] * B, dtype=jnp.int32
    )  # two modality spans per row, bench-like
    times_inst = jnp.asarray(
        rng.uniform(size=(B, 2)), dtype=jnp.float32
    )

    for depth in (2, 8):
        for label, kw in [
            ("causal-only", dict(causal=True)),
            (
                "bench-like (spans+times_inst)",
                dict(
                    causal=True,
                    spans=spans,
                    times_inst=times_inst,
                ),
            ),
        ]:
            tr = Transformer(
                dim=DIM, depth=depth, dim_head=DH, heads=H,
                attn_impl="flash", dtype=jnp.bfloat16,
            )
            params = tr.init(
                key, x, rotary_pos=jnp.arange(N), **kw
            )
            ms = timeit(
                lambda xx, tr=tr, params=params, kw=kw: tr.apply(
                    params, xx, rotary_pos=jnp.arange(N), **kw
                ),
                x,
            )
            print(f"transformer depth={depth} {label}: {ms - floor:.3f} ms")


if __name__ == "__main__":
    main()

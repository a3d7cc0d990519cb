"""Parity + timing for the DUS-scan sequence assembly (joint_embed_in /
joint_out) vs the advanced-index scatter/gather it replaced.

Run (real TPU): python scripts/probe_assembly.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_IT = 10


def timeit_scan(make_body, init_carry, reps=3):
    @jax.jit
    def run(carry):
        def body(c, i):
            return make_body(c, i), None

        c, _ = jax.lax.scan(body, carry, jnp.arange(N_IT))
        return c

    c = run(init_carry)
    float(jnp.sum(jax.tree.leaves(c)[0].astype(jnp.float32)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        c = run(init_carry)
        float(jnp.sum(jax.tree.leaves(c)[0].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / N_IT)
    return best * 1e3


def main():
    from transfusion_tpu.models.transfusion import Transfusion
    from transfusion_tpu.training.trainer import Trainer

    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    batch = [
        [
            rng.integers(0, 256, 32).astype(np.int32),
            (0, rng.standard_normal((14, 14, 32)).astype(np.float32)),
            rng.integers(0, 256, 8).astype(np.int32),
        ]
        for _ in range(32)
    ]
    model = Transfusion(
        num_text_tokens=256,
        dim_latent=32,
        modality_default_shape=(14, 14),
        transformer=dict(
            dim=384, depth=8, dim_head=64, heads=8, attn_impl="flash"
        ),
        pad_multiple=64,
        dtype=jnp.bfloat16,
    )
    packed = jax.tree.map(jnp.asarray, model.pack(batch, shift_friendly=True))
    params = model.init_params(jax.random.PRNGKey(0))

    # --- parity: new embed_in vs the old advanced-index scatter ---
    @jax.jit
    def embed_new(packed):
        return model.core.apply(params, packed, method="joint_embed_in")

    x_new, rotary, group_rows = embed_new(packed)

    @jax.jit
    def embed_old(packed):
        text = packed.text
        x = model.core.apply(
            params,
            jnp.where(text < 0, 0, text),
            method=lambda core, t: core.text_embed(t).astype(core.dtype),
        )
        for g, rows in zip(packed.groups, group_rows):
            in_rows = rows
            pos = model.core.apply(
                params,
                method=lambda core: core.axial_pos_emb(
                    g.modality_type, g.seq_shape
                ),
            )
            if pos is not None:
                in_rows = in_rows + pos[None]
            idx = g.offsets[:, None] + jnp.arange(g.seq_len)[None, :]
            x = x.at[g.batch_idx[:, None], idx].set(in_rows.astype(x.dtype))
        return x

    x_old = embed_old(packed)
    err = float(jnp.max(jnp.abs(x_new.astype(jnp.float32) - x_old.astype(jnp.float32))))
    print(f"embed_in parity max|diff|: {err:.3e}")
    assert err == 0.0, "DUS assembly must be bit-identical to the scatter"

    # --- timing: embed_in alone, full step ---
    def embedin(carry, i):
        x, _, _ = model.core.apply(
            params, packed.replace(text=packed.text + (i * 0)),
            method="joint_embed_in",
        )
        return carry + jnp.sum(x.astype(jnp.float32))

    print(f"embed_in (DUS scan): {timeit_scan(embedin, jnp.zeros(())):.2f} ms")

    trainer = Trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0))
    step_fn = trainer._build_step()
    key = jax.random.PRNGKey(2)

    def body(st, i):
        st, _ = step_fn(st, packed, jax.random.fold_in(key, i))
        return st

    print(f"full step (DUS assembly): {timeit_scan(body, state):.2f} ms")


if __name__ == "__main__":
    main()

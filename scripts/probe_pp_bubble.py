"""GPipe bubble fraction, measured: step time vs microbatch count M.

The schedule runs T = M + P - 1 stage-ticks and only M of them are useful
(parallel/pipeline.py docstring) -> per-sample time should scale like
(M + P - 1) / M at fixed total batch-rows-per-microbatch. On the 8-virtual-
device CPU mesh stages execute serially on one core, but the bubble's
garbage ticks are real executed compute there too, so the RATIO between M
settings still measures the schedule's bubble overhead (absolute times are
CPU-bound and meaningless).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/probe_pp_bubble.py
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from transfusion_tpu.models.transfusion import Transfusion
    from transfusion_tpu.parallel.mesh import make_mesh
    from transfusion_tpu.training.trainer import Trainer

    pipe = 4
    mesh = make_mesh(pipe=pipe)
    rng = np.random.default_rng(0)

    print(f"pipe={pipe}; per-sample step time vs microbatches M "
          f"(fixed microbatch size 1 row):")
    print(f"{'M':>3} {'ms/row':>9} {'model (M+P-1)/M':>16} "
          f"{'ms/row / model':>14}")
    for M in (2, 4, 8, 16):
        model = Transfusion(
            num_text_tokens=64,
            dim_latent=8,
            modality_default_shape=(2, 2),
            transformer=dict(
                dim=64, depth=8, dim_head=32, heads=2,
                unet_skips=False, num_residual_streams=1,
            ),
            pad_multiple=16,
        )
        trainer = Trainer(
            model, learning_rate=1e-3, mesh=mesh,
            pipeline_microbatches=M,
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        batch = [
            [
                rng.integers(0, 64, 12).astype(np.int32),
                (0, rng.standard_normal((2, 2, 8)).astype(np.float32)),
            ]
            for _ in range(M)  # one row per microbatch
        ]
        packed = model.pack(batch, shift_friendly=True)
        packed = jax.tree.map(jnp.asarray, packed)
        key = jax.random.PRNGKey(1)
        for _ in range(2):  # compile + warm
            key, k = jax.random.split(key)
            state, metrics = trainer.train_step(state, packed, k)
        float(metrics["loss"])
        reps, dts = 3, []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(3):
                key, k = jax.random.split(key)
                state, metrics = trainer.train_step(state, packed, k)
            float(metrics["loss"])
            dts.append((time.perf_counter() - t0) / 3)
        per_row = min(dts) / M * 1e3
        model_factor = (M + pipe - 1) / M
        # if the schedule matches the bubble model, this last column is a
        # constant (the per-tick cost) across all M
        print(
            f"{M:>3} {per_row:9.2f} {model_factor:16.2f} "
            f"{per_row / model_factor:14.2f}"
        )


if __name__ == "__main__":
    main()

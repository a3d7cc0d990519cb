"""GPipe vs 1F1B activation memory: XLA-reported temp allocation of one
joint train-loss step as the microbatch count grows.

GPipe differentiates through the whole schedule — autodiff stashes every
tick's carries, so temp memory grows with M. 1F1B keeps a W=2P-1 slot
ring buffer of stage inputs and recomputes the stage in its in-schedule
backward — temp memory should be ~flat in M.

Runs on the local CPU backend with 4 virtual devices (pipe=4).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from transfusion_tpu.models.transfusion import Transfusion  # noqa: E402
from transfusion_tpu.parallel.mesh import make_mesh  # noqa: E402

PIPE = 4


def model():
    return Transfusion(
        num_text_tokens=32,
        transformer=dict(
            dim=64, depth=4, dim_head=16, heads=4,
            unet_skips=False, num_residual_streams=1, dropout=0.0,
            attn_impl="dense",
        ),
        modality_default_shape=(4, 4),
        dim_latent=8,
        pad_multiple=16,
    )


def packed_batch(m, b):
    rng = np.random.default_rng(0)
    batch = [
        [
            rng.integers(0, 32, 24).astype(np.int32),
            (0, rng.standard_normal((4, 4, 8)).astype(np.float32)),
        ]
        for _ in range(b)
    ]
    return jax.tree.map(
        jnp.asarray,
        m.pack(
            m.encode_modalities(batch),
            wrap_sos_eos=True, add_meta=True, shift_friendly=True,
        ),
    )


def peak_temp_bytes(m, params, packed, pipeline):
    def loss(params):
        total, _ = m._loss_impl(
            params, packed, jax.random.PRNGKey(0), None, None,
            prob_uncond=0.0, velocity_delta=1e-3, train=True,
            pipeline=pipeline,
        )
        return total

    compiled = jax.jit(jax.grad(loss)).lower(params).compile()
    ma = compiled.memory_analysis()
    return int(ma.temp_size_in_bytes)


def main():
    m = model()
    params = m.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(pipe=PIPE)

    print(f"pipe={PIPE}, dim=64 depth=4, seq=pad16, per-mb rows fixed at 1")
    print(f"{'M':>4} {'gpipe temp MB':>14} {'1f1b temp MB':>13} {'ratio':>6}")
    for M in (4, 8, 16, 32):
        packed = packed_batch(m, M)  # microbatch size stays 1 row
        g = peak_temp_bytes(m, params, packed, (mesh, M, "gpipe"))
        f = peak_temp_bytes(m, params, packed, (mesh, M, "1f1b"))
        print(
            f"{M:>4} {g / 1e6:>14.2f} {f / 1e6:>13.2f} {g / max(f, 1):>6.2f}"
        )


if __name__ == "__main__":
    main()

"""Flowers VAE-latent flow matching (modality-only path).

Equivalent workload of reference train_latent_only.py (dim 256, depth 8,
4-channel 32x32 latents through a pretrained AutoencoderKL, scale 0.18215).
The diffusers VAE cannot be downloaded offline; synthetic latents with the
same shape/scale stand in (transfusion_tpu/data/datasets.py).
Run: python examples/train_latent_only.py --steps 200
"""

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import numpy as np
import optax

from _common import parse_args
from transfusion_tpu.data.datasets import load_flowers_latents
from transfusion_tpu.models.transfusion import Transfusion
from transfusion_tpu.training.ema import ema_update, init_ema


def main():
    args = parse_args(default_steps=200, default_sample_every=100, batch_size=8)

    model = Transfusion(
        num_text_tokens=1,
        dim_latent=4,
        channel_first_latent=False,  # latents stored channel-last here
        modality_default_shape=(32, 32),
        transformer=dict(dim=256, depth=8, dim_head=32, heads=8),
    )
    params = model.init_params(jax.random.PRNGKey(args.seed))
    ema = init_ema(params)
    tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(3e-4))
    opt = tx.init(params)

    latents = load_flowers_latents()
    rng_np = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(1)

    for step in range(1, args.steps + 1):
        idx = rng_np.integers(0, len(latents), args.batch_size)
        key, k = jax.random.split(key)
        loss, grads = jax.value_and_grad(
            lambda p: model.forward_modality(p, latents[idx], rng=k)
        )(params)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        ema = ema_update(ema, params)
        if step % 10 == 0 or step == 1:
            print(f"{step}: {float(loss):.4f}")

        if step % args.sample_every == 0:
            out = model.generate_modality_only(
                ema.params, batch_size=4, modality_steps=16,
                rng=jax.random.PRNGKey(step),
            )
            print("sampled latents:", out.shape,
                  "std", float(np.asarray(out).std()))


if __name__ == "__main__":
    main()

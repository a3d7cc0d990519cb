"""Flowers latents interleaved with byte-encoded text captions + CFG sampling.

Equivalent workload of reference train_latent_with_text.py: dim 128 depth 8,
recon loss 0.1, U-Net projections, EMA sampling with CFG. Captions come from
the reference's flowers labels file; latents are synthetic stand-ins (no
offline VAE — see train_latent_only.py).
Run: python examples/train_latent_with_text.py --steps 200
"""

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import flax.linen as nn
import jax
import numpy as np

from _common import parse_args, train_loop
from transfusion_tpu.data.dataloader import create_dataloader, cycle
from transfusion_tpu.data.datasets import load_flowers_labels, load_flowers_latents
from transfusion_tpu.models.transfusion import Transfusion
from transfusion_tpu.training.trainer import Trainer
from transfusion_tpu.utils import print_modality_sample


class Down(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Conv(128, (3, 3), strides=(2, 2), padding="SAME")(x)


class Up(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(4, (3, 3), strides=(2, 2), padding="SAME")(x)


def main():
    args = parse_args(default_steps=200, default_sample_every=100, batch_size=4)

    model = Transfusion(
        num_text_tokens=256,  # bytes
        dim_latent=4,
        modality_default_shape=(32, 32),
        pre_post_transformer_enc_dec=(Down(), Up()),
        reconstruction_loss_weight=0.1,
        prob_uncond=0.1,
        transformer=dict(dim=128, depth=8, dim_head=32, heads=8),
        pad_multiple=64,
    )
    trainer = Trainer(model, learning_rate=3e-4, grad_clip_norm=0.5)
    state = trainer.init_state(jax.random.PRNGKey(args.seed))

    latents = load_flowers_latents(n=512)
    labels = load_flowers_labels()
    dataset = [
        (
            np.frombuffer(
                labels[i % len(labels)].encode(), np.uint8
            ).astype(np.int32),
            latents[i],
        )
        for i in range(len(latents))
    ]
    iter_dl = cycle(create_dataloader(dataset, batch_size=args.batch_size, shuffle=True))

    def hook(step, state):
        if step % args.sample_every == 0:
            caption = np.frombuffer(labels[0].encode(), np.uint8).astype(np.int32)
            sample = model.sample(
                state.ema.params, prompt=caption,
                rng=jax.random.PRNGKey(step), max_length=16,
                modality_steps=16, cfg_scale=3.0,
            )
            print_modality_sample(sample)

    train_loop(trainer, state, iter_dl, args.steps, jax.random.PRNGKey(1), hook=hook)


if __name__ == "__main__":
    main()

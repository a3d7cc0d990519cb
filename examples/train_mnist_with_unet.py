"""MNIST with learnable U-Net down/up around the transformer.

Equivalent workload of reference train_mnist_with_unet.py:
`pre_post_transformer_enc_dec` conv pair downsampling 14x14 -> 7x7 inside
the model (the paper's learnable U-Net projections).
Run: python examples/train_mnist_with_unet.py --steps 300
"""

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import flax.linen as nn
import jax
import numpy as np
from einops import rearrange

from _common import parse_args, save_image_grid, train_loop
from transfusion_tpu.data.dataloader import create_dataloader, cycle
from transfusion_tpu.data.datasets import load_mnist
from transfusion_tpu.models.transfusion import Transfusion
from transfusion_tpu.training.trainer import Trainer

DIM = 64


class PatchEncoder(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = rearrange(x, "... (h p1) (w p2) -> ... h w (p1 p2)", p1=2, p2=2)
        return x * 2 - 1


class PatchDecoder(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = rearrange(x, "... h w (p1 p2) -> ... (h p1) (w p2)", p1=2, p2=2)
        return ((x + 1) * 0.5).clip(0.0, 1.0)


class Down(nn.Module):
    @nn.compact
    def __call__(self, x):  # [b, 14, 14, 4] -> [b, 7, 7, DIM]
        return nn.Conv(DIM, (3, 3), strides=(2, 2), padding="SAME")(x)


class Up(nn.Module):
    @nn.compact
    def __call__(self, x):  # [b, 7, 7, DIM] -> [b, 14, 14, 4]
        return nn.ConvTranspose(4, (3, 3), strides=(2, 2), padding="SAME")(x)


def main():
    args = parse_args(default_steps=300, default_sample_every=150, batch_size=16)

    model = Transfusion(
        num_text_tokens=10,
        dim_latent=4,
        modality_default_shape=(14, 14),
        modality_encoder=PatchEncoder(),
        modality_decoder=PatchDecoder(),
        pre_post_transformer_enc_dec=(Down(), Up()),
        transformer=dict(dim=DIM, depth=4, dim_head=32, heads=8),
        pad_multiple=64,
    )
    trainer = Trainer(model, learning_rate=8e-4, grad_clip_norm=0.5)
    state = trainer.init_state(jax.random.PRNGKey(args.seed))

    images, labels = load_mnist()
    dataset = [(np.array([l], np.int32), img) for img, l in zip(images, labels)]
    iter_dl = cycle(create_dataloader(dataset, batch_size=args.batch_size, shuffle=True))

    pathlib.Path("results").mkdir(exist_ok=True)

    def hook(step, state):
        if step % args.sample_every == 0:
            sample = model.sample(
                state.ema.params, prompt=np.array([step % 10], np.int32),
                rng=jax.random.PRNGKey(step), max_length=8,
                modality_steps=16, cfg_scale=3.0,
            )
            for item in sample:
                if isinstance(item, tuple):
                    save_image_grid(item[1][None], f"results/mnist_unet_{step}")

    train_loop(trainer, state, iter_dl, args.steps, jax.random.PRNGKey(1), hook=hook)


if __name__ == "__main__":
    main()

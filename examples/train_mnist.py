"""Label -> image on raw 2x2-patchified MNIST pixels (dim_latent 4).

Equivalent workload of reference train_mnist.py: patchify encoder/decoder
modules, prob_uncond 0.1, EMA sampling with cfg_scale 3.0.
Run: python examples/train_mnist.py --steps 500
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
from transfusion_tpu.utils import print_modality_sample

IMAGE_AFTER_TEXT = True


class PatchEncoder(nn.Module):
    """[.., 28, 28] pixels -> [.., 14, 14, 4] patches in [-1, 1]."""

    @nn.compact
    def __call__(self, x):
        x = rearrange(x, "... (h p1) (w p2) -> ... h w (p1 p2)", p1=2, p2=2)
        return x * 2 - 1


class PatchDecoder(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = rearrange(x, "... h w (p1 p2) -> ... (h p1) (w p2)", p1=2, p2=2)
        return ((x + 1) * 0.5).clip(0.0, 1.0)


def main():
    args = parse_args(default_steps=500, default_sample_every=250, batch_size=16)

    model = Transfusion(
        num_text_tokens=10,
        dim_latent=4,
        modality_default_shape=(14, 14),
        modality_encoder=PatchEncoder(),
        modality_decoder=PatchDecoder(),
        prob_uncond=0.1,
        transformer=dict(dim=64, depth=4, dim_head=32, heads=8),
        pad_multiple=256,
    )
    trainer = Trainer(model, learning_rate=8e-4, grad_clip_norm=0.5)
    state = trainer.init_state(jax.random.PRNGKey(args.seed))

    images, labels = load_mnist()
    dataset = [
        (
            (np.array([l], np.int32), img)
            if IMAGE_AFTER_TEXT
            else (img, np.array([l], np.int32))
        )
        for img, l in zip(images, labels)
    ]
    iter_dl = cycle(create_dataloader(dataset, batch_size=args.batch_size, shuffle=True))

    def hook(step, state):
        if step % args.sample_every == 0:
            sample = model.sample(
                state.ema.params,
                prompt=np.array([step % 10], np.int32),
                rng=jax.random.PRNGKey(step),
                max_length=8, modality_steps=16, cfg_scale=3.0,
            )
            print_modality_sample(sample)
            for item in sample:
                if isinstance(item, tuple):
                    save_image_grid(item[1][None], f"results/mnist_{step}")

    pathlib.Path("results").mkdir(exist_ok=True)
    train_loop(trainer, state, iter_dl, args.steps, jax.random.PRNGKey(1), hook=hook)


if __name__ == "__main__":
    main()

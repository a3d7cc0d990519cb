"""Two-stage: train a small conv autoencoder (with the noised-latent
robustness trick), then Transfusion on its latents.

Equivalent workload of reference train_mnist_vae.py (dim_latent 16,
optimizer excludes the frozen encoder/decoder automatically — aux modules
are outside the core param tree in this framework).
Run: python examples/train_mnist_vae.py --steps 300
"""

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from _common import parse_args, save_image_grid, train_loop
from transfusion_tpu.data.dataloader import create_dataloader, cycle
from transfusion_tpu.data.datasets import load_mnist
from transfusion_tpu.models.transfusion import Transfusion
from transfusion_tpu.training.trainer import Trainer

DIM_LATENT = 16


class Encoder(nn.Module):
    @nn.compact
    def __call__(self, x):  # [.., 28, 28] -> [.., 7, 7, DIM_LATENT]
        x = x[..., None] * 2 - 1
        x = nn.Conv(32, (4, 4), strides=(2, 2), padding="SAME")(x)
        x = nn.gelu(x)
        x = nn.Conv(DIM_LATENT, (4, 4), strides=(2, 2), padding="SAME")(x)
        return x


class Decoder(nn.Module):
    @nn.compact
    def __call__(self, z):  # [.., 7, 7, DIM_LATENT] -> [.., 28, 28]
        x = nn.ConvTranspose(32, (4, 4), strides=(2, 2), padding="SAME")(z)
        x = nn.gelu(x)
        x = nn.ConvTranspose(1, (4, 4), strides=(2, 2), padding="SAME")(x)
        return ((x[..., 0] + 1) * 0.5).clip(0.0, 1.0)


def train_autoencoder(images, steps=300, batch=64, seed=0):
    enc, dec = Encoder(), Decoder()
    rng = jax.random.PRNGKey(seed)
    pe = enc.init(rng, images[:1])
    pd = dec.init(rng, enc.apply(pe, images[:1]))
    params = {"enc": pe, "dec": pd}
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    rng_np = np.random.default_rng(seed)

    @jax.jit
    def step(params, opt, batch_imgs, key):
        def loss_fn(p):
            z = enc.apply(p["enc"], batch_imgs)
            # noised-latent robustness trick (reference train_mnist_vae.py:96-114)
            t = jax.random.uniform(key, (z.shape[0], 1, 1, 1), minval=0.0, maxval=0.3)
            z_noised = z + jax.random.normal(key, z.shape) * t
            recon = dec.apply(p["dec"], z_noised)
            return jnp.mean((recon - batch_imgs) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(g, opt)
        return optax.apply_updates(params, updates), opt, loss

    key = jax.random.PRNGKey(seed + 1)
    for i in range(steps):
        idx = rng_np.integers(0, len(images), batch)
        key, k = jax.random.split(key)
        params, opt, loss = step(params, opt, images[idx], k)
        if i % 50 == 0:
            print(f"ae {i}: {float(loss):.4f}")
    return enc, dec, params


def main():
    args = parse_args(default_steps=300, default_sample_every=150, batch_size=16, ae_steps=200)
    images, labels = load_mnist()

    enc, dec, ae_params = train_autoencoder(images, steps=args.ae_steps, seed=args.seed)

    model = Transfusion(
        num_text_tokens=10,
        dim_latent=DIM_LATENT,
        modality_default_shape=(7, 7),
        modality_encoder=(enc, ae_params["enc"]),
        modality_decoder=(dec, ae_params["dec"]),
        transformer=dict(dim=64, depth=4, dim_head=32, heads=8),
        pad_multiple=64,
    )
    trainer = Trainer(model, learning_rate=8e-4, grad_clip_norm=0.5)
    state = trainer.init_state(jax.random.PRNGKey(args.seed))

    dataset = [
        (np.array([l], np.int32), img) for img, l in zip(images, labels)
    ]
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
                    save_image_grid(item[1][None], f"results/mnist_vae_{step}")

    train_loop(trainer, state, iter_dl, args.steps, jax.random.PRNGKey(1), hook=hook)


if __name__ == "__main__":
    main()

"""Unconditional MNIST flow matching with velocity consistency + Muon.

Equivalent workload of reference train_image_only.py: forward_modality path,
velocity-consistency vs the EMA model, recon loss, LASER attention,
MuonAdamAtan2 on the matrix params.
Run: python examples/train_image_only.py --steps 300
"""

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import flax.linen as nn
import jax
import numpy as np
import optax
from einops import rearrange

from _common import parse_args, save_image_grid
from transfusion_tpu.data.datasets import load_mnist
from transfusion_tpu.models.transfusion import Transfusion
from transfusion_tpu.training import muon_adam_atan2
from transfusion_tpu.training.ema import ema_update, init_ema


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


def main():
    args = parse_args(default_steps=300, default_sample_every=150, batch_size=32)

    model = Transfusion(
        num_text_tokens=0 or 1,  # modality-only training; 1 token placeholder
        dim_latent=4,
        modality_default_shape=(14, 14),
        modality_encoder=PatchEncoder(),
        modality_decoder=PatchDecoder(),
        reconstruction_loss_weight=0.1,
        velocity_consistency_loss_weight=0.1,
        transformer=dict(dim=64, depth=4, dim_head=32, heads=8, attn_laser=True),
    )
    params = model.init_params(jax.random.PRNGKey(args.seed))
    ema = init_ema(params)

    tx = optax.chain(
        optax.clip_by_global_norm(0.5), muon_adam_atan2(muon_lr=3e-4, adam_lr=3e-4)
    )
    opt = tx.init(params)

    images, _ = load_mnist()
    rng_np = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(1)

    def loss_fn(p, batch, k, ema_p):
        total = model.forward_modality(
            p, batch, rng=k,
            velocity_consistency_ema_params=ema_p,
        )
        return total

    pathlib.Path("results").mkdir(exist_ok=True)

    for step in range(1, args.steps + 1):
        idx = rng_np.integers(0, len(images), args.batch_size)
        key, k = jax.random.split(key)
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, images[idx], k, ema.params)
        )(params)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        ema = ema_update(ema, params)
        if step % 10 == 0 or step == 1:
            print(f"{step}: {float(loss):.4f}")

        if step % args.sample_every == 0:
            out = model.generate_modality_only(
                ema.params, batch_size=16, modality_steps=16,
                rng=jax.random.PRNGKey(step),
            )
            save_image_grid(np.asarray(out), f"results/image_only_{step}")


if __name__ == "__main__":
    main()

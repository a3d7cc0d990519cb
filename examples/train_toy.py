"""Smallest smoke config: constant text token + 2x16 latent.

Equivalent workload of reference train_toy.py.
Run: python examples/train_toy.py --steps 200
"""

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import numpy as np

from _common import parse_args, train_loop
from transfusion_tpu.data.dataloader import create_dataloader, cycle
from transfusion_tpu.models.transfusion import Transfusion
from transfusion_tpu.training.trainer import Trainer
from transfusion_tpu.utils import print_modality_sample


def main():
    args = parse_args(default_steps=200)
    rng = jax.random.PRNGKey(args.seed)

    model = Transfusion(
        num_text_tokens=8,
        dim_latent=16,
        modality_default_shape=(2,),
        transformer=dict(dim=64, depth=1, dim_head=8, heads=2),
        pad_multiple=16,
    )
    trainer = Trainer(model, learning_rate=3e-4, grad_clip_norm=0.5)
    state = trainer.init_state(rng)

    data_rng = np.random.default_rng(args.seed)
    dataset = [
        (np.ones(1, np.int32), data_rng.standard_normal((2, 16)).astype(np.float32))
        for _ in range(100)
    ]
    iter_dl = cycle(create_dataloader(dataset, batch_size=args.batch_size))

    def hook(step, state):
        if step % args.sample_every == 0:
            sample = model.sample(
                state.ema.params, rng=jax.random.PRNGKey(step),
                max_length=16, modality_steps=8,
            )
            print_modality_sample(sample)

    train_loop(trainer, state, iter_dl, args.steps, jax.random.PRNGKey(1), hook=hook)


if __name__ == "__main__":
    main()

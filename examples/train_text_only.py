"""Byte-level language modeling (enwik8 when available, else repo text).

Equivalent workload of reference train_text_only.py: dim 384 depth 8,
seq 256, batch 4 x grad-accum 4, LASER attention, periodic generation.
Run: python examples/train_text_only.py --steps 200
"""

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import numpy as np
import optax

from _common import parse_args, train_loop
from transfusion_tpu.data.datasets import load_enwik8
from transfusion_tpu.models.transfusion import Transfusion
from transfusion_tpu.training.trainer import Trainer

SEQ_LEN = 256


def main():
    args = parse_args(default_steps=200, default_sample_every=100, batch_size=4)
    grad_accum = 4

    model = Transfusion(
        num_text_tokens=256,
        dim_latent=384,
        modality_default_shape=(),
        transformer=dict(
            dim=384, depth=8, dim_head=64, heads=8, attn_laser=True
        ),
    )
    optimizer = optax.MultiSteps(optax.adam(3e-4), every_k_schedule=grad_accum)
    trainer = Trainer(model, optimizer=optimizer, grad_clip_norm=0.5)

    params = model.init_params(jax.random.PRNGKey(args.seed))
    import jax.numpy as jnp
    from transfusion_tpu.training.ema import init_ema
    from transfusion_tpu.training.trainer import TrainState

    state = TrainState(
        params=params,
        opt_state=trainer.tx.init(params),
        ema=init_ema(params),
        step=jnp.zeros((), jnp.int32),
    )

    data = load_enwik8()
    split = int(len(data) * 0.9)
    train_data, valid_data = data[:split], data[split:]
    rng_np = np.random.default_rng(args.seed)

    # text-only fast path: fixed [b, n] int batches through forward_text
    def sample_batch(source):
        idx = rng_np.integers(0, len(source) - SEQ_LEN - 1, args.batch_size)
        return np.stack([source[i : i + SEQ_LEN + 1] for i in idx]).astype(np.int32)

    @jax.jit
    def step_fn(state, batch):
        def loss_fn(p):
            return model._text_loss_impl(p, batch)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = trainer.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        from transfusion_tpu.training.ema import ema_update

        return (
            TrainState(
                params=params, opt_state=opt_state,
                ema=ema_update(state.ema, params), step=state.step + 1,
            ),
            loss,
        )

    for step in range(1, args.steps + 1):
        for _ in range(grad_accum):
            state, loss = step_fn(state, sample_batch(train_data))
        if step % 10 == 0 or step == 1:
            vloss = model.forward_text(state.params, sample_batch(valid_data))
            print(f"{step}: train {float(loss):.4f} valid {float(vloss):.4f}")

        if step % args.sample_every == 0:
            prime = sample_batch(valid_data)[:1, :64]
            out = model.generate_text_only(
                state.params, prime, seq_len=64 + 128,
                rng=jax.random.PRNGKey(step),
            )
            text = bytes(np.asarray(out[0]).clip(0, 255).tolist()).decode(
                "utf-8", errors="replace"
            )
            print("SAMPLE:", repr(text[:200]))


if __name__ == "__main__":
    main()

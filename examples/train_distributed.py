"""Distributed training: DP x FSDP x TP (x optional SP/context) over a device mesh.

No reference equivalent (the reference's only parallelism is HF accelerate
DDP in two scripts). Auto-factors the available devices into a
data x fsdp x tensor mesh; run with virtual devices to try locally:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/train_distributed.py --steps 10

Sequence (context) parallelism — shard the packed sequence over a 'context'
axis with ring attention:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/train_distributed.py --steps 10 --context 2

Pipeline parallelism — split the layer stack into stages over a 'pipe' axis
(GPipe microbatch schedule, parallel/pipeline.py; text-LM workload):

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/train_distributed.py --steps 10 --pipeline 4
"""

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import numpy as np

from _common import parse_args, train_loop
from transfusion_tpu.data.dataloader import create_dataloader, cycle
from transfusion_tpu.models.transfusion import Transfusion
from transfusion_tpu.parallel import make_mesh
from transfusion_tpu.training.trainer import Trainer


def factor_devices(n):
    dims = [1, 1, 1]  # data, fsdp, tensor
    i = 0
    k = 2
    while n > 1:
        while n % k == 0:
            dims[i % 3] *= k
            n //= k
            i += 1
        k += 1
    return dims


def train_pipeline(args, n_dev):
    """GPipe pipeline-parallel causal-LM training (parallel/pipeline.py).

    PP integrates at the transformer-stack level (stacked stage params over
    the 'pipe' axis), so this path drives the Transformer directly with a
    byte-LM loss instead of the Trainer."""
    import jax.numpy as jnp
    import optax

    from transfusion_tpu.models.transformer import Transformer
    from transfusion_tpu.parallel.pipeline import pipeline_transformer_forward

    pipe = args.pipeline
    assert n_dev % pipe == 0, f"{n_dev} devices not divisible by pipe={pipe}"
    data = n_dev // pipe
    mesh = make_mesh(data=data, pipe=pipe)
    print(f"devices={n_dev} mesh: data={data} pipe={pipe}")

    t = Transformer(
        dim=256, depth=4 * max(pipe // 4, 1), dim_head=64, heads=4,
        unet_skips=False, num_residual_streams=1,
    )
    vocab, n = 256, 128
    bs = max(args.batch_size, 2 * data) // data * data
    # largest M <= 2*pipe with bs divisible by M and the per-microbatch
    # rows divisible by the data axis
    microbatches = 1
    for m in range(min(2 * pipe, bs), 0, -1):
        if bs % m == 0 and (bs // m) % data == 0:
            microbatches = m
            break

    rng = np.random.default_rng(args.seed)
    text = ("the quick brown fox jumps over the lazy dog. " * 64).encode()
    data_arr = np.frombuffer(text, np.uint8)

    x0 = jnp.zeros((bs, n, 256), jnp.float32)
    tparams = t.init(
        jax.random.PRNGKey(args.seed), x0, causal=True,
        rotary_pos=jnp.arange(n),
    )["params"]
    emb = jnp.asarray(
        rng.standard_normal((vocab, 256)) * 0.02, jnp.float32
    )
    params = {"emb": emb, "transformer": tparams}

    def loss_fn(p, tokens):
        x = p["emb"][tokens]
        out = pipeline_transformer_forward(
            p["transformer"], t, mesh, microbatches, x, causal=True,
            rotary_pos=jnp.arange(n),
        )
        logits = out @ p["emb"].T
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(
            jnp.take_along_axis(logp[:, :-1], tokens[:, 1:, None], -1)
        )

    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, opt, tokens):
        l, g = jax.value_and_grad(loss_fn)(p, tokens)
        upd, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, upd), opt, l

    for s in range(1, args.steps + 1):
        starts = rng.integers(0, len(data_arr) - n - 1, bs)
        tokens = jnp.asarray(
            np.stack([data_arr[st : st + n] for st in starts]), jnp.int32
        )
        params, opt, loss = step(params, opt, tokens)
        if s % 10 == 0 or s == 1:
            print(f"{s}: {float(loss):.4f}")


def main():
    args = parse_args(default_steps=20, default_sample_every=10**9,
                      batch_size=8, context=1, pipeline=1)

    n_dev = len(jax.devices())
    if args.pipeline > 1:
        return train_pipeline(args, n_dev)
    context = max(1, args.context)
    data, fsdp, tensor = factor_devices(n_dev // context)
    mesh = make_mesh(data=data, fsdp=fsdp, tensor=tensor, context=context)
    print(
        f"devices={n_dev} mesh: data={data} fsdp={fsdp} tensor={tensor} "
        f"context={context}"
    )

    tcfg = dict(dim=256, depth=4, dim_head=64, heads=8)
    if context > 1:
        # ring attention: KV chunks rotate over the ICI ring, O(n/c) memory
        tcfg.update(attn_impl="ring", mesh=mesh)
    model = Transfusion(
        num_text_tokens=256,
        dim_latent=32,
        modality_default_shape=(8, 8),
        transformer=tcfg,
        pad_multiple=64,
    )
    trainer = Trainer(model, learning_rate=3e-4, mesh=mesh,
                      metrics_path="results/distributed_metrics.jsonl")
    state = trainer.init_state(jax.random.PRNGKey(args.seed))

    rng = np.random.default_rng(args.seed)
    dataset = [
        (
            rng.integers(0, 256, 16).astype(np.int32),
            rng.standard_normal((8, 8, 32)).astype(np.float32),
        )
        for _ in range(256)
    ]
    # batch size must be divisible by the data axis
    bs = max(args.batch_size, data) // data * data
    iter_dl = cycle(create_dataloader(dataset, batch_size=bs, shuffle=True))

    pathlib.Path("results").mkdir(exist_ok=True)
    train_loop(trainer, state, iter_dl, args.steps, jax.random.PRNGKey(1))


if __name__ == "__main__":
    main()

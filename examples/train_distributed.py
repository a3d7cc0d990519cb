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

Pipeline parallelism — the full Transfusion joint loss with the transformer
trunk split into stages over a 'pipe' axis (GPipe microbatch schedule,
Trainer(pipeline_microbatches=), parallel/pipeline.py):

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
    """GPipe pipeline-parallel training of the full Transfusion model
    (joint multimodal loss) through the Trainer API: the transformer trunk
    runs as stacked stages over the 'pipe' axis while microbatches split
    over 'data' (Trainer(pipeline_microbatches=), parallel/pipeline.py)."""
    pipe = args.pipeline
    assert n_dev % pipe == 0, f"{n_dev} devices not divisible by pipe={pipe}"
    data = n_dev // pipe
    mesh = make_mesh(data=data, pipe=pipe)

    # largest M <= 2*pipe with bs divisible by M and the per-microbatch
    # rows divisible by the data axis (bubble fraction (pipe-1)/(M+pipe-1))
    bs = max(args.batch_size, 2 * pipe * data)
    microbatches = pipe
    for m in range(min(2 * pipe, bs), pipe - 1, -1):
        if bs % m == 0 and (bs // m) % data == 0:
            microbatches = m
            break
    print(
        f"devices={n_dev} mesh: data={data} pipe={pipe} "
        f"microbatches={microbatches} batch={bs}"
    )

    model = Transfusion(
        num_text_tokens=256,
        dim_latent=32,
        modality_default_shape=(8, 8),
        transformer=dict(
            dim=256, depth=4 * max(pipe // 4, 1), dim_head=64, heads=8,
            unet_skips=False, num_residual_streams=1,
        ),
        pad_multiple=64,
    )
    trainer = Trainer(
        model, learning_rate=3e-4, mesh=mesh,
        pipeline_microbatches=microbatches,
        metrics_path="results/distributed_metrics.jsonl",
    )
    state = trainer.init_state(jax.random.PRNGKey(args.seed))

    rng = np.random.default_rng(args.seed)
    dataset = [
        (
            rng.integers(0, 256, 16).astype(np.int32),
            rng.standard_normal((8, 8, 32)).astype(np.float32),
        )
        for _ in range(256)
    ]
    iter_dl = cycle(create_dataloader(dataset, batch_size=bs, shuffle=True))

    pathlib.Path("results").mkdir(exist_ok=True)
    train_loop(trainer, state, iter_dl, args.steps, jax.random.PRNGKey(1))


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

"""EMA wrapper forwarding, metrics logger, dataloader."""

import json

import jax
import numpy as np

from transfusion_tpu.data.dataloader import DataLoader, cycle
from transfusion_tpu.models.transfusion import Transfusion
from transfusion_tpu.training.metrics import MetricsLogger


def tiny_model():
    return Transfusion(
        num_text_tokens=8,
        dim_latent=16,
        modality_default_shape=(2,),
        transformer=dict(dim=32, depth=1, dim_head=8, heads=2),
        pad_multiple=16,
    )


def test_ema_forwards_sampling_methods():
    model = tiny_model()
    params = model.init_params(jax.random.PRNGKey(0))
    ema = model.create_ema(params)

    # sampling methods run against EMA weights (reference :1610-1617)
    out = ema.generate_modality_only(
        batch_size=2, modality_steps=2, rng=jax.random.PRNGKey(1)
    )
    assert out.shape == (2, 2, 16)

    sample = ema.sample(rng=jax.random.PRNGKey(2), max_length=4, modality_steps=2)
    assert len(sample) >= 1

    toks = ema.generate_text_only(
        np.zeros((1, 2), np.int32), seq_len=6, rng=jax.random.PRNGKey(3)
    )
    assert toks.shape == (1, 4)

    # update moves ema state
    p2 = jax.tree.map(lambda x: x + 1.0, params)
    before = jax.tree.leaves(ema.ema_params)[0]
    for _ in range(3):
        ema.update(p2)
    after = jax.tree.leaves(ema.ema_params)[0]
    assert not np.allclose(before, after)


def test_metrics_logger(tmp_path):
    path = tmp_path / "metrics.jsonl"
    log = MetricsLogger(str(path))
    log.log(1, {"loss": 2.0}, tokens=100)
    log.log(2, {"loss": 1.0}, tokens=100)
    log.close()

    rows = [json.loads(l) for l in path.read_text().splitlines()]
    assert rows[0]["loss"] == 2.0
    assert "tokens_per_sec" in rows[1]
    assert log.ewma("loss") is not None


def test_dataloader_batching():
    data = [(np.array([i], np.int32), np.zeros((2, 4), np.float32)) for i in range(10)]
    dl = DataLoader(data, batch_size=4, shuffle=True, seed=0)
    batches = list(dl)
    assert len(batches) == 2  # drop_last
    assert all(len(b) == 4 for b in batches)
    assert isinstance(batches[0][0], list)

    it = cycle(DataLoader(data, batch_size=4))
    assert len(next(it)) == 4
    for _ in range(5):
        next(it)  # cycles indefinitely


def test_packing_loader_pipeline():
    from transfusion_tpu.data.dataloader import PackingLoader
    from transfusion_tpu.training.trainer import Trainer

    model = tiny_model()
    trainer = Trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0))

    data = [
        (np.random.randint(0, 8, 4).astype(np.int32),
         np.random.randn(2, 16).astype(np.float32))
        for _ in range(12)
    ]
    loader = PackingLoader(model, data, batch_size=4, seed=0)
    try:
        for i in range(4):  # cycles past one epoch
            packed = next(loader)
            state, metrics = trainer.train_step(
                state, packed, jax.random.PRNGKey(i)
            )
            assert np.isfinite(float(metrics["loss"]))
    finally:
        loader.close()

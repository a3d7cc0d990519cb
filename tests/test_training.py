"""Trainer / EMA / optimizer / checkpoint / mesh tests (CPU x8 devices)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from transfusion_tpu.models.transfusion import Transfusion
from transfusion_tpu.parallel import make_mesh, shard_params
from transfusion_tpu.training import (
    EmaState,
    adam_atan2,
    ema_update,
    muon,
    muon_adam_atan2,
    muon_param_mask,
)
from transfusion_tpu.training.ema import init_ema
from transfusion_tpu.training.trainer import Trainer


def tiny_model(**kw):
    return Transfusion(
        num_text_tokens=8,
        dim_latent=16,
        modality_default_shape=(4,),
        transformer=dict(dim=32, depth=2, dim_head=8, heads=4),
        pad_multiple=16,
        **kw,
    )


def tiny_batch():
    return [
        [np.random.randint(0, 8, 6).astype(np.int32),
         np.random.randn(4, 16).astype(np.float32)],
        [np.random.randint(0, 8, 3).astype(np.int32),
         np.random.randn(2, 16).astype(np.float32),
         np.random.randint(0, 8, 2).astype(np.int32)],
    ]


def test_trainer_loss_decreases():
    model = tiny_model()
    trainer = Trainer(model, learning_rate=1e-3)
    state = trainer.init_state(jax.random.PRNGKey(0))

    batch = tiny_batch()
    packed = model.pack(batch)

    losses = []
    for i in range(12):
        state, metrics = trainer.train_step(
            state, packed, jax.random.PRNGKey(100 + i)
        )
        losses.append(float(metrics["loss"]))

    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    assert int(state.step) == 12


def test_trainer_velocity_consistency_path():
    model = tiny_model()
    trainer = Trainer(model, velocity_consistency=True)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, metrics = trainer.train_step(
        state, tiny_batch(), jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["loss"]))


def test_ema_schedule():
    params = {"w": jnp.ones(3)}
    state = init_ema(params)
    # before warmup: copies
    state = ema_update(state, {"w": jnp.full(3, 2.0)}, update_after_step=2,
                       update_every=1)
    np.testing.assert_allclose(state.params["w"], 2.0)
    state = ema_update(state, {"w": jnp.full(3, 4.0)}, update_after_step=2,
                       update_every=1)
    np.testing.assert_allclose(state.params["w"], 4.0)
    # after warmup: blends with beta
    state = ema_update(state, {"w": jnp.full(3, 8.0)}, beta=0.5,
                       update_after_step=2, update_every=1)
    np.testing.assert_allclose(state.params["w"], 6.0)


def test_muon_mask_targets_matrices():
    model = tiny_model()
    params = model.init_params(jax.random.PRNGKey(0))
    mask = muon_param_mask(params)
    leaves = jax.tree.leaves(mask)
    assert any(leaves) and not all(leaves)
    # all True leaves are 2-D kernels
    flat_p = jax.tree_util.tree_leaves_with_path(params)
    flat_m = jax.tree_util.tree_leaves_with_path(mask)
    for (pp, p), (mp, m) in zip(flat_p, flat_m):
        if m:
            assert p.ndim == 2


@pytest.mark.parametrize("opt_name", ["adam_atan2", "muon", "muon_adam_atan2"])
def test_optimizers_reduce_quadratic(opt_name):
    opt = {
        "adam_atan2": lambda: adam_atan2(0.05),
        "muon": lambda: muon(0.05),
        "muon_adam_atan2": lambda: muon_adam_atan2(0.05, 0.05),
    }[opt_name]()

    params = {"w": jnp.ones((8, 4)) * 2.0}
    opt_state = opt.init(params)

    def loss(p):
        return jnp.sum(p["w"] ** 2)

    l0 = float(loss(params))
    for _ in range(60):
        g = jax.grad(loss)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
    assert float(loss(params)) < l0 * 0.6


def test_checkpoint_roundtrip(tmp_path):
    model = tiny_model()
    trainer = Trainer(model, checkpoint_dir=str(tmp_path / "ckpt"))
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, _ = trainer.train_step(state, tiny_batch(), jax.random.PRNGKey(1))
    trainer.save(state)

    template = trainer.init_state(jax.random.PRNGKey(42))
    restored = trainer.restore(template)
    assert restored is not None
    assert int(restored.step) == 1
    w0 = jax.tree.leaves(state.params)[0]
    w1 = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(w0), np.asarray(w1))


def test_checkpoint_async_save(tmp_path):
    """save(wait=False) returns before the write is durable; after the
    explicit join the checkpoint restores bit-identically even if the live
    state was mutated (donated) in the meantime."""
    model = tiny_model()
    trainer = Trainer(model, checkpoint_dir=str(tmp_path / "ckpt"))
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, _ = trainer.train_step(state, tiny_batch(), jax.random.PRNGKey(1))
    w_saved = np.asarray(jax.tree.leaves(state.params)[0]).copy()

    trainer.save(state, wait=False)
    # mutate the live state while the background write is (possibly) still
    # in flight — the snapshot must not see this
    state, _ = trainer.train_step(state, tiny_batch(), jax.random.PRNGKey(2))
    trainer.wait_until_finished()

    template = trainer.init_state(jax.random.PRNGKey(42))
    restored = trainer.restore(template)
    assert restored is not None
    assert int(restored.step) == 1
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.params)[0]), w_saved
    )


@pytest.mark.slow  # >30s on the 1-core CI host (VERDICT r4 #3 tiering)
def test_mesh_sharded_train_step():
    """DP x FSDP x TP on the 8-device CPU mesh — full train step."""
    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    model = tiny_model()
    trainer = Trainer(model, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))

    # param shardings actually split over tensor axis
    specs = jax.tree_util.tree_map_with_path(
        lambda path, p: p.sharding.spec, state.params
    )
    spec_strs = {str(s) for s in jax.tree.leaves(specs, is_leaf=lambda x: hasattr(x, "index") or True)}

    state, metrics = trainer.train_step(state, tiny_batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    state, metrics = trainer.train_step(state, tiny_batch(), jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))


def test_mesh_sharded_checkpoint_resume(tmp_path):
    """Save mid-training on a dp x tp mesh, restore, continue — the resumed
    run must produce the same loss as the uninterrupted one."""
    mesh = make_mesh(data=2, tensor=2)
    model = tiny_model()
    batch = tiny_batch()

    def run(steps, trainer, state):
        metrics = None
        for i in range(steps):
            state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(i))
        return state, metrics

    t1 = Trainer(model, mesh=mesh, checkpoint_dir=str(tmp_path / "ck"))
    s1 = t1.init_state(jax.random.PRNGKey(0))
    s1, _ = run(2, t1, s1)
    t1.save(s1)

    # uninterrupted: one more step
    _, want = run(1, t1, s1)

    # resume in a fresh trainer from the checkpoint
    t2 = Trainer(model, mesh=mesh, checkpoint_dir=str(tmp_path / "ck"))
    template = t2.init_state(jax.random.PRNGKey(7))  # different init
    s2 = t2.restore(template)
    assert s2 is not None and int(s2.step) == 2
    _, got = run(1, t2, s2)

    np.testing.assert_allclose(
        float(got["loss"]), float(want["loss"]), rtol=1e-5
    )


def test_mesh_restore_reapplies_shardings(tmp_path):
    """restore() must hand back MESH-SHARDED params/moments/EMA, not host
    arrays (r2 review: a replicated restore OOMs topologies where params
    only fit sharded)."""
    from transfusion_tpu.parallel.mesh import shard_params

    mesh = make_mesh(data=2, tensor=2)
    model = tiny_model()
    t1 = Trainer(model, mesh=mesh, checkpoint_dir=str(tmp_path / "ck"))
    s1 = t1.init_state(jax.random.PRNGKey(0))
    s1, _ = t1.train_step(s1, tiny_batch(), jax.random.PRNGKey(1))
    t1.save(s1)

    t2 = Trainer(model, mesh=mesh, checkpoint_dir=str(tmp_path / "ck"))
    s2 = t2.restore(t2.init_state(jax.random.PRNGKey(7)))
    want = shard_params(s2.params, mesh)

    def leaf_shardings(tree):
        return [
            getattr(x, "sharding", None) for x in jax.tree.leaves(tree)
        ]

    for got, exp in zip(leaf_shardings(s2.params), jax.tree.leaves(want)):
        assert got is not None and got.is_equivalent_to(exp, exp.mesh.size), (
            got, exp,
        )
    # adam moments and the EMA copy are param-shaped: sharded the same way
    for got, exp in zip(
        leaf_shardings(s2.ema.params), jax.tree.leaves(want)
    ):
        assert got is not None and got.is_equivalent_to(exp, exp.mesh.size)


def test_dcn_device_ordering_multi_process():
    """Multi-host hook: make_mesh must lay out an injected multi-process
    device list host-contiguous — inner (model-parallel) axes stay within
    one host's block (ICI) and only the outer 'data' axis crosses hosts
    (DCN). Uses fake device objects so it runs without real multi-host
    hardware."""
    import dataclasses

    from transfusion_tpu.parallel.mesh import order_devices_for_dcn

    @dataclasses.dataclass(frozen=True)
    class FakeDev:
        process_index: int
        id: int

    # 2 hosts x 4 local devices, deliberately interleaved/shuffled
    devs = [FakeDev(p, i) for i in range(4) for p in range(2)]

    ordered = order_devices_for_dcn(devs, 8)
    assert [d.process_index for d in ordered] == [0] * 4 + [1] * 4
    assert [d.id for d in ordered[:4]] == [0, 1, 2, 3]

    # C-order reshape (data=2, fsdp=1, tensor=4, ...): each data slice is
    # exactly one host -> tensor collectives never cross DCN
    arr = np.asarray(ordered, dtype=object).reshape(2, 1, 4, 1, 1)
    for d_idx in range(2):
        procs = {dev.process_index for dev in arr[d_idx].flat}
        assert len(procs) == 1, procs


def test_initialize_distributed_single_process():
    """The wrapper is a safe no-op entry point on a single process: it
    reports (0, 1) without needing a coordinator (idempotent; callable
    unconditionally from wrapper scripts)."""
    from transfusion_tpu.parallel.mesh import initialize_distributed

    try:
        idx, cnt = initialize_distributed(
            coordinator_address="localhost:12355",
            num_processes=1,
            process_id=0,
        )
    except (RuntimeError, ValueError) as e:
        # some jax builds refuse re-init after backends are live — the
        # wrapper must surface a clear error rather than hang
        assert "initialize" in str(e).lower() or "distributed" in str(e).lower()
        return
    assert (idx, cnt) == (0, 1)


def test_train_steps_scan_matches_per_step_loop():
    """Device-side scanned training (Trainer.train_steps) == the same
    per-step loop with the same key-split sequence and batch cycling."""
    model = tiny_model()

    # two DIFFERENT-data batches with one packed structure (train_steps
    # stacks them into a single device array)
    def raw(seed):
        rng = np.random.default_rng(seed)
        return [
            [
                rng.integers(0, 8, 7).astype(np.int32),
                (0, rng.standard_normal((3, 16)).astype(np.float32)),
            ]
            for _ in range(2)
        ]

    batch_a = model.pack(raw(4), shift_friendly=True)
    batch_b = model.pack(raw(5), shift_friendly=True,
                         pad_len=batch_a.text.shape[1])

    t1 = Trainer(model)
    s_scan = t1.init_state(jax.random.PRNGKey(0))
    s_scan, m_scan = t1.train_steps(
        s_scan, [batch_a, batch_b], jax.random.PRNGKey(9), steps=4
    )

    t2 = Trainer(model)
    s_loop = t2.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(9)
    batches = [batch_a, batch_b]
    for i in range(4):
        key, k = jax.random.split(key)
        s_loop, m_loop = t2.train_step(s_loop, batches[i % 2], k)

    np.testing.assert_allclose(
        float(m_scan["loss"]), float(m_loop["loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(s_scan.params), jax.tree.leaves(s_loop.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_train_steps_accepts_raw_ragged_batch():
    """train_steps on a RAW ragged batch (the list-of-samples form
    train_step and the dataloader produce) packs it once and matches the
    equivalent per-step loop — it must not misread the sample list as a
    list of packed batches (r3 regression)."""
    model = tiny_model()
    rng = np.random.default_rng(11)
    raw = [
        [
            rng.integers(0, 8, 7).astype(np.int32),
            (0, rng.standard_normal((3, 16)).astype(np.float32)),
        ]
        for _ in range(2)
    ]

    t1 = Trainer(model)
    s_scan = t1.init_state(jax.random.PRNGKey(0))
    s_scan, m_scan = t1.train_steps(
        s_scan, raw, jax.random.PRNGKey(9), steps=3
    )

    t2 = Trainer(model)
    s_loop = t2.init_state(jax.random.PRNGKey(0))
    packed = model.pack(raw, shift_friendly=True)
    key = jax.random.PRNGKey(9)
    for _ in range(3):
        key, k = jax.random.split(key)
        s_loop, m_loop = t2.train_step(s_loop, packed, k)

    np.testing.assert_allclose(
        float(m_scan["loss"]), float(m_loop["loss"]), rtol=1e-5
    )

"""Fused clip+Adam+EMA update (training/fused_update.py) vs the optax chain.

The fused path claims BIT-IDENTICAL trajectories to
optax.chain(clip_by_global_norm, adam) + ema_update; these tests assert it
with array_equal (which only collapses -0.0/+0.0) at both the pure-function
level (synthetic trees, clip triggering on some steps) and through the real
Trainer step on the real model (both EMA warmup/cycle boundaries crossed).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from transfusion_tpu.models.transfusion import Transfusion
from transfusion_tpu.training.ema import EmaState, ema_update, init_ema
from transfusion_tpu.training.fused_update import (
    find_adam_state,
    fused_clip_adam_ema,
)
from transfusion_tpu.training.trainer import Trainer


def _tree_equal(a, b):
    leaves = jax.tree.map(
        lambda x, y: bool(jnp.array_equal(x, y)), a, b
    )
    return all(jax.tree.leaves(leaves))


def synthetic_params(key):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "dense": {"kernel": jax.random.normal(k1, (8, 16)),
                  "bias": jax.random.normal(k2, (16,))},
        "emb": jax.random.normal(k3, (32, 8)),
    }


@pytest.mark.parametrize("clip", [0.5, None])
def test_fused_matches_optax_trajectory_bitwise(clip):
    lr, beta = 3e-4, 0.9
    after, every = 3, 2  # cross warmup and cycle boundaries in 10 steps
    tx = optax.adam(lr)
    if clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)

    params = synthetic_params(jax.random.PRNGKey(0))
    opt = tx.init(params)
    ema = init_ema(params)
    f_params, f_opt, f_ema = params, opt, ema

    # jit both sides: that is how the train step always runs them, and it is
    # the level at which the bit-identical claim holds — eager execution can
    # differ by 1 ulp in `1 - decay**count` because optax's bias_correction
    # is internally jitted (different pow lowering than eager ops)
    @jax.jit
    def ref_step(params, opt, ema, grads):
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        ema = ema_update(
            ema, params, beta=beta, update_every=every,
            update_after_step=after,
        )
        return params, opt, ema

    @jax.jit
    def fus_step(params, opt, ema, grads):
        return fused_clip_adam_ema(
            grads, params, opt, ema,
            learning_rate=lr, grad_clip_norm=clip,
            ema_beta=beta, ema_update_every=every,
            ema_update_after_step=after,
        )

    key = jax.random.PRNGKey(1)
    for step in range(10):
        key, k = jax.random.split(key)
        # alternate small/huge grads so the clip branch triggers on some
        # steps and not others
        scale = 100.0 if step % 3 == 0 else 0.01
        grads = jax.tree.map(
            lambda p: scale * jax.random.normal(
                jax.random.fold_in(k, hash(p.shape) % 997), p.shape
            ),
            params,
        )

        params, opt, ema = ref_step(params, opt, ema, grads)
        f_params, f_opt, f_ema, aux = fus_step(f_params, f_opt, f_ema, grads)

        assert _tree_equal(params, f_params), f"params diverged at step {step}"
        assert _tree_equal(ema.params, f_ema.params), f"ema step {step}"
        ref_adam = find_adam_state(opt)
        fus_adam = find_adam_state(f_opt)
        assert int(ref_adam.count) == int(fus_adam.count)
        assert _tree_equal(ref_adam.mu, fus_adam.mu), f"mu step {step}"
        assert _tree_equal(ref_adam.nu, fus_adam.nu), f"nu step {step}"
        assert bool(
            jnp.array_equal(
                aux.grad_norm, jax.jit(optax.global_norm)(grads)
            )
        )


def tiny_model():
    return Transfusion(
        num_text_tokens=8,
        dim_latent=16,
        modality_default_shape=(4,),
        transformer=dict(dim=32, depth=2, dim_head=8, heads=4),
        pad_multiple=16,
    )


def tiny_batch():
    rng = np.random.default_rng(0)
    return [
        [rng.integers(0, 8, 6).astype(np.int32),
         rng.standard_normal((4, 16)).astype(np.float32)],
        [rng.integers(0, 8, 3).astype(np.int32),
         rng.standard_normal((2, 16)).astype(np.float32),
         rng.integers(0, 8, 2).astype(np.int32)],
    ]


def test_trainer_fused_step_bitwise_vs_reference_path():
    model = tiny_model()
    kw = dict(
        learning_rate=1e-3, grad_clip_norm=0.5,
        ema_update_after_step=2, ema_update_every=2,
    )
    tr_ref = Trainer(model, fused_update=False, **kw)
    tr_fus = Trainer(model, fused_update=True, **kw)
    assert Trainer(model, **kw).fused_update  # auto-on for default optimizer

    s_ref = tr_ref.init_state(jax.random.PRNGKey(0))
    s_fus = tr_fus.init_state(jax.random.PRNGKey(0))
    packed = model.pack(tiny_batch(), shift_friendly=True)

    for i in range(6):
        key = jax.random.PRNGKey(100 + i)
        s_ref, m_ref = tr_ref.train_step(s_ref, packed, key)
        s_fus, m_fus = tr_fus.train_step(s_fus, packed, key)
        assert float(m_ref["loss"]) == float(m_fus["loss"]), f"step {i}"
        assert float(m_ref["grad_norm"]) == float(m_fus["grad_norm"])
        assert _tree_equal(s_ref.params, s_fus.params), f"params step {i}"
        assert _tree_equal(s_ref.ema.params, s_fus.ema.params), f"ema {i}"
        assert int(s_ref.ema.step) == int(s_fus.ema.step)
        a_ref = find_adam_state(s_ref.opt_state)
        a_fus = find_adam_state(s_fus.opt_state)
        assert _tree_equal(a_ref.mu, a_fus.mu)
        assert _tree_equal(a_ref.nu, a_fus.nu)


def test_fused_auto_gates():
    model = tiny_model()
    # custom optimizer -> auto off
    tr = Trainer(model, optimizer=optax.sgd(1e-3))
    assert not tr.fused_update
    # schedule lr -> auto off (fused math assumes a scalar lr)
    tr = Trainer(model, learning_rate=optax.constant_schedule(1e-3))
    assert not tr.fused_update


def test_find_adam_state_rejects_foreign_chains():
    params = {"w": jnp.ones(3)}
    sgd_state = optax.sgd(1e-3).init(params)
    with pytest.raises(ValueError, match="exactly one ScaleByAdamState"):
        find_adam_state(sgd_state)

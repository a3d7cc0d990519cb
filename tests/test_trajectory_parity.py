"""Optimizer-TRAJECTORY parity vs the torch twin (VERDICT r3 #3).

`test_torch_parity.py` proves single-forward parity; this file proves the
training *trajectory* matches: identical weights + data, N optimizer steps
on both frameworks — optax.adam + clip_by_global_norm (the Trainer's exact
chain, trainer.py:70-72) vs torch.optim.Adam + clip_grad_norm_ (the
reference loop, reference train_mnist.py:107-135) — asserting per-step
losses agree to fp tolerance. This is the one place optimizer/EMA
semantics could silently diverge from the reference's training behavior:
Adam bias correction, eps placement, global-norm clipping, EMA
warmup/cycle gating, and the velocity-consistency leg are all exercised.

The joint test drives the REAL `Trainer.train_step` on the jax side and
replicates its rng derivation on the host (the noise/time draws are
deterministic functions of the per-step key, _loss_impl:870-896), so the
torch twin sees byte-identical noised inputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from transfusion_tpu.models.transfusion import Transfusion  # noqa: E402
from transfusion_tpu.ops.flow import noise_data  # noqa: E402
from transfusion_tpu.training.trainer import Trainer  # noqa: E402

from test_torch_parity import (  # noqa: E402
    DIM,
    VOCAB_TEXT,
    torch_forward,
    torch_joint_forward,
)

LR = 1e-3
CLIP = 0.5
CURVE_STEPS = 300  # loss-CURVE parity length (VERDICT r4 #1)


def _build(prob_uncond=0.0):
    model = Transfusion(
        num_text_tokens=VOCAB_TEXT,
        dim_latent=8,
        modality_default_shape=(2,),
        transformer=dict(dim=DIM, depth=2, dim_head=8, heads=4),
        pad_multiple=16,
        prob_uncond=prob_uncond,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(42)

    def jitter(path, p):
        nonlocal key
        key, k = jax.random.split(key)
        return p + jax.random.normal(k, p.shape) * 0.02

    params = jax.tree_util.tree_map_with_path(jitter, params)
    return model, params


def _to_torch_tree(params):
    """Flax param tree -> nested dict of live torch Parameters."""

    def rec(x):
        if hasattr(x, "items"):
            return {k: rec(v) for k, v in x.items()}
        return torch.nn.Parameter(
            torch.tensor(np.asarray(x), dtype=torch.float32)
        )

    return rec(params)


def _leaves(tree):
    out = []

    def rec(x):
        if hasattr(x, "items"):
            for v in x.values():
                rec(v)
        else:
            out.append(x)

    rec(tree)
    return out


def _live_t(x):
    if torch.is_tensor(x):
        return x
    return torch.tensor(np.asarray(x), dtype=torch.float32)


def run_text_trajectory(n_steps: int):
    """Run the text-only twin trajectory: the REAL Trainer.train_step vs
    torch Adam + clip_grad_norm_ on identical weights/data. Returns
    (losses_jax, losses_torch) as float lists — shared by the parity test
    below and by scripts/record_traj_curves.py (which commits the curves
    as results/curves_trajectory_text.jsonl)."""
    model, params = _build()
    rng = np.random.default_rng(0)
    batch = [
        rng.integers(0, VOCAB_TEXT, 11).astype(np.int32),
        rng.integers(0, VOCAB_TEXT, 7).astype(np.int32),
    ]
    packed = model.pack(
        model.encode_modalities([[s] for s in batch]), shift_friendly=True
    )

    trainer = Trainer(model, learning_rate=LR, grad_clip_norm=CLIP)
    from transfusion_tpu.training.ema import init_ema

    state = trainer.init_state(jax.random.PRNGKey(0))
    state = state.replace(
        params=params, opt_state=trainer.tx.init(params), ema=init_ema(params)
    )

    # ---- torch twin setup ----
    tparams = _to_torch_tree(params)
    # fourier frequencies are a frozen buffer (ref keeps them untrainable;
    # transformer.py stop_gradients them) — mirror that
    tparams["params"]["transformer"]["fourier_weights"].requires_grad_(False)
    opt = torch.optim.Adam(
        [p for p in _leaves(tparams) if p.requires_grad], lr=LR
    )

    text = np.asarray(packed.text)
    text_in = np.where(text[:, :-1] < 0, 0, text[:, :-1]).astype(np.int64)
    labels = text[:, 1:]
    valid = (labels != -1) & (labels != model.null_text_id)
    total_tokens = float(np.asarray(packed.total_tokens))

    losses_j, losses_t = [], []
    for i in range(n_steps):
        state, metrics = trainer.train_step(
            state, packed, jax.random.PRNGKey(100 + i)
        )
        losses_j.append(float(metrics["loss"]))

        logits = torch_forward(
            {"params": tparams["params"]}, text_in, t=_live_t
        )
        logp = torch.log_softmax(logits, dim=-1)
        safe = torch.tensor(np.where(valid, labels, 0).astype(np.int64))
        lab_logp = torch.gather(logp, -1, safe[..., None])[..., 0]
        vmask = torch.tensor(valid)
        kept = vmask.sum()
        ce = -(lab_logp * vmask).sum() / kept.clamp(min=1)
        loss_t = ce * (kept.float() / total_tokens)
        losses_t.append(float(loss_t.detach()))

        opt.zero_grad()
        loss_t.backward()
        torch.nn.utils.clip_grad_norm_(
            [p for p in _leaves(tparams) if p.requires_grad], CLIP
        )
        opt.step()
    return losses_j, losses_t


def test_text_loss_curve_parity():
    """CURVE_STEPS Adam steps on the text-only joint loss: the whole loss
    CURVE matches the torch twin (VERDICT r4 #1 — 6-step granularity can
    hide lr-schedule/EMA-warmup/accumulation drift; 300 steps of compounding
    Adam+clip cannot). Measured divergence is ~1e-5 peak over the full run
    (scripts/record_traj_curves.py artifact, results/curves_trajectory_
    text.jsonl); the bound below gives ~20x headroom."""
    losses_j, losses_t = run_text_trajectory(CURVE_STEPS)
    lj, lt = np.asarray(losses_j), np.asarray(losses_t)
    # explicit checkpoints (the VERDICT contract), then the full curve
    for s in (50, 100, CURVE_STEPS):
        assert abs(lj[s - 1] - lt[s - 1]) < 2e-4, (
            f"step {s}: jax {lj[s-1]:.6f} vs torch {lt[s-1]:.6f}"
        )
    np.testing.assert_allclose(lj, lt, rtol=0, atol=2e-4)
    # the trajectory must actually CONVERGE (guard against a frozen
    # optimizer making the comparison vacuous): >90% loss reduction
    assert lj[-1] < 0.1 * lj[0]


def run_joint_trajectory(n_steps: int):
    """Joint loss (text CE + flow MSE + velocity-EMA leg) twin trajectory
    through the real Trainer — returns (losses_jax, losses_torch). Shared
    by the slow-tier parity test and scripts/record_traj_curves.py."""
    model, params = _build()
    rng = np.random.default_rng(1)
    batch = [
        [
            rng.integers(0, VOCAB_TEXT, 5).astype(np.int32),
            rng.standard_normal((3, 8)).astype(np.float32),
            rng.integers(0, VOCAB_TEXT, 2).astype(np.int32),
        ]
    ]
    packed = model.pack(model.encode_modalities(batch), shift_friendly=True)
    (g,) = packed.groups
    delta = 1e-2  # larger than the 1e-3 default so the leg is visible
    ema_beta, ema_every, ema_after = 0.9, 1, 0

    trainer = Trainer(
        model,
        learning_rate=LR,
        grad_clip_norm=CLIP,
        velocity_consistency=True,
        velocity_consistency_delta_time=delta,
        ema_beta=ema_beta,
        ema_update_every=ema_every,
        ema_update_after_step=ema_after,
    )
    from transfusion_tpu.training.ema import init_ema

    state = trainer.init_state(jax.random.PRNGKey(0))
    state = state.replace(
        params=params, opt_state=trainer.tx.init(params), ema=init_ema(params)
    )

    tparams = _to_torch_tree(params)
    tparams["params"]["transformer"]["fourier_weights"].requires_grad_(False)
    trainable = [p for p in _leaves(tparams) if p.requires_grad]
    opt = torch.optim.Adam(trainable, lr=LR)
    ema_t = {
        k: v.detach().clone() for k, v in _flat(tparams).items()
    }

    text = np.asarray(packed.text)
    labels = text[:, 1:]
    from transfusion_tpu.ops.spans import (
        spans_to_is_any_modality,
        spans_to_modality_mask,
    )

    n = labels.shape[1]
    is_mod = np.asarray(spans_to_is_any_modality(n, packed.spans))
    valid = (labels != -1) & (labels != model.null_text_id) & ~is_mod
    total_tokens = float(np.asarray(packed.total_tokens))
    mod_mask = np.asarray(spans_to_modality_mask(n, packed.spans, 1))
    frac0 = mod_mask.any(axis=2).sum() / total_tokens

    latents = np.asarray(g.latents)
    m = packed.spans.shape[1]
    num_mods = (np.asarray(packed.spans)[..., 2] > 0).sum(-1)

    losses_j, losses_t = [], []
    for i in range(n_steps):
        step_key = jax.random.PRNGKey(100 + i)
        state, metrics = trainer.train_step(state, packed, step_key)
        losses_j.append(float(metrics["loss"]))

        # --- replicate _loss_impl's rng derivation (:870-896, :950-960) ---
        from transfusion_tpu.models.transfusion import default_modality_times

        rng_times, rng_cfg, rng_noise, rng_noise_ema = jax.random.split(
            step_key, 4
        )
        times = np.asarray(
            default_modality_times(rng_times, jnp.asarray(num_mods), m)
        )
        orig_times = times
        times = times * (1.0 - delta)  # velocity leg shrinks train times
        noise = np.asarray(
            jax.random.normal(jax.random.split(rng_noise, 1)[0], latents.shape)
        )
        t_inst = times[np.asarray(g.batch_idx), np.asarray(g.span_rows)]
        noised, flow = noise_data(
            jnp.asarray(latents), jnp.asarray(noise), jnp.asarray(t_inst)
        )
        noised, flow = np.asarray(noised), np.asarray(flow)
        ts = float(t_inst[0])

        packed_in = packed.replace(text=packed.text[:, :-1])
        logits, pred_flow = torch_joint_forward(
            model, {"params": tparams["params"]}, packed_in, noised, ts,
            t=_live_t,
        )

        # EMA velocity target at orig_times + delta with its own noise
        ema_noise = np.asarray(
            jax.random.normal(
                jax.random.split(rng_noise_ema, 1)[0], latents.shape
            )
        )
        t_ema = (orig_times + delta)[
            np.asarray(g.batch_idx), np.asarray(g.span_rows)
        ]
        noised_e, _ = noise_data(
            jnp.asarray(latents), jnp.asarray(ema_noise), jnp.asarray(t_ema)
        )
        with torch.no_grad():
            ema_tree = _unflat(ema_t)
            _, ema_flow = torch_joint_forward(
                model, {"params": ema_tree["params"]}, packed_in,
                np.asarray(noised_e), float(t_ema[0]), t=_live_t,
            )

        # --- loss (single modality type, single group: _loss_impl) ---
        logp = torch.log_softmax(logits, dim=-1)
        safe = torch.tensor(np.where(valid, labels, 0).astype(np.int64))
        lab_logp = torch.gather(logp, -1, safe[..., None])[..., 0]
        vmask = torch.tensor(valid)
        kept = vmask.sum()
        ce = -(lab_logp * vmask).sum() / kept.clamp(min=1)
        text_term = ce * (kept.float() / total_tokens)

        flow_t = torch.tensor(flow.reshape(pred_flow.shape))
        denom = float(np.prod(pred_flow.shape))
        flow_term = ((pred_flow - flow_t) ** 2).sum() / denom * frac0
        vel_term = (
            ((pred_flow - ema_flow) ** 2).sum()
            / denom
            * frac0
            * model.velocity_consistency_loss_weight
        )
        loss_t = text_term + flow_term + vel_term
        losses_t.append(float(loss_t.detach()))

        opt.zero_grad()
        loss_t.backward()
        torch.nn.utils.clip_grad_norm_(trainable, CLIP)
        opt.step()

        # EMA update (training/ema.py semantics: copy until step >
        # after_step, then blend every update_every)
        step = i + 1
        flat_now = _flat(tparams)
        if step > ema_after:
            if step % ema_every == 0:
                for k in ema_t:
                    ema_t[k] = (
                        ema_t[k] * ema_beta
                        + flat_now[k].detach() * (1 - ema_beta)
                    )
        else:
            ema_t = {k: v.detach().clone() for k, v in flat_now.items()}
    return losses_j, losses_t


@pytest.mark.slow
def test_joint_trajectory_parity_with_velocity_ema():
    """Joint-loss trajectory (text CE + flow MSE + velocity leg) with EMA
    updates on both sides, through the real Trainer — the full curve
    matches the torch twin. Exercises Adam bias correction, eps placement,
    global-norm clipping, EMA warmup/cycle gating, and the velocity leg
    over enough steps for drift to compound."""
    losses_j, losses_t = run_joint_trajectory(60)
    lj, lt = np.asarray(losses_j), np.asarray(losses_t)
    for s in (10, 30, 60):
        assert abs(lj[s - 1] - lt[s - 1]) < 3e-3, (
            f"step {s}: jax {lj[s-1]:.6f} vs torch {lt[s-1]:.6f}"
        )
    np.testing.assert_allclose(lj, lt, rtol=0, atol=3e-3)
    assert lj[-1] < lj[0]


def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if hasattr(v, "items"):
            out.update(_flat(v, prefix + k + "/"))
        else:
            out[prefix + k] = v
    return out


def _unflat(flat):
    tree = {}
    for k, v in flat.items():
        parts = k.split("/")
        cur = tree
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return tree

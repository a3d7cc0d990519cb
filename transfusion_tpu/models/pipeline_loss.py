"""Joint Transfusion loss through the 1F1B pipeline schedule.

The GPipe path (Trainer(pipeline_microbatches=N)) pipelines only the
transformer trunk and differentiates through the whole schedule, so its
activation memory grows with the microbatch count. The 1F1B engine
(parallel/pipeline_1f1b.py) instead computes the loss and ALL gradients
inside the schedule with O(pipe) live microbatches — but that requires the
loss to be expressed per microbatch. This module builds that per-microbatch
"head": final RMSNorm + text cross-entropy + per-modality flow /
velocity-consistency / reconstruction losses, restructured so that summing
the head over microbatches reproduces `Transfusion._loss_impl`
(models/transfusion.py) exactly:

  * every mean is rewritten as sum * (1/global_denominator), with the
    denominators (kept text tokens, per-type flow element counts and
    instance counts, token fractions) computed once from the packed batch —
    none of them depend on the trunk output;
  * each modality-group instance belongs to exactly one microbatch (the
    split is contiguous batch slices), so the head gathers the group's rows
    from its microbatch's trunk output and masks out instances owned by
    other microbatches — each instance is counted exactly once across the
    schedule;
  * gradient paths that the reference routes through the out-projections
    (x-prediction -> flow conversion uses the *noised model-space rows*,
    which depend on latent_to_model) are kept differentiable by recomputing
    those rows inside the head from the noised latents, with the projection
    params in `head_params` — the outer `jax.value_and_grad` then sums the
    head's contribution with the embed-in path's automatically, because
    both views alias the same param leaves.

The reference (lucidrains/transfusion-pytorch) has no pipeline parallelism
at all (SURVEY.md §2.5); its loss lives at transfusion.py:2840-2949.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from transfusion_tpu.ops.flow import model_output_to_flow, noise_data
from transfusion_tpu.ops.norms import l2norm
from transfusion_tpu.ops.spans import (
    spans_to_is_any_modality,
    spans_to_modality_mask,
)
from transfusion_tpu.parallel.pipeline import (
    prepare_trunk_inputs,
    stack_block_params,
)
from transfusion_tpu.parallel.pipeline_1f1b import make_1f1b_loss


def _ce_sum(W, embed, labels, valid, chunk, dtype):
    """Sum of -log p(label) over valid positions, in sequence chunks
    (mirrors Transfusion._chunked_ce; chunk=None computes one chunk)."""
    b, n, d = embed.shape
    C = chunk if chunk is not None else n
    pad = (-n) % C
    if pad:
        embed = jnp.pad(embed, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    nc = (n + pad) // C

    emb_c = embed.reshape(b, nc, C, d).transpose(1, 0, 2, 3)
    lab_c = labels.reshape(b, nc, C).transpose(1, 0, 2)
    val_c = valid.reshape(b, nc, C).transpose(1, 0, 2)

    def step(acc, args):
        e, lab, va = args
        lg = (e.astype(dtype) @ W.astype(dtype)).astype(jnp.float32)
        lse = jax.nn.logsumexp(lg, axis=-1)
        ll = jnp.take_along_axis(lg, lab[..., None], axis=-1)[..., 0]
        return acc + (-(ll - lse) * va).sum(), None

    ce, _ = jax.lax.scan(step, jnp.zeros(()), (emb_c, lab_c, val_c))
    return ce


def _head_param_tree(params):
    """The param subtree the loss head touches: text-logit projection and
    the per-modality latent<->model projections (+ final-norm gamma,
    returned separately — it lives under the transformer subtree)."""
    p = params["params"]
    core = {
        k: v
        for k, v in p.items()
        if k == "to_text_logits"
        or k.startswith("latent_to_model_")
        or k.startswith("model_to_latent_")
    }
    return (
        {"core": {"params": core},
         "gamma": p["transformer"]["final_norm"]["gamma"]}
    )


def joint_loss_1f1b(
    model,  # Transfusion (config + core module)
    params,
    packed,  # original PackedBatch (pre-shift, pre-CFG-dropout text)
    packed_in,  # shifted + CFG-dropped input batch (text length n)
    labels,  # Int[b, n] — next-token labels (post-CFG-dropout text)
    times,  # Float[b, m] — (velocity-scaled) modality times
    orig_times,  # Float[b, m] — pre-velocity-scaling times (EMA pass)
    noise_keys,  # per-group noise PRNG keys
    rng_noise_ema,
    ema_params,  # None | params (velocity-consistency EMA model)
    velocity_delta: float,
    mesh,
    microbatches: int,
):
    """`_loss_impl`-equivalent joint loss computed through the 1F1B
    schedule. Returns (total, LossBreakdown); gradients of the trunk flow
    through the schedule (in-schedule backward), everything else through
    the outer autodiff via the custom_vjp boundary."""
    from transfusion_tpu.models.transfusion import LossBreakdown
    from transfusion_tpu.models.transformer import Transformer

    T = model.num_modalities
    b, n = packed_in.text.shape
    assert b % microbatches == 0, (
        f"batch {b} % pipeline_microbatches {microbatches} != 0"
    )
    mb = b // microbatches
    total_tokens = packed.total_tokens.astype(jnp.float32)
    has_velocity = ema_params is not None

    # ---- noise the groups (mirrors _joint_core, transfusion.py) ----------
    noised_groups, noises, flows = [], [], []
    for gi, g in enumerate(packed_in.groups):
        noise = jax.random.normal(noise_keys[gi], g.latents.shape)
        t_inst = times[g.batch_idx, g.span_rows]
        noised, flow = noise_data(g.latents, noise, t_inst)
        noised_groups.append(g.replace(latents=noised))
        noises.append(noise)
        flows.append(flow)
    packed_n = packed_in.replace(groups=tuple(noised_groups))

    # ---- embed-in + replicated trunk inputs (outside the schedule) -------
    x, rotary_pos, _group_rows = model.core.apply(
        params, packed_n, method="joint_embed_in"
    )
    t_module = Transformer(
        dim=model.dim, dtype=model.dtype, **model.transformer_cfg
    )
    assert t_module.unet_skips is False, "1F1B requires unet_skips=False"
    assert t_module.num_residual_streams == 1
    assert t_module.dropout == 0.0
    prep = prepare_trunk_inputs(
        params["params"]["transformer"], t_module, x,
        times_inst=times, spans=packed_n.spans, rotary_pos=rotary_pos,
    )
    stacked = stack_block_params(
        params["params"]["transformer"], t_module.depth
    )

    # ---- loss constants (no trunk dependency; _loss_impl parity) ---------
    is_any_mod = spans_to_is_any_modality(n, packed.spans)
    valid = (
        (labels != model.ignore_index)
        & (labels != model.null_text_id)
        & ~is_any_mod
    )
    kept = valid.sum().astype(jnp.float32)
    safe_labels = jnp.where(valid, labels, 0)
    text_frac = kept / total_tokens

    mod_mask = spans_to_modality_mask(n, packed.spans, T)
    type_token_counts = mod_mask.any(axis=2).sum(axis=(0, 2))
    fracs = type_token_counts.astype(jnp.float32) / total_tokens

    elem_counts = [0] * T  # per-type flow element counts (static)
    inst_counts = [0] * T  # per-type instance counts (static)
    for g, fl in zip(packed.groups, flows):
        elem_counts[g.modality_type] += int(np.prod(fl.shape))
        inst_counts[g.modality_type] += int(g.latents.shape[0])
    denoms_arr = jnp.asarray(
        [float(max(c, 1)) for c in elem_counts], jnp.float32
    )
    counts_arr = jnp.asarray(
        [max(c, 1) for c in inst_counts], jnp.float32
    )

    # ---- velocity-consistency EMA targets (forward-only GPipe trunk) -----
    ema_flows = None
    if has_velocity:
        ema_keys = jax.random.split(
            rng_noise_ema, max(len(packed.groups), 1)
        )
        # EMA velocity target conditions on the REAL (pre-CFG-dropout)
        # text — reference transfusion.py:2334-2337
        packed_ema = packed.replace(text=packed.text[:, :-1])
        _, _, ema_flows, _, _, _ = model._joint_core(
            ema_params,
            packed_ema,
            orig_times + velocity_delta,
            ema_keys,
            deterministic=True,
            return_logits=False,
            pipeline=(mesh, microbatches),
        )
        ema_flows = jax.lax.stop_gradient(ema_flows)

    # ---- per-microbatch head ---------------------------------------------
    head_params = _head_param_tree(params)
    group_data = []
    for gi, g in enumerate(packed.groups):
        gd = {
            "noised": noised_groups[gi].latents,
            "flow": flows[gi],
            "batch_idx": g.batch_idx,
            "offsets": g.offsets,
            "t_inst": times[g.batch_idx, g.span_rows],
        }
        if has_velocity:
            gd["ema"] = ema_flows[gi]
        if model.has_recon_loss:
            gd["noise"] = noises[gi]
        group_data.append(gd)
    head_data = {
        "labels": safe_labels,
        "valid": valid.astype(jnp.float32),
        "ce_scale": model.text_loss_weight * text_frac
        / jnp.maximum(kept, 1.0),
        "flow_scale": model.flow_loss_weight * fracs / denoms_arr,
        "groups": group_data,
    }
    if has_velocity:
        head_data["vel_scale"] = (
            model.velocity_consistency_loss_weight * fracs / denoms_arr
        )
    if model.has_recon_loss:
        head_data["recon_scale"] = (
            model.reconstruction_loss_weight * fracs / counts_arr
        )

    groups_static = [
        (gi, g.modality_type, g.seq_len, g.seq_shape)
        for gi, g in enumerate(packed.groups)
    ]
    core = model.core
    dim, dtype, eps = model.dim, model.dtype, model.eps
    out_clean = model.core.model_output_clean
    ce_chunk = model.ce_chunk_size
    has_recon = model.has_recon_loss

    def head_fn(hp, hd, out_mb, f, row0):
        # final RMSNorm (transformer.py:606) then back to the trunk dtype —
        # the schedule hands the last stage's output up in f32.
        # `out_mb` holds the LOCAL rows of microbatch f (the 'data' shard);
        # `row0` is the global batch row of its first row — head_data stays
        # replicated and each device slices its own window.
        embed = (
            l2norm(out_mb) * (dim**0.5) * (hp["gamma"] + 1.0)
        ).astype(dtype)
        mb_l = out_mb.shape[0]

        labels_mb = jax.lax.dynamic_slice_in_dim(hd["labels"], row0, mb_l, 0)
        valid_mb = jax.lax.dynamic_slice_in_dim(hd["valid"], row0, mb_l, 0)
        W = hp["core"]["params"]["to_text_logits"]["kernel"]
        ce = _ce_sum(W, embed, labels_mb, valid_mb, ce_chunk, dtype)
        contrib = ce * hd["ce_scale"]

        flow_sse = jnp.zeros((T,))
        vel_sse = jnp.zeros((T,))
        recon_sum = jnp.zeros((T,))
        for gi, mtype, L, seq_shape in groups_static:
            gd = hd["groups"][gi]
            in_mb = (
                (gd["batch_idx"] >= row0) & (gd["batch_idx"] < row0 + mb_l)
            ).astype(jnp.float32)
            local = jnp.clip(gd["batch_idx"] - row0, 0, mb_l - 1)
            idx = gd["offsets"][:, None] + jnp.arange(L)[None, :]
            out_rows = embed[local[:, None], idx]  # [k, L, dim]
            if out_clean:
                rows_noised, _ = core.apply(
                    hp["core"], gd["noised"], mtype, method="latent_to_seq"
                )
                out_rows = model_output_to_flow(
                    out_rows, rows_noised, gd["t_inst"], eps
                )
            pred = core.apply(
                hp["core"], out_rows, mtype, seq_shape,
                method="seq_to_latent",
            )
            w_inst = in_mb.reshape((-1,) + (1,) * (pred.ndim - 1))
            diff = (pred - gd["flow"]).astype(jnp.float32)
            sse = jnp.sum(diff * diff * w_inst)
            flow_sse = flow_sse.at[mtype].add(sse)
            contrib = contrib + sse * hd["flow_scale"][mtype]
            if has_velocity:
                vd = (pred - gd["ema"]).astype(jnp.float32)
                vs = jnp.sum(vd * vd * w_inst)
                vel_sse = vel_sse.at[mtype].add(vs)
                contrib = contrib + vs * hd["vel_scale"][mtype]
            if has_recon:
                t_b = gd["t_inst"].reshape(
                    gd["t_inst"].shape + (1,) * (pred.ndim - 1)
                )
                recon = gd["noise"] + pred * (1.0 - t_b)
                per_inst = jnp.mean(
                    (recon - gd["noised"]) ** 2,
                    axis=tuple(range(1, recon.ndim)),
                ).astype(jnp.float32)
                rs = jnp.sum(per_inst * in_mb)
                recon_sum = recon_sum.at[mtype].add(rs)
                contrib = contrib + rs * hd["recon_scale"][mtype]

        aux = {"ce_sum": ce, "flow_sse": flow_sse}
        if has_velocity:
            aux["vel_sse"] = vel_sse
        if has_recon:
            aux["recon_sum"] = recon_sum
        return contrib, aux

    # ---- run the schedule --------------------------------------------------
    f = make_1f1b_loss(
        head_fn,
        t_module,
        mesh,
        dict(
            microbatches=microbatches,
            flash_causal=bool(prep["flash_causal"]),
            remat=t_module.remat,
            remat_policy=t_module.remat_policy,
        ),
    )
    nd_aux = dict(
        cond_index=prep["cond_index"],
        mask=prep["mask"],
        rope=prep["rope"],
        iam=prep["is_any_modality"],
        flash_spans=prep["flash_spans"],
    )
    total, aux = f(stacked, x, prep["cond"], head_params, head_data, nd_aux)

    # ---- breakdown (same normalizations as _loss_impl) --------------------
    text_loss = aux["ce_sum"] / jnp.maximum(kept, 1.0)
    flow_losses = [aux["flow_sse"][t] / denoms_arr[t] for t in range(T)]
    velocity_losses = (
        [aux["vel_sse"][t] / denoms_arr[t] for t in range(T)]
        if has_velocity
        else None
    )
    recon_losses = (
        [aux["recon_sum"][t] / counts_arr[t] for t in range(T)]
        if has_recon
        else None
    )
    return total, LossBreakdown(
        total=total,
        text=text_loss,
        flow=flow_losses,
        velocity=velocity_losses,
        recon=recon_losses,
    )

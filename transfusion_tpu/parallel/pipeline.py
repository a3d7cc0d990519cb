"""Pipeline parallelism: the transformer stack split into stages over a
'pipe' mesh axis, GPipe-style microbatch schedule via shard_map + ppermute.

The reference has no pipeline parallelism (SURVEY.md §2.5 lists PP as absent
and out of scope for the MVP); this module takes the framework beyond that:
layers are partitioned into `pipe` contiguous stages, microbatches flow
stage-to-stage over ICI with `jax.lax.ppermute`, and XLA overlaps the
point-to-point transfer of one microbatch with the compute of the next.
Backward is ordinary autodiff through the schedule (ppermute transposes to
the reverse rotation), i.e. GPipe semantics with full activation stash —
pass `remat=True` to rematerialize each block in the backward instead.

Design notes (TPU-first):
  * Stages must be homogeneous for a stacked [depth, ...] param tree that
    shards over 'pipe'. Two reference features make raw layers
    heterogeneous, handled as follows:
      - value residual (reference transfusion.py:896-900): layer 0 has no
        learned mix. `stack_block_params` injects a zero-init mix for
        layer 0 and the schedule runs every layer with a traced
        `value_residual_valid` flag — the first layer mixes its own values
        (v*mix + v*(1-mix) == v, exactly), so numerics equal the
        unpipelined stack bit-for-bit in f32.
      - U-Net skips (reference :1079-1081): skips connect stage s to stage
        P-1-s — they defeat pipelining (each would ride through every
        intermediate stage), so PP requires `unet_skips=False`, the
        standard constraint for pipelined transformers.
  * `num_residual_streams` must be 1 (the default): multi-stream
    hyper-connection state would multiply the ppermute payload.
  * The payload rotated between stages is (activations, first-layer values,
    valid flag); time-conditioning / masks / rope are cheap and replicated,
    indexed per microbatch inside each stage.
  * The schedule is the classic (M + P - 1)-tick loop; ranks compute
    garbage during fill/drain bubbles (zero gradient — outputs are only
    collected from the last rank's valid ticks). Bubble fraction
    (P-1)/(M+P-1) — pick microbatches >= 2*pipe.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from transfusion_tpu.ops.norms import l2norm
from transfusion_tpu.ops.rope import rope_angles
from transfusion_tpu.ops.spans import (
    spans_to_attn_mask,
    spans_to_instance_mask,
    spans_to_is_any_modality,
)


# ---------------------------------------------------------------------------
# stage-param stacking
# ---------------------------------------------------------------------------


def _rename_layer_tree(tree: dict, ind: int) -> dict:
    """Rename the per-layer submodule names `attn_{ind}` etc. -> `attn_0`
    so every layer's tree is structurally identical (canonical block)."""
    suffix = re.compile(rf"_{ind}$")
    return {suffix.sub("_0", k): v for k, v in tree.items()}


def stack_block_params(transformer_params: dict, depth: int):
    """Stack the per-layer block params into leaves of shape [depth, ...].

    Layer 0 lacks `to_value_residual_mix` (reference transfusion.py:896-900
    creates the mix only from layer 1); a zero-init one is injected — it is
    numerically inert because the pipeline feeds layer 0 its own values
    with `value_residual_valid=False`.

    Requires `unet_skips=False` (no `skip_proj_*` params) — asserted.
    """
    assert depth >= 2, (
        "pipeline parallelism needs depth >= 2: the canonical block always "
        "carries a value-residual mix (shaped from layer 1), which a "
        "depth-1 stack cannot provide"
    )
    layers = []
    template = None
    for i in range(depth):
        blk = dict(transformer_params[f"block_{i}"])
        assert not any(k.startswith("skip_proj") for k in blk), (
            "pipeline parallelism requires unet_skips=False (cross-stage "
            "U-Net skips cannot be pipelined)"
        )
        blk = _rename_layer_tree(blk, i)
        if i > 0 and template is None:
            template = blk
        layers.append(blk)

    # inject the missing layer-0 mix with zeros shaped like layer 1's
    if template is not None:
        mix = template.get("attn_0", {}).get("to_value_residual_mix")
        if mix is not None and "to_value_residual_mix" not in layers[0]["attn_0"]:
            layers[0] = dict(layers[0])
            layers[0]["attn_0"] = dict(layers[0]["attn_0"])
            layers[0]["attn_0"]["to_value_residual_mix"] = jax.tree.map(
                jnp.zeros_like, mix
            )

    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def unstack_block_params(stacked, transformer_params: dict, depth: int):
    """Inverse of `stack_block_params`: write stacked leaves back into a
    Transformer param tree (dropping layer 0's injected mix)."""
    out = dict(transformer_params)
    for i in range(depth):
        layer = jax.tree.map(lambda x: x[i], stacked)
        orig = transformer_params[f"block_{i}"]
        renamed = {}
        for k, v in layer.items():
            # map canonical `attn_0` back to `attn_{i}`
            base = re.sub(r"_0$", f"_{i}", k)
            renamed[base] = v
        if i == 0:
            attn_key = "attn_0"
            if "to_value_residual_mix" not in orig.get(attn_key, {}):
                renamed[attn_key] = {
                    k: v
                    for k, v in renamed[attn_key].items()
                    if k != "to_value_residual_mix"
                }
        out[f"block_{i}"] = renamed
    return out


# ---------------------------------------------------------------------------
# the GPipe engine
# ---------------------------------------------------------------------------


def _canonical_block(t, flash_causal: bool = False):
    """A layer-position-independent TransformerBlock matching Transformer's
    per-layer construction (transformer.py) with is_first=False/has_skip=False."""
    from transfusion_tpu.models.transformer import TransformerBlock

    return TransformerBlock(
        dim=t.dim,
        dim_head=t.dim_head,
        heads=t.heads,
        dropout=0.0,
        ff_expansion_factor=t.ff_expansion_factor,
        attn_softcap=t.attn_softcap,
        attn_gate_values=t.attn_gate_values,
        attn_laser=t.attn_laser,
        attn_impl=t.attn_impl if t.attn_impl in ("dense", "flash") else "dense",
        streams=1,
        fracs=t.num_residual_fracs,
        layer_index=0,
        is_first=False,
        has_skip=False,
        modality_only=False,
        flash_causal=flash_causal,
        deterministic=True,
        fuse_projections=t.fuse_projections,
        dtype=t.dtype,
        name="block_0",
    )


def pipeline_blocks(
    stacked_params,
    transformer,  # Transformer module (carries the static config)
    mesh: Mesh,
    microbatches: int,
    x,  # Float[b, n, dim]
    cond=None,  # Float[b, I|n|1, 4*dim] | None
    cond_index=None,  # Int[b, n] | None
    mask=None,  # Bool[b, 1, n, n] | None (dense path)
    rope=None,  # Float[b, n, dim_head] | None
    is_any_modality=None,  # Bool[b, n] | None
    flash_spans=None,  # Int[b, m, 3] | None (flash path)
    flash_causal: bool = False,
    remat: bool = False,
    remat_policy: str = "full",  # 'full' | 'dots' — as Transformer
):
    """Run the stacked block params as `pipe` stages over `mesh`.

    Returns Float[b, n, dim] (pre-final-norm), replicated over 'pipe'.
    """
    assert "pipe" in mesh.axis_names, "mesh needs a 'pipe' axis (make_mesh)"
    pipe = mesh.shape["pipe"]
    depth = transformer.depth
    assert depth % pipe == 0, f"depth {depth} % pipe {pipe} != 0"
    b, n, dim = x.shape
    M = microbatches
    assert b % M == 0, f"batch {b} % microbatches {M} != 0"
    mb = b // M
    h, dh = transformer.heads, transformer.dim_head
    data_ax = (
        "data"
        if ("data" in mesh.axis_names and mesh.shape["data"] > 1)
        else None
    )
    assert mb % (mesh.shape.get("data", 1)) == 0 or data_ax is None

    block = _canonical_block(transformer, flash_causal=flash_causal)
    use_flash = flash_spans is not None or flash_causal

    # the value-residual carry must match the layout the attention will
    # produce: [mb, n, h*d] when the fused NHD route is active (shared
    # predicate — models/layers.attention_uses_nhd), else [mb, h, n, d]
    from transfusion_tpu.models.layers import attention_uses_nhd

    _nhd = attention_uses_nhd(
        getattr(transformer, "attn_impl", "dense"),
        has_flash_spec=use_flash, has_cache=False, has_decode_bias=False,
        h=h, n=n, d=dh,
    )

    def vres_shape(mb_rows):
        return (mb_rows, n, h * dh) if _nhd else (mb_rows, h, n, dh)

    def split_mb(a):
        return None if a is None else a.reshape(M, mb, *a.shape[1:])

    aux = {
        "cond": split_mb(cond),
        "cond_index": split_mb(cond_index),
        "mask": split_mb(mask),
        "rope": split_mb(rope),
        "iam": split_mb(is_any_modality),
        "spans": split_mb(flash_spans),
    }
    aux_names = [k for k, v in aux.items() if v is not None]
    aux_arrays = [aux[k] for k in aux_names]

    def mb_spec(a):
        return P(None, data_ax, *([None] * (a.ndim - 2)))

    def stage_body(stacked_local, x_mb, *aux_in):
        rank = jax.lax.axis_index("pipe")
        aux_full = dict(zip(aux_names, aux_in))

        def apply_layer(carry, layer_params, a):
            xc, vres, valid = carry
            s = xc[None]  # streams=1 expand
            out = block.apply(
                {"params": layer_params},
                s,
                None,  # skip
                a.get("cond"),
                a.get("cond_index"),
                a.get("mask"),
                a.get("rope"),
                a.get("iam"),
                vres,
                None,  # layer_cache
                a.get("spans") if use_flash else None,
                valid > 0.5,
            )
            new_s, values, _ = out
            vres = jnp.where(valid > 0.5, vres, values)
            # `valid * 0 + 1` (not ones_like) keeps the carry's varying
            # manual axes stable under shard_map's vma tracking
            return (new_s[0], vres, valid * 0.0 + 1.0), None

        layer_fn = apply_layer
        if remat:
            policy = None
            if remat_policy == "dots":
                policy = (
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                )
            else:
                assert remat_policy == "full", remat_policy
            layer_fn = jax.checkpoint(
                apply_layer, prevent_cse=True, policy=policy
            )

        def run_stage(xc, vres, valid, a):
            def scan_fn(carry, layer_params):
                return layer_fn(carry, layer_params, a)

            (xc, vres, valid), _ = jax.lax.scan(
                scan_fn, (xc, vres, valid), stacked_local
            )
            return xc, vres, valid

        T = M + pipe - 1
        mb_loc = x_mb.shape[1]  # local microbatch rows (data axis sharded)
        state = jnp.zeros((mb_loc, n, dim), x_mb.dtype)
        vres = jnp.zeros(vres_shape(mb_loc), x_mb.dtype)
        valid = jnp.zeros((), jnp.float32)
        outs = jnp.zeros((M, mb_loc, n, dim), x_mb.dtype)
        # the carried payload becomes varying over 'pipe' (rank-dependent
        # injection) and the data axis (microbatch contents) — mark the
        # constant init values the same way so scan carry types match
        vary = ("pipe",) + ((data_ax,) if data_ax else ())
        state, vres, valid, outs = (
            jax.lax.pcast(t, vary, to="varying")
            for t in (state, vres, valid, outs)
        )

        perm = [(i, (i + 1) % pipe) for i in range(pipe)]
        is0 = rank == 0
        is_last = rank == pipe - 1

        for t in range(T):
            if t < M:  # rank 0 injects microbatch t
                state = jnp.where(is0, x_mb[t], state)
                vres = jnp.where(is0, jnp.zeros_like(vres), vres)
                valid = jnp.where(is0, 0.0, valid)
            mb_idx = jnp.clip(t - rank, 0, M - 1)
            a = {k: v[mb_idx] for k, v in aux_full.items()}
            state, vres, valid = run_stage(state, vres, valid, a)
            out_t = t - (pipe - 1)
            if 0 <= out_t < M:
                outs = outs.at[out_t].set(
                    jnp.where(is_last, state, outs[out_t])
                )
            if t < T - 1:
                state = jax.lax.ppermute(state, "pipe", perm)
                vres = jax.lax.ppermute(vres, "pipe", perm)
                valid = jax.lax.ppermute(valid, "pipe", perm)

        # replicate the last rank's outputs over 'pipe'
        outs = jax.lax.psum(
            jnp.where(is_last, outs, jnp.zeros_like(outs)), "pipe"
        )
        return outs

    x_mb = split_mb(x)
    in_specs = (
        jax.tree.map(lambda _: P("pipe"), stacked_params),
        mb_spec(x_mb),
        *[mb_spec(a) for a in aux_arrays],
    )
    out_spec = P(None, data_ax, None, None)

    outs = shard_map(
        stage_body,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_spec,
    )(stacked_params, x_mb, *aux_arrays)
    return outs.reshape(b, n, dim)


# ---------------------------------------------------------------------------
# full Transformer-equivalent forward (cond / masks / rope / final norm)
# ---------------------------------------------------------------------------


def _dense(params: dict, x, dtype=None):
    """Matches nn.Dense(dtype=...): inputs AND kernel cast to the compute
    dtype before the matmul, so bf16 models get bf16 conditioning here
    exactly as in Transformer.__call__."""
    k = params["kernel"]
    if dtype is not None:
        x, k = x.astype(dtype), k.astype(dtype)
    y = x @ k
    if "bias" in params:
        b = params["bias"]
        y = y + (b.astype(dtype) if dtype is not None else b)
    return y


def prepare_trunk_inputs(
    transformer_params: dict,
    transformer,
    x,  # Float[b, n, dim] (shape source only)
    times=None,  # None | Float[b] | Float[b, n]
    times_inst=None,  # None | Float[b, m] (requires spans)
    spans=None,  # Int[b, m, 3] | None
    causal: bool = False,
    is_any_modality=None,
    rotary_pos=None,  # Int[n] | Int[b, n] | None
):
    """Compute the replicated per-batch trunk inputs a pipelined schedule
    needs outside the flax scope: time conditioning, masks (dense or flash
    spans per `transformer.attn_impl`), rope angles, modality flags.
    Mirrors `Transformer.__call__`'s prologue (transformer.py:310-368);
    shared by the GPipe (`pipeline_transformer_forward`) and 1F1B
    (models/pipeline_loss.py) paths. Returns a dict with keys
    cond / cond_index / mask / rope / is_any_modality / flash_spans /
    flash_causal."""
    t = transformer
    b, n, _ = x.shape

    # --- time conditioning (replicated — cheap) — transformer.py:310-348 ---
    from transfusion_tpu.models.layers import random_fourier_embed

    cond = None
    cond_index = None
    if times_inst is not None or times is not None:
        fourier_w = jax.lax.stop_gradient(transformer_params["fourier_weights"])
    if times_inst is not None:
        assert spans is not None and times is None
        m = times_inst.shape[1]
        inst_times = jnp.concatenate(
            [jnp.zeros((b, 1), times_inst.dtype), times_inst], axis=1
        )
        rfe = random_fourier_embed(inst_times, t.dim, weights=fourier_w)
        cond = jax.nn.silu(
            _dense(transformer_params["to_time_cond"], rfe, t.dtype)
        )
        inst_mask = spans_to_instance_mask(n, spans)
        cond_index = jnp.einsum(
            "bmn,m->bn", inst_mask.astype(jnp.int32), jnp.arange(1, m + 1)
        )
    elif times is not None:
        if times.ndim == 0:
            times = jnp.broadcast_to(times, (b,))
        rfe = random_fourier_embed(times, t.dim, weights=fourier_w)
        cond = jax.nn.silu(
            _dense(transformer_params["to_time_cond"], rfe, t.dtype)
        )
    if cond is not None and cond.ndim == 2:
        cond = cond[:, None, :]

    # --- masks (transformer.py:350-368) ---
    use_flash = t.attn_impl == "flash"
    mask = None
    flash_spans = None
    flash_causal = False
    if use_flash and (spans is not None or causal):
        flash_spans, flash_causal = spans, causal
    else:
        masks = []
        if causal:
            seq = jnp.arange(n)
            masks.append(
                jnp.broadcast_to(
                    (seq[:, None] >= seq[None, :])[None, None], (b, 1, n, n)
                )
            )
        if spans is not None:
            masks.append(spans_to_attn_mask(n, spans)[:, None])
        if masks:
            mask = masks[0]
            for mk in masks[1:]:
                mask = mask & mk

    if is_any_modality is None and spans is not None:
        is_any_modality = spans_to_is_any_modality(n, spans)
    if isinstance(is_any_modality, bool):
        is_any_modality = jnp.full((b, n), is_any_modality)

    rope = None
    if rotary_pos is not None:
        rope = rope_angles(rotary_pos, t.dim_head, t.rope_theta)
        if rope.ndim == 2:
            rope = jnp.broadcast_to(rope[None], (b, *rope.shape))

    return dict(
        cond=cond,
        cond_index=cond_index,
        mask=mask,
        rope=rope,
        is_any_modality=is_any_modality,
        flash_spans=flash_spans,
        flash_causal=flash_causal,
    )


def pipeline_transformer_forward(
    transformer_params: dict,
    transformer,  # Transformer module (static config; unet_skips=False,
    # num_residual_streams=1, dropout=0 — asserted)
    mesh: Mesh,
    microbatches: int,
    x,  # Float[b, n, dim]
    times=None,  # None | Float[b] | Float[b, n]
    times_inst=None,  # None | Float[b, m] (requires spans)
    spans=None,  # Int[b, m, 3] | None
    causal: bool = False,
    is_any_modality=None,
    rotary_pos=None,  # Int[n] | Int[b, n] | None
    stacked_params=None,  # pass a pre-stacked tree to avoid re-stacking
    remat=None,  # None = inherit transformer.remat (+ remat_policy)
):
    """`Transformer.__call__`-equivalent forward, pipelined over 'pipe'.

    Covers the training paths (joint packed / text-only causal); KV-cache
    decoding stays unpipelined (single-token steps have no microbatch
    dimension to fill the pipeline with).
    """
    t = transformer
    assert t.unet_skips is False, "pipeline requires unet_skips=False"
    assert t.num_residual_streams == 1
    assert t.dropout == 0.0
    if remat is None:
        remat = t.remat  # honor the model's own remat config
    b, n, dim = x.shape

    prep = prepare_trunk_inputs(
        transformer_params, t, x,
        times=times, times_inst=times_inst, spans=spans, causal=causal,
        is_any_modality=is_any_modality, rotary_pos=rotary_pos,
    )
    cond = prep["cond"]
    cond_index = prep["cond_index"]
    mask = prep["mask"]
    rope = prep["rope"]
    is_any_modality = prep["is_any_modality"]
    flash_spans = prep["flash_spans"]
    flash_causal = prep["flash_causal"]

    if stacked_params is None:
        stacked_params = stack_block_params(transformer_params, t.depth)

    out = pipeline_blocks(
        stacked_params,
        t,
        mesh,
        microbatches,
        x,
        cond=cond,
        cond_index=cond_index,
        mask=mask,
        rope=rope,
        is_any_modality=is_any_modality,
        flash_spans=flash_spans,
        flash_causal=flash_causal,
        remat=remat,
        remat_policy=t.remat_policy,
    )

    # final RMSNorm (transformer.py:445) — replicated
    gamma = transformer_params["final_norm"]["gamma"]
    return l2norm(out) * (dim**0.5) * (gamma + 1.0)

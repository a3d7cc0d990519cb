"""1F1B (one-forward-one-backward) pipeline schedule with in-schedule loss.

The GPipe schedule in parallel/pipeline.py differentiates THROUGH the
(M + P - 1)-tick forward loop: autodiff stashes every tick's stage-input
carry, so activation liveness grows with the microbatch count M. The
classic fix (PipeDream-flush / 1F1B, Narayanan et al. 2021) interleaves
each microbatch's backward as soon as the last stage finishes its forward,
bounding the in-flight residuals per rank to O(P) microbatches instead of
O(M) — the schedule that makes deep-pipeline training memory-feasible.

The reference (lucidrains/transfusion-pytorch) has no pipeline support at
all (SURVEY.md §2.5); this module goes beyond its GPipe predecessor here.

TPU-first design notes:
  * Lockstep SPMD: one Python-unrolled loop of T = M + 2(P-1) ticks inside
    shard_map. At tick t, rank r runs the forward of microbatch f = t - r
    and the backward of microbatch f_b = t - 2(P-1) + r (each masked out
    while outside [0, M)). The last rank's forward feeds its loss head in
    the same tick — forward and backward of a microbatch coincide there,
    exactly the 1F1B steady state.
  * Stage-level rematerialization: the forward stores only each tick's
    stage INPUT carry in a ring buffer of W = 2P - 1 slots (the fwd->bwd
    tick gap at rank r is 2(P-1) - 2r <= 2(P-1), and a slot's last reader
    finishes before the wrap-around writer reaches it); the backward
    re-runs the stage under jax.vjp from the saved input. Memory per rank
    is W microbatch carries — independent of M — plus one stage's
    transient residuals.
  * The loss must be computable per microbatch, so the schedule takes a
    `head_fn` (final norm + text CE + flow losses; models/pipeline_loss.py
    builds it for the joint Transfusion loss) and accumulates loss,
    loss-aux, and ALL gradients (stage params, trunk input, conditioning,
    head params) inside the shard_map. `make_1f1b_loss` wraps the engine
    in jax.custom_vjp so an outer jax.value_and_grad composes with the
    embedding / time-conditioning code that produces x and cond.
  * Ring-buffer writes use static slot indices (the tick is a Python
    int); reads use traced rank-dependent indices (dynamic_index_in_dim).
  * Communication per tick: forward carries ppermute +1, backward
    cotangents ppermute -1 — both nearest-neighbour rotations over ICI.

Constraints inherited from the GPipe engine: unet_skips=False,
num_residual_streams=1, dropout=0 (the backward recompute must be
deterministic), depth % pipe == 0, batch % microbatches == 0,
microbatches >= pipe. The schedule composes with DATA parallelism (r4):
each microbatch's rows shard over the mesh's 'data' axis inside the
shard_map (stage compute and the loss head see local rows; grads/loss are
psum'd over 'data'); tensor/context axes remain out of scope here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from transfusion_tpu.parallel.pipeline import _canonical_block


def _split_mb(a, M):
    return None if a is None else a.reshape(M, a.shape[0] // M, *a.shape[1:])


def _mask_tree(active, t):
    return jax.tree.map(lambda l: jnp.where(active, l, jnp.zeros_like(l)), t)


def _add_trees(a, b):
    return jax.tree.map(jnp.add, a, b)


def _f32_zeros_like_tree(t):
    return jax.tree.map(lambda l: jnp.zeros(l.shape, jnp.float32), t)


def _zero_cotangent(x):
    """Zero cotangent matching jax's expectation: float0 for non-float
    primals (ints/bools), zeros otherwise."""
    if jnp.issubdtype(x.dtype, jnp.floating) or jnp.issubdtype(
        x.dtype, jnp.complexfloating
    ):
        return jnp.zeros_like(x)
    return np.zeros(x.shape, jax.dtypes.float0)


def pipeline_1f1b_grads(
    stacked_params,
    transformer,  # Transformer module (static config)
    mesh: Mesh,
    microbatches: int,
    x,  # Float[b, n, dim] trunk input
    head_fn,  # (head_params, head_data, out_mb [mb_local,n,dim], f, row0)
    #           -> (loss_contrib scalar, aux pytree of fixed-shape arrays);
    #           row0 = global batch row of out_mb's first row
    head_params,
    head_data,  # pytree of constants (labels, group targets, normalizers…)
    cond=None,  # Float[b, I|1, 4*dim] | None — differentiated
    cond_index=None,
    mask=None,
    rope=None,
    is_any_modality=None,
    flash_spans=None,
    flash_causal: bool = False,
    remat: bool = True,
    remat_policy: str = "full",
):
    """Run the 1F1B schedule. Returns
    (loss, aux, dstacked, dx, dcond, dhead_params) — the true gradients of
    loss = sum of head_fn contributions over microbatches.
    """
    assert "pipe" in mesh.axis_names, "mesh needs a 'pipe' axis (make_mesh)"
    pipe = mesh.shape["pipe"]
    for ax, size in mesh.shape.items():
        assert ax in ("pipe", "data") or size == 1, (
            "the 1F1B engine pipelines over 'pipe' and shards rows over "
            f"'data' only — axis {ax}={size} must be size 1"
        )
    dp = mesh.shape.get("data", 1)
    data_ax = "data" if dp > 1 else None
    depth = transformer.depth
    assert depth % pipe == 0, f"depth {depth} % pipe {pipe} != 0"
    b, n, dim = x.shape
    M = microbatches
    assert b % M == 0, f"batch {b} % microbatches {M} != 0"
    assert M >= pipe, f"microbatches {M} must be >= pipe {pipe}"
    mb = b // M  # GLOBAL rows per microbatch
    assert mb % dp == 0, f"microbatch rows {mb} % data axis {dp} != 0"
    h, dh = transformer.heads, transformer.dim_head
    has_cond = cond is not None

    block = _canonical_block(transformer, flash_causal=flash_causal)
    use_flash = flash_spans is not None or flash_causal

    # value-residual carry layout must match what the attention produces
    # (fused NHD route: [mb, n, h*d]; see models/layers.attention_uses_nhd)
    from transfusion_tpu.models.layers import attention_uses_nhd

    _nhd = attention_uses_nhd(
        getattr(transformer, "attn_impl", "dense"),
        has_flash_spec=use_flash, has_cache=False, has_decode_bias=False,
        h=h, n=n, d=dh,
    )

    def vres_shape(rows):
        return (rows, n, h * dh) if _nhd else (rows, h, n, dh)

    aux_nd = {
        "cond_index": _split_mb(cond_index, M),
        "mask": _split_mb(mask, M),
        "rope": _split_mb(rope, M),
        "iam": _split_mb(is_any_modality, M),
        "spans": _split_mb(flash_spans, M) if use_flash else None,
    }
    nd_names = [k for k, v in aux_nd.items() if v is not None]
    nd_arrays = [aux_nd[k] for k in nd_names]
    c_arr = (
        _split_mb(cond, M) if has_cond else jnp.zeros((M, 1), x.dtype)
    )
    x_mb = _split_mb(x, M)

    W = 2 * pipe - 1
    T = M + 2 * (pipe - 1)

    def stage_apply(stacked_local, state, vres, valid, c_mb, nd):
        """state [mb,n,dim], vres [mb,h,n,dh], valid f32[] ->
        same-shaped outputs after this rank's layers."""

        def apply_layer(carry, layer_params):
            xc, vr, vl = carry
            s = xc[None]
            out = block.apply(
                {"params": layer_params},
                s,
                None,
                c_mb,
                nd.get("cond_index"),
                nd.get("mask"),
                nd.get("rope"),
                nd.get("iam"),
                vr,
                None,
                nd.get("spans") if use_flash else None,
                vl > 0.5,
            )
            new_s, values, _ = out
            vr = jnp.where(vl > 0.5, vr, values)
            return (new_s[0], vr, vl * 0.0 + 1.0), None

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

        (state, vres, valid), _ = jax.lax.scan(
            layer_fn, (state, vres, valid), stacked_local
        )
        return state, vres, valid

    def schedule_body(
        stacked_local, x_mb, c_mb, head_params, head_data, *nd_in
    ):
        rank = jax.lax.axis_index("pipe")
        is0 = rank == 0
        is_last = rank == pipe - 1
        mb_l = x_mb.shape[1]  # LOCAL microbatch rows ('data'-sharded)
        data_rank = jax.lax.axis_index("data") if data_ax else 0
        nd_full = dict(zip(nd_names, nd_in))
        perm_fwd = [(i, (i + 1) % pipe) for i in range(pipe)]
        perm_bwd = [(i, (i - 1) % pipe) for i in range(pipe)]

        # forward carries
        state = jnp.zeros((mb_l, n, dim), x_mb.dtype)
        vres = jnp.zeros(vres_shape(mb_l), x_mb.dtype)
        valid = jnp.zeros((), jnp.float32)
        # backward carries (cotangents of this rank's OUTPUT carries)
        dstate = jnp.zeros((mb_l, n, dim), jnp.float32)
        dvres = jnp.zeros(vres_shape(mb_l), jnp.float32)

        # ring buffer of stage INPUTS (the only forward residuals kept)
        buf_state = jnp.zeros((W, mb_l, n, dim), x_mb.dtype)
        buf_vres = jnp.zeros((W,) + vres_shape(mb_l), x_mb.dtype)
        buf_valid = jnp.zeros((W,), jnp.float32)

        # accumulators
        loss_acc = jnp.zeros(())
        aux_acc = None  # shaped by the first head call
        dstacked = _f32_zeros_like_tree(stacked_local)
        dhead = _f32_zeros_like_tree(head_params)
        dx_acc = jnp.zeros((M, mb_l, n, dim), jnp.float32)
        dcond_acc = (
            jnp.zeros((M, mb_l) + cond.shape[1:], jnp.float32)
            if has_cond
            else None
        )

        def pick_nd(f):
            return {k: v[jnp.clip(f, 0, M - 1)] for k, v in nd_full.items()}

        def pick_cond(f):
            if not has_cond:
                return None
            return c_mb[jnp.clip(f, 0, M - 1)]

        for t in range(T):
            # ---- forward wave -------------------------------------------
            if t < M:  # rank 0 injects microbatch t
                state = jnp.where(is0, x_mb[t].astype(state.dtype), state)
                vres = jnp.where(is0, jnp.zeros_like(vres), vres)
                valid = jnp.where(is0, 0.0, valid)
            f_f = t - rank  # this rank's fwd microbatch (may be invalid)

            if t < M + pipe - 1:
                # store the stage INPUT (static slot: t is a Python int)
                slot = t % W
                buf_state = buf_state.at[slot].set(state)
                buf_vres = buf_vres.at[slot].set(vres)
                buf_valid = buf_valid.at[slot].set(valid)

                state, vres, valid = stage_apply(
                    stacked_local, state, vres, valid,
                    pick_cond(f_f), pick_nd(f_f),
                )

            # ---- last-rank loss head (same tick as its fwd) --------------
            f_out = t - (pipe - 1)
            head_seed = None
            if 0 <= f_out < M:
                f_idx = jnp.asarray(f_out, jnp.int32)
                row0 = f_idx * mb + data_rank * mb_l

                def head_call(hp, out_mb, f_idx=f_idx, row0=row0):
                    return head_fn(hp, head_data, out_mb, f_idx, row0)

                contrib, head_vjp, haux = jax.vjp(
                    head_call, head_params, state.astype(jnp.float32),
                    has_aux=True,
                )
                dh_t, dout = head_vjp(jnp.ones(()))
                loss_acc = loss_acc + jnp.where(is_last, contrib, 0.0)
                haux_m = _mask_tree(is_last, haux)
                aux_acc = (
                    haux_m if aux_acc is None else _add_trees(aux_acc, haux_m)
                )
                dhead = _add_trees(
                    dhead,
                    _mask_tree(
                        is_last,
                        jax.tree.map(
                            lambda l: l.astype(jnp.float32), dh_t
                        ),
                    ),
                )
                head_seed = dout

            # ---- backward wave ------------------------------------------
            if t >= pipe - 1 and t - 2 * (pipe - 1) < M:
                f_b = t - 2 * (pipe - 1) + rank
                active_b = (f_b >= 0) & (f_b < M)
                ds_in = dstate
                if head_seed is not None:
                    ds_in = jnp.where(is_last, head_seed, ds_in)
                else:
                    # past the last fwd tick the last rank has no new head
                    # seed; whatever it received is wrap-around garbage
                    ds_in = jnp.where(is_last, jnp.zeros_like(ds_in), ds_in)
                # the head never consumes vres, so the last rank's output
                # vres cotangent is always zero
                dv_in = jnp.where(is_last, jnp.zeros_like(dvres), dvres)

                # fwd tick of mb f_b at this rank was f_b + rank
                slot_b = jnp.remainder(f_b + rank, W)
                s_saved = jax.lax.dynamic_index_in_dim(
                    buf_state, slot_b, keepdims=False
                )
                v_saved = jax.lax.dynamic_index_in_dim(
                    buf_vres, slot_b, keepdims=False
                )
                vl_saved = jax.lax.dynamic_index_in_dim(
                    buf_valid, slot_b, keepdims=False
                )

                if has_cond:

                    def stage_sv(p, s, v, c, vl=vl_saved, f=f_b):
                        o_s, o_v, _ = stage_apply(p, s, v, vl, c, pick_nd(f))
                        return o_s, o_v

                    _, vjp_b = jax.vjp(
                        stage_sv, stacked_local, s_saved, v_saved,
                        pick_cond(f_b),
                    )
                    dp_b, ds_b, dv_b, dc_b = vjp_b(
                        (
                            ds_in.astype(s_saved.dtype),
                            dv_in.astype(v_saved.dtype),
                        )
                    )
                else:

                    def stage_sv(p, s, v, vl=vl_saved, f=f_b):
                        o_s, o_v, _ = stage_apply(
                            p, s, v, vl, None, pick_nd(f)
                        )
                        return o_s, o_v

                    _, vjp_b = jax.vjp(
                        stage_sv, stacked_local, s_saved, v_saved
                    )
                    dp_b, ds_b, dv_b = vjp_b(
                        (
                            ds_in.astype(s_saved.dtype),
                            dv_in.astype(v_saved.dtype),
                        )
                    )
                    dc_b = None

                dstacked = _add_trees(
                    dstacked,
                    _mask_tree(
                        active_b,
                        jax.tree.map(
                            lambda l: l.astype(jnp.float32), dp_b
                        ),
                    ),
                )
                if has_cond:
                    dcond_acc = dcond_acc.at[jnp.clip(f_b, 0, M - 1)].add(
                        jnp.where(active_b, dc_b.astype(jnp.float32), 0.0)
                    )
                # rank 0's input cotangent is the trunk-input gradient
                dx_acc = dx_acc.at[jnp.clip(f_b, 0, M - 1)].add(
                    jnp.where(active_b & is0, ds_b.astype(jnp.float32), 0.0)
                )
                dstate = jnp.where(
                    active_b, ds_b.astype(jnp.float32), dstate
                )
                dvres = jnp.where(active_b, dv_b.astype(jnp.float32), dvres)

            # ---- communication ------------------------------------------
            if t < T - 1:
                if t < M + pipe - 2:
                    state = jax.lax.ppermute(state, "pipe", perm_fwd)
                    vres = jax.lax.ppermute(vres, "pipe", perm_fwd)
                    valid = jax.lax.ppermute(valid, "pipe", perm_fwd)
                dstate = jax.lax.ppermute(dstate, "pipe", perm_bwd)
                dvres = jax.lax.ppermute(dvres, "pipe", perm_bwd)

        # ---- reductions --------------------------------------------------
        red = ("pipe", "data") if data_ax else ("pipe",)
        loss = jax.lax.psum(loss_acc, red)
        aux = jax.tree.map(lambda l: jax.lax.psum(l, red), aux_acc)
        dhead = jax.tree.map(lambda l: jax.lax.psum(l, red), dhead)
        if data_ax:  # stage grads: partial over this shard's rows
            dstacked = jax.tree.map(
                lambda l: jax.lax.psum(l, "data"), dstacked
            )
        # dx/dcond stay [M, mb_l, ...] sharded over 'data' (reassembled by
        # the out_specs, reshaped to [b, ...] outside the shard_map)
        dx = jax.lax.psum(
            jnp.where(is0, dx_acc, jnp.zeros_like(dx_acc)), "pipe"
        )
        outs = [loss, aux, dstacked, dx]
        if has_cond:
            outs.append(jax.lax.psum(dcond_acc, "pipe"))
        outs.append(dhead)
        return tuple(outs)

    def mb_sharded(a):
        return P(None, data_ax, *([None] * (a.ndim - 2)))

    in_specs = (
        P("pipe"),  # stacked (prefix spec for the whole tree)
        mb_sharded(x_mb),  # x_mb [M, mb, n, dim] — rows sharded over data
        mb_sharded(c_arr) if has_cond else P(),  # cond
        P(),  # head_params (replicated; P() covers scalar leaves too)
        P(),  # head_data (replicated; the head slices its own row window)
        *[mb_sharded(a) for a in nd_arrays],
    )
    out_specs = [
        P(),  # loss
        P(),  # aux (prefix)
        P("pipe"),  # dstacked
        P(None, data_ax),  # dx [M, mb, n, dim]
    ]
    if has_cond:
        out_specs.append(P(None, data_ax))  # dcond
    out_specs.append(P())  # dhead
    out_specs = tuple(out_specs)

    res = shard_map(
        schedule_body,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )(stacked_params, x_mb, c_arr, head_params, head_data, *nd_arrays)

    if has_cond:
        loss, aux, dstacked, dx, dcond, dhead = res
    else:
        loss, aux, dstacked, dx, dhead = res
        dcond = None
    dx = dx.reshape(b, n, dim)
    if dcond is not None:
        dcond = dcond.reshape((b,) + cond.shape[1:])
    return loss, aux, dstacked, dx, dcond, dhead


# ---------------------------------------------------------------------------
# differentiable wrapper
# ---------------------------------------------------------------------------


def make_1f1b_loss(head_fn, transformer, mesh, static_cfg):
    """Build `loss, aux = f(stacked, x, cond, head_params, head_data,
    nd_aux)` differentiable wrt (stacked, x, cond, head_params); gradients
    come from the 1F1B schedule itself, so an outer jax.value_and_grad
    pays no extra pipeline passes (the engine computes them in-schedule
    and the custom_vjp backward just scales them by the loss cotangent).

    static_cfg: dict(microbatches=int, flash_causal=bool, remat=bool,
    remat_policy=str). nd_aux: dict with optional cond_index / mask /
    rope / iam / flash_spans arrays (non-differentiable).
    """

    def run(stacked, x, cond, head_params, head_data, nd_aux):
        return pipeline_1f1b_grads(
            stacked,
            transformer,
            mesh,
            static_cfg["microbatches"],
            x,
            head_fn,
            head_params,
            head_data,
            cond=cond,
            cond_index=nd_aux.get("cond_index"),
            mask=nd_aux.get("mask"),
            rope=nd_aux.get("rope"),
            is_any_modality=nd_aux.get("iam"),
            flash_spans=nd_aux.get("flash_spans"),
            flash_causal=static_cfg.get("flash_causal", False),
            remat=static_cfg.get("remat", True),
            remat_policy=static_cfg.get("remat_policy", "full"),
        )

    @jax.custom_vjp
    def f(stacked, x, cond, head_params, head_data, nd_aux):
        loss, aux, *_ = run(stacked, x, cond, head_params, head_data, nd_aux)
        return loss, aux

    def f_fwd(stacked, x, cond, head_params, head_data, nd_aux):
        loss, aux, dstacked, dx, dcond, dhead = run(
            stacked, x, cond, head_params, head_data, nd_aux
        )
        # keep the primals in the residuals: the backward needs their
        # dtypes for the cast and builds float0 cotangents for the
        # non-differentiable int/bool leaves
        res = (dstacked, dx, dcond, dhead,
               stacked, x, cond, head_params, head_data, nd_aux)
        return (loss, aux), res

    def f_bwd(res, cts):
        (dstacked, dx, dcond, dhead,
         stacked, x, cond, head_params, head_data, nd_aux) = res
        g, _g_aux = cts  # aux is metrics-only; its cotangent is dropped

        def scale(t, like):
            return jax.tree.map(
                lambda l, lk: (g * l).astype(lk.dtype), t, like
            )

        return (
            scale(dstacked, stacked),
            (g * dx).astype(x.dtype),
            None if dcond is None else (g * dcond).astype(cond.dtype),
            scale(dhead, head_params),
            jax.tree.map(_zero_cotangent, head_data),
            jax.tree.map(_zero_cotangent, nd_aux),
        )

    f.defvjp(f_fwd, f_bwd)
    return f

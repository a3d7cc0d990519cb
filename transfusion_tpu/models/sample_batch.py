"""Batched multimodal sampling: R `sample()` state machines, shared dispatches.

The reference's flagship `sample()` API is strictly batch-1
(lucidrains/transfusion-pytorch transfusion.py:1625-1948): every text token
is one forward, every modality segment one ODE integration, and serving N
requests costs N full loops. This module runs R requests through ONE pool
of device state:

  * one KV cache with R rows (2R with CFG: rows [0..R) are the conditional
    streams, rows [R..2R) the unconditional ones — the incremental batch-2
    CFG layout of `_sample_cached` widened to the pool);
  * ONE batched prefill over all prompts (ragged rows, per-row cache
    offsets — the `generate_text_batch` machinery);
  * per-token text decoding as ONE batched dispatch across every request
    currently in text phase; requests in other phases ride along bit-inert
    (validity masked off + idx pinned — the ServingEngine pattern,
    models/engine.py);
  * modality segments grouped by (modality_type, shape): each group's tail
    ODE is ONE batched integration over the pool (same trace for any member
    subset, so co-scheduling never recompiles).

Request-level behavior (transition detection, shape-meta parsing, eos,
max_length) replicates `Transfusion._sample_cached` exactly — the parity
test decodes the same prompts solo and batched and asserts identical
outputs at temperature=0 with pinned modality noise.

RNG: each request draws from its own fold-in streams —
text keys fold (base, request, #sampled) and modality-noise keys fold
(base, request, #segments) — so sampled output is reproducible per request
no matter what it is co-batched with (same contract as ServingEngine).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from transfusion_tpu.data.packing import to_channel_last, to_user_layout
from transfusion_tpu.ops.flow import min_p_filter
from transfusion_tpu.ops.odeint import odeint
from transfusion_tpu.utils.helpers import default


def _round_up(n, m):
    return -(-int(n) // m) * m


def _width_bucket_pack(model, batch_items):
    """Pack to the next power-of-two multiple of pad_multiple (same trace
    bucketing as sample()'s bucket_pack)."""
    packed = model.pack(batch_items, wrap_sos_eos=False, add_meta=False)
    L = packed.text.shape[1]
    mult = model.pad_multiple
    chunks = max(1, -(-L // mult))
    bucket = mult * (1 << (chunks - 1).bit_length())
    if bucket != L:
        packed = model.pack(
            batch_items, wrap_sos_eos=False, add_meta=False,
            pad_multiple=bucket,
        )
    return packed


def _seq_stats(model, items):
    """(token count, rotary-collapse) of an item list — mirrors
    _sample_cached.seq_stats."""
    tok_count, collapse = 0, 0
    for it in items:
        if isinstance(it, tuple):
            mc = model.modalities[it[0]]
            lat = to_channel_last(np.asarray(it[1]), mc.channel_first_latent)
            L = int(math.prod(model.seq_shape_for(it[0], lat.shape[:-1])))
            tok_count += L
            collapse += L - 1
        else:
            tok_count += len(it)
    return tok_count, collapse


def _uncond_of(model, items):
    """Unconditional twin: every text id nulled, modalities kept (the
    uncond context of training's prob_uncond dropout)."""
    return [
        np.where(np.asarray(it) >= 0, model.null_text_id, it)
        if not isinstance(it, tuple)
        else it
        for it in items
    ]


class _Req:
    __slots__ = (
        "items", "tok_count", "collapse", "slots_used", "pending",
        "parked", "mid", "shape", "curr_length", "done",
        "n_sampled", "n_segments",
    )

    def __init__(self, items, tok_count, collapse):
        self.items = items
        self.tok_count = tok_count
        self.collapse = collapse
        self.slots_used = 0
        self.pending: Optional[int] = None
        self.parked = False
        self.mid: Optional[int] = None
        self.shape: Optional[tuple] = None
        self.curr_length = 0
        self.done = False
        self.n_sampled = 0
        self.n_segments = 0


def _transition(model, r: _Req, fixed_modality_shape=None):
    """Park the request if its last text token is a som trigger — mirrors
    the solo loop's maybe-transition (ref transfusion.py:1706-1757)."""
    last = r.items[-1]
    if isinstance(last, tuple) or len(last) == 0:
        return
    tok = int(np.asarray(last)[-1])
    if tok not in model.som_ids:
        return
    r.mid = model.som_ids.index(tok)
    r.shape = (
        tuple(fixed_modality_shape)
        if fixed_modality_shape is not None
        else tuple(model._parse_modality_shape(last, r.mid))
    )
    r.parked = True


def _append_tok(r: _Req, tok: int):
    last = r.items[-1]
    if isinstance(last, tuple):
        r.items.append(np.asarray([tok], np.int32))
    else:
        r.items[-1] = np.concatenate([last, np.asarray([tok], np.int32)])


def _consume(model, r: _Req, tok: int, fixed_modality_shape=None):
    """A freshly sampled token for a text-phase request — mirrors the
    solo loop's text branch."""
    r.pending = tok
    r.n_sampled += 1
    _append_tok(r, tok)
    r.curr_length += 1
    if tok == model.eos_id:
        r.done = True
        return
    _transition(model, r, fixed_modality_shape)


# ---------------------------------------------------------------------------
# jitted device functions (resolved through model._get_jit so traces are
# shared across sample_batch calls on the same model)
# ---------------------------------------------------------------------------


def _pick_impl(model, last_logits, keys, *, temperature, min_p):
    """Sample one token per row from stored logits (post-prefill/rebuild)."""
    filtered = jax.vmap(
        lambda lg: min_p_filter(lg.astype(jnp.float32), min_p)
    )(last_logits)
    if temperature == 0.0:
        return jnp.argmax(filtered, axis=-1)
    return jax.vmap(
        lambda k, lg: jax.random.categorical(k, lg / temperature)
    )(keys, filtered)


def _chunk_tick_impl(
    model, params, cache, toks0, pos0, active0, rem, base_rng, cnt0, seeds,
    *, temperature, min_p, R, k, stop_ids,
):
    """k batched text steps in ONE dispatch (lax.scan), with in-scan
    per-row stopping — the ServingEngine trick extended with a som/eos
    stop set, so a row that samples a modality trigger parks mid-chunk
    and rides the rest bit-inert.

    Per active cond row r at scan step j: stream the current pending
    token (uncond twin streams null at the same position), sample the
    next from the fresh logits with the row's precomputed fold-in key,
    emit it, and stop the row if it sampled a stop id or exhausted its
    emit budget `rem` (parked rows flush their som with rem=1; their
    discarded sample reuses the same fold-in counter the consumed token
    will use later — identical semantics to the single-tick path).

    Returns (emitted toks Int[R, k], emit mask Bool[R, k], cache).
    """
    from transfusion_tpu.models.transformer import cache_mark_valid

    rows = pos0.shape[0]
    null_id = model.null_text_id
    # per-request fold-in keys for the whole chunk, one batched hash
    # (a row is active on a prefix of the chunk's steps, so the key at
    # step j is fold(fold(rng, seed_i), cnt0_i + j) for every step that
    # counts). `seeds` is the per-row stream id: the row index in
    # sample_batch, the REQUEST id in the multimodal engine — so engine
    # output is reproducible per request regardless of slot placement.
    keys_all = jax.vmap(
        lambda j: jax.vmap(
            lambda i, c: jax.random.fold_in(
                jax.random.fold_in(base_rng, i), c + j
            )
        )(seeds, cnt0)
    )(jnp.arange(k))  # [k, R, key]

    def step(carry, keys_j):
        cache, pending, pos, act_c, cnt = carry
        # rows activity: cond rows act_c; uncond twins mirror them
        active = (
            jnp.concatenate([act_c, act_c]) if rows == 2 * R else act_c
        )
        toks = jnp.where(act_c, pending, 0)
        toks_rows = (
            jnp.concatenate([toks, jnp.full((R,), null_id)])
            if rows == 2 * R
            else toks
        )
        old_idx = cache["idx"]
        cache = cache_mark_valid(cache, active[:, None])
        logits, cache = model.core.apply(
            params, toks_rows[:, None], pos[:, None], cache,
            method="decode_text_step",
        )
        cache = {**cache, "idx": jnp.where(active, cache["idx"], old_idx)}
        last = logits[:R, -1].astype(jnp.float32)
        nxt = _pick_impl(
            model, last, keys_j, temperature=temperature, min_p=min_p
        )
        emit = act_c
        pending_next = jnp.where(act_c, nxt, pending)
        cnt_next = cnt + act_c.astype(jnp.int32)
        stop = cnt_next >= rem
        for sid in stop_ids:
            stop = stop | (nxt == sid)
        act_next = act_c & ~stop
        pos_next = pos + active.astype(jnp.int32)
        return (cache, pending_next, pos_next, act_next, cnt_next), (
            nxt, emit,
        )

    (cache, _, _, _, _), (toks, emits) = jax.lax.scan(
        step,
        (cache, toks0, pos0, active0, jnp.zeros((R,), jnp.int32)),
        keys_all,
    )
    payload = jnp.concatenate(
        [toks.T.astype(jnp.int32), emits.T.astype(jnp.int32)], axis=1
    )  # [R, 2k] — ONE host fetch per chunk
    return payload, cache


def _ode_impl(
    model, params, cache, noise, p0, member, cfg_scale,
    *, mid, L, steps, use_cfg, R,
):
    """Batched tail-only ODE over the pool cache. noise: Float[R, *shape, d]
    (zeros for non-members); p0: Int[rows] per-row positions; member:
    Bool[rows]. Non-member rows compute bit-inert garbage (masked invalid;
    the cache is never kept). One trace per (mid, shape, steps, R) — the
    member subset is data, so co-scheduling never recompiles."""
    rows = p0.shape[0]
    rotary = jnp.broadcast_to(p0[:, None], (rows, L))
    valid = member[:, None] & jnp.ones((rows, L), bool)

    def flow(t, y):
        from transfusion_tpu.models.transformer import cache_mark_valid

        cc = cache_mark_valid(cache, valid)
        y_rows = jnp.concatenate([y, y], axis=0) if rows == 2 * R else y
        t_rows = t
        if jnp.ndim(t) == 1 and rows == 2 * R:
            t_rows = jnp.concatenate([t, t], axis=0)  # uncond twins share
            # their cond row's clock (per-row adaptive control)
        f, _ = model.core.apply(
            params, y_rows, t_rows, rotary, cc, mid,
            method="decode_modality_rows",
        )
        if use_cfg:
            return f[R:] + cfg_scale * (f[:R] - f[R:])
        return f

    if model.odeint_method == "adaptive":
        # per-ROW step control: a request's trajectory must not depend on
        # which rows it is pooled with (odeint_adaptive_rows docstring) —
        # a shared controller would couple step acceptance across requests
        from transfusion_tpu.ops.odeint import odeint_adaptive_rows

        return odeint_adaptive_rows(flow, noise, 0.0, 1.0)
    grid = jnp.linspace(0.0, 1.0, steps)
    return odeint(flow, noise, grid, method=model.odeint_method)


def _append_impl(model, params, cache, y, p0, member, *, mid, L, R):
    """Write the sampled segment into member rows' caches (conditioned as
    clean, t=1); non-member rows bit-inert."""
    from transfusion_tpu.models.transformer import cache_mark_valid

    rows = p0.shape[0]
    old_idx = cache["idx"]
    valid = member[:, None] & jnp.ones((rows, L), bool)
    cache = cache_mark_valid(cache, valid)
    rotary = jnp.broadcast_to(p0[:, None], (rows, L))
    y_rows = jnp.concatenate([y, y], axis=0) if rows == 2 * R else y
    _, cache = model.core.apply(
        params, y_rows, 1.0, rotary, cache, mid,
        method="decode_modality_rows",
    )
    cache = {**cache, "idx": jnp.where(member, cache["idx"], old_idx)}
    return cache


# ---------------------------------------------------------------------------
# the host state machine
# ---------------------------------------------------------------------------


def sample_batch(
    model,
    params,
    prompts,  # list of sample()-style prompts, one per request
    rng=None,
    max_length=2048,  # int, or one budget per prompt (sequence)
    text_temperature: float = 1.5,
    text_min_p: float = 0.1,
    fixed_modality_shape: Optional[tuple] = None,
    init_modality_noise=None,
    modality_steps: int = 16,
    cfg_scale: float = 3.0,
    kv_quantize: Optional[bool] = None,
    return_unprocessed_modalities: bool = False,
    text_chunk: int = 32,  # max text tokens decoded per dispatch (rows
    # stop in-scan at som/eos/budget, so overshoot is bit-inert; 1 =
    # dispatch-per-token)
):
    """Batched equivalent of `model.sample(cache_kv=True, ...)` over R
    prompts. Returns a list of R results (decoded sample items, or raw
    items with return_unprocessed_modalities).

    max_length may be one budget per prompt: each row's in-scan stop and
    retirement use its OWN budget (budgets are host-side data, not trace
    keys — a ragged-budget batch compiles the same traces as a uniform
    one), so serving per-request max_tokens contracts hold inside a wave.
    """
    assert prompts is not None and len(prompts) >= 1
    assert model.num_text_tokens > 0, (
        "sample_batch needs a text vocabulary — use generate_modality_only "
        "for pure-modality models (it is already batched)"
    )
    rng = default(rng, jax.random.PRNGKey(0))
    R = len(prompts)
    if isinstance(max_length, (int, float, np.integer)):
        budgets = [int(max_length)] * R
    else:
        budgets = [int(v) for v in max_length]
        assert len(budgets) == R, (len(budgets), R)
    use_cfg = cfg_scale != 1.0
    rows = 2 * R if use_cfg else R
    # in-scan stop set: modality triggers + eos (budget rides separately)
    stop_ids = tuple(int(s) for s in model.som_ids)
    if model.eos_id is not None:
        stop_ids = stop_ids + (int(model.eos_id),)

    reqs = []
    for p in prompts:
        items = model._prompt_to_items(p)
        tc, co = _seq_stats(model, items)
        reqs.append(_Req(items, tc, co))

    cap = _round_up(
        max(r.tok_count + b for r, b in zip(reqs, budgets)) + 256 + 2, 128
    )
    quantize, transposed = model._resolve_serving_plan(
        cap, rows, kv_quantize
    )

    def prefill(this_cap):
        batch_items = [r.items for r in reqs]
        if use_cfg:
            batch_items += [_uncond_of(model, r.items) for r in reqs]
        packed = _width_bucket_pack(model, batch_items)
        fn = model._get_jit(
            "sample_prefill", model._prefill_impl,
            static_argnames=("cap", "quantize", "transposed"),
        )
        last_logits, cache = fn(
            params, jax.tree.map(jnp.asarray, packed), cap=this_cap,
            quantize=bool(quantize), transposed=transposed,
        )
        lengths = np.asarray(packed.lengths, np.int32)
        # go per-row: every row continues at its own length
        cache = {**cache, "idx": jnp.asarray(lengths)}
        for i, r in enumerate(reqs):
            r.slots_used = int(lengths[i])
            r.pending = None
        return last_logits, cache

    last_logits, cache = prefill(cap)

    for r in reqs:
        _transition(model, r, fixed_modality_shape)

    def text_key(i, r):
        return jax.random.fold_in(
            jax.random.fold_in(rng, i), r.n_sampled
        )

    def live(r):
        return not r.done

    def retire_overlong():
        for r, b in zip(reqs, budgets):
            if live(r) and r.curr_length > b:
                r.done = True

    def consume(r: _Req, i: int, tok: int):
        _consume(model, r, tok, fixed_modality_shape)

    while any(live(r) for r in reqs):
        retire_overlong()

        # ---- pick: text-phase requests with no pending (post-prefill or
        # post-rebuild) sample directly from the stored logits ------------
        need_pick = [
            i for i, r in enumerate(reqs)
            if live(r) and not r.parked and r.pending is None
        ]
        if need_pick:
            keys = jnp.stack([text_key(i, reqs[i]) for i in range(R)])
            fn = model._get_jit(
                "sampleb_pick", functools.partial(_pick_impl, model),
                static_argnames=("temperature", "min_p"),
            )
            picks = np.asarray(fn(
                jnp.asarray(last_logits)[:R], keys,
                temperature=float(text_temperature),
                min_p=float(text_min_p),
            ))
            for i in need_pick:
                consume(reqs[i], i, int(picks[i]))
            retire_overlong()

        # ---- chunked text decode: stream every pending token and keep
        # decoding in ONE lax.scan dispatch; rows stop in-scan at som/eos/
        # budget (parked rows flush their som with an emit budget of 1) ---
        stream = [
            i for i, r in enumerate(reqs)
            if live(r) and r.pending is not None
        ]
        if stream:
            toks0 = np.zeros(R, np.int32)
            pos0 = np.zeros(rows, np.int32)
            act0 = np.zeros(R, bool)
            rem = np.zeros(R, np.int32)
            cnt0 = np.zeros(R, np.int32)
            for i in stream:
                r = reqs[i]
                toks0[i] = r.pending
                pos0[i] = r.tok_count - r.collapse
                act0[i] = True
                rem[i] = (
                    1 if (r.parked or r.done)
                    else budgets[i] - r.curr_length + 1
                )
                cnt0[i] = r.n_sampled
                if use_cfg:
                    pos0[R + i] = pos0[i]
            max_rem = int(max(rem[i] for i in stream))
            k = 1 << (min(max_rem, int(text_chunk)) - 1).bit_length()
            fn = model._get_jit(
                "sampleb_chunk", functools.partial(_chunk_tick_impl, model),
                static_argnames=(
                    "temperature", "min_p", "R", "k", "stop_ids"
                ),
                donate_argnums=(1,),  # cache buffers update in place
            )
            payload, cache = fn(
                params, cache, jnp.asarray(toks0), jnp.asarray(pos0),
                jnp.asarray(act0), jnp.asarray(rem), rng,
                jnp.asarray(cnt0), jnp.arange(R),
                temperature=float(text_temperature),
                min_p=float(text_min_p), R=R, k=k,
                stop_ids=stop_ids,
            )
            payload = np.asarray(payload)  # one host fetch per chunk
            toks_e = payload[:, :k]
            emits = payload[:, k:].astype(bool)
            for i in stream:
                r = reqs[i]
                m = int(emits[i].sum())  # rows are active on a prefix
                r.tok_count += m  # streamed = one per active step
                r.slots_used += m
                if r.parked or r.done:
                    r.pending = None  # som flushed / eos never continued
                else:
                    for j in range(m):
                        consume(r, i, int(toks_e[i, j]))
                        if r.done or r.parked:
                            break

        # ---- ODE: parked requests grouped by (modality, shape) ----------
        groups = {}
        for i, r in enumerate(reqs):
            if live(r) and r.parked and r.pending is None:
                groups.setdefault((r.mid, r.shape), []).append(i)
        for (mid, shape), members in groups.items():
            mc = model.modalities[mid]
            spatial = tuple(shape)
            seq_shape = model.seq_shape_for(mid, spatial)
            L = int(math.prod(seq_shape))

            if any(reqs[i].slots_used + L + 2 > cap for i in members):
                # capacity exhausted: rebuild the whole pool at a larger cap
                cap = _round_up(
                    max(r.slots_used for r in reqs) + L + 256, 128
                )
                for r in reqs:
                    r.tok_count, r.collapse = _seq_stats(model, r.items)
                last_logits, cache = prefill(cap)

            noise = np.zeros((R, *spatial, mc.dim_latent), np.float32)
            member_mask = np.zeros(rows, bool)
            p0 = np.zeros(rows, np.int32)
            for i, r in enumerate(reqs):
                p0[i] = r.tok_count - r.collapse
                if use_cfg:
                    p0[R + i] = p0[i]
            for i in members:
                r = reqs[i]
                member_mask[i] = True
                if use_cfg:
                    member_mask[R + i] = True
                if init_modality_noise is not None:
                    flat = np.asarray(init_modality_noise)[
                        : int(math.prod(spatial)), : mc.dim_latent
                    ]
                    noise[i] = np.asarray(flat).reshape(
                        *spatial, mc.dim_latent
                    )
                else:
                    nk = jax.random.fold_in(
                        jax.random.fold_in(
                            jax.random.fold_in(rng, 0x6E0), i
                        ),
                        r.n_segments,
                    )
                    noise[i] = np.asarray(
                        jax.random.normal(nk, (*spatial, mc.dim_latent))
                    )

            fn = model._get_jit(
                "sampleb_ode", functools.partial(_ode_impl, model),
                static_argnames=("mid", "L", "steps", "use_cfg", "R"),
            )
            sampled = fn(
                params, cache, jnp.asarray(noise),
                jnp.asarray(p0), jnp.asarray(member_mask),
                jnp.float32(cfg_scale),
                mid=mid, L=L, steps=int(modality_steps),
                use_cfg=use_cfg, R=R,
            )

            fn = model._get_jit(
                "sampleb_append", functools.partial(_append_impl, model),
                static_argnames=("mid", "L", "R"),
                donate_argnums=(1,),  # cache buffers update in place
            )
            cache = fn(
                params, cache, sampled, jnp.asarray(p0),
                jnp.asarray(member_mask), mid=mid, L=L, R=R,
            )
            sampled_np = np.asarray(sampled)  # one fetch per group

            for i in members:
                r = reqs[i]
                r.items.append(
                    (mid, to_user_layout(
                        sampled_np[i], mc.channel_first_latent
                    ))
                )
                r.items.append(
                    np.asarray([model.eom_ids[mid]], np.int32)
                )
                r.tok_count += L
                r.collapse += L - 1
                r.slots_used += L
                r.curr_length += L
                r.n_segments += 1
                r.pending = model.eom_ids[mid]  # streamed by the next tick
                r.parked = False
                r.mid = None
                r.shape = None

    if return_unprocessed_modalities:
        return [r.items for r in reqs]
    return [model.decode_modalities(r.items) for r in reqs]

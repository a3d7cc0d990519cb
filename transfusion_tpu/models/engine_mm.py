"""Continuous-batching MULTIMODAL serving engine.

`ServingEngine` (models/engine.py) continuously batches text-only requests;
`sample_batch` (models/sample_batch.py) batches a FIXED set of R full
`sample()` state machines. This module closes the square: a slot-pool
engine whose requests are full multimodal `sample()` calls — AR text,
som-triggered flow-ODE image segments, shape-meta parsing, CFG — admitted
into free slots as they arrive and retired the moment they finish. A deep
queue of mixed text+image requests keeps every cache row busy instead of
waiting for the slowest member of a fixed wave.

The reference's flagship `sample()` is strictly batch-1 (ref
transfusion.py:1625-1948) and it has no serving stack at all; this engine
is the production story for that API.

Design (all device machinery reused from sample_batch — same jit names, so
an engine and sample_batch calls on one model share compiled traces):

- ONE pool cache of `max_requests` slots (rows [0..R) = conditional
  streams; with CFG, rows [R..2R) their unconditional twins).
- **Admission**: queued requests are paired with free slots, grouped by
  prompt-width bucket, and each group's cond+uncond prompts prefill as ONE
  rectangle through the joint prefill path (`_prefill_impl`), then scatter
  (K/V, scales, validity mask, per-row idx, last logits) into the pool —
  one dispatch per (width, group-size).
- **Text phase**: every text-phase slot advances in ONE chunked lax.scan
  dispatch (`_chunk_tick_impl`) with in-scan stopping at som/eos/budget;
  slots in other phases ride along bit-inert.
- **Modality phase**: parked slots group by (modality, shape); each group
  integrates its tail ODE as ONE batched dispatch over the pool
  (`_ode_impl` — the member subset is data, so co-scheduling never
  recompiles), then conditions the sampled segment into the member caches.
- **Retirement**: a slot frees (and the queue refills it) the moment its
  request hits eos or max_length.

RNG folds by REQUEST id, not slot: text keys fold (base, rid, #sampled),
modality noise folds (base, rid, #segments) — a request's output is
reproducible no matter which slot it lands in or what it is co-scheduled
with (tested).

Capacity: the pool allocates `max_seq_len` slots per row up front (use
`for_workload` to size it). If a request's next segment would overflow,
the pool REBUILDS at a larger capacity (one re-prefill of all live rows +
recompile of the per-cap traces) — correct but expensive mid-serve, so
size the pool right for production.
"""

from __future__ import annotations

import math
import time
from collections import deque
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from transfusion_tpu.models.sample_batch import (
    _Req,
    _append_impl,
    _chunk_tick_impl,
    _consume,
    _ode_impl,
    _pick_impl,
    _round_up,
    _seq_stats,
    _transition,
    _uncond_of,
)
from transfusion_tpu.utils.helpers import default


def _bucket_len(n: int, mult: int) -> int:
    """Pow2 multiple of pad_multiple >= n (sample_batch's trace bucketing)."""
    chunks = max(1, -(-int(n) // mult))
    return mult * (1 << (chunks - 1).bit_length())


def _admit_impl(
    model, params, pool, pool_logits, packed, slots_c, slots_all,
    *, cap, quantize, transposed,
):
    """Prefill a group of admitted prompts (cond rows then uncond twins)
    through the joint path and scatter the rows into the pool at their
    slots — one dispatch per admission group."""
    last, side = model._prefill_impl(
        params, packed, cap=cap, quantize=quantize, transposed=transposed
    )
    kv_keys = [
        k for k in ("k", "v", "kT", "vT", "k_scale", "v_scale") if k in pool
    ]
    pool = dict(pool)
    for kk in kv_keys:
        pool[kk] = pool[kk].at[:, slots_all].set(side[kk])
    pool["mask"] = pool["mask"].at[slots_all].set(side["mask"])
    pool["idx"] = pool["idx"].at[slots_all].set(
        packed.lengths.astype(jnp.int32)
    )
    nb = slots_c.shape[0]
    pool_logits = pool_logits.at[slots_c].set(last[:nb].astype(jnp.float32))
    return pool, pool_logits


class _MMSlot:
    __slots__ = ("rid", "req", "max_length")

    def __init__(self, rid, req, max_length):
        self.rid = rid
        self.req = req
        self.max_length = max_length


class FinishedRequest:
    __slots__ = ("rid", "items", "output")

    def __init__(self, rid, items, output):
        self.rid = rid
        self.items = items  # raw sample items (text arrays + (mid, latent))
        self.output = output  # decoded (post modality-decoder) items


class MultimodalServingEngine:
    def __init__(
        self,
        model,
        params,
        *,
        max_requests: int,
        max_seq_len: int,
        cfg_scale: float = 3.0,
        modality_steps: int = 16,
        text_temperature: float = 1.5,
        text_min_p: float = 0.1,
        fixed_modality_shape: Optional[tuple] = None,
        init_modality_noise=None,  # pinned segment noise (parity testing)
        text_chunk: int = 64,  # MAX text tokens per decode dispatch; the
        # actual chunk is chosen per tick by the fitted dispatch-cost model
        # (choose_chunk over the pow2 ladder, capped by the observed
        # text-segment-length EWMA — segments end at som, so streaming past
        # the expected som is wasted scan compute)
        kv_quantize: Optional[bool] = None,
        return_unprocessed_modalities: bool = False,
        rng=None,
        metrics=None,  # optional training.metrics.MetricsLogger: per-tick
        # JSONL (admitted/retired/chunk k/cost residual/ode groups)
    ):
        assert model.num_text_tokens > 0, (
            "the multimodal engine drives sample()'s AR text machinery — "
            "use generate_modality_only (already batched) for pure-modality "
            "models"
        )
        from transfusion_tpu.models.transformer import make_kv_cache

        self.model = model
        self.params = params
        self.R = int(max_requests)
        self.cfg_scale = float(cfg_scale)
        self.use_cfg = self.cfg_scale != 1.0
        self.rows = 2 * self.R if self.use_cfg else self.R
        self.modality_steps = int(modality_steps)
        self.text_temperature = float(text_temperature)
        self.text_min_p = float(text_min_p)
        self.fixed_modality_shape = fixed_modality_shape
        self.init_modality_noise = init_modality_noise
        self.text_chunk = int(text_chunk)
        self._kv_quantize_arg = kv_quantize
        self.return_unprocessed = bool(return_unprocessed_modalities)
        self.rng = default(rng, jax.random.PRNGKey(0))

        self.cap = _round_up(max(int(max_seq_len), 128), 128)
        self._quantize, self._transposed = model._resolve_serving_plan(
            self.cap, self.rows, kv_quantize
        )
        cfg = model.transformer_cfg
        cache = make_kv_cache(
            cfg["depth"], self.rows, cfg.get("heads", 8), self.cap,
            cfg.get("dim_head", 64), dtype=model.dtype, track_mask=True,
            quantize="int8" if self._quantize else None,
            transposed=self._transposed,
        )
        cache["idx"] = jnp.zeros((self.rows,), jnp.int32)
        cache["mask"] = jnp.zeros((self.rows, self.cap), bool)
        self.cache = cache
        self.last_logits = jnp.zeros((self.R, model.vocab_size), jnp.float32)

        # in-scan stop set: som triggers + eos
        stop_ids = tuple(int(s) for s in model.som_ids)
        if model.eos_id is not None:
            stop_ids = stop_ids + (int(model.eos_id),)
        self._stop_ids = stop_ids

        self.queue: deque = deque()
        self.slots: list = [None] * self.R
        self._next_rid = 0
        self.stats = {
            "admitted": 0, "finished": 0, "text_tokens": 0,
            "modality_tokens": 0, "text_chunks": 0, "ode_dispatches": 0,
            "rebuilds": 0,
        }
        # measured dispatch-cost model (same scheme as ServingEngine):
        # per-bucket (k, elapsed) chunk samples, first sample per bucket
        # excluded (it contains that static length's jit compile); ODE
        # costs per (mid, shape) — one grouped dispatch serves every
        # parked member, so its cost is workload-independent data
        self._chunk_samples = {}
        self._rtt_est = 0.030
        self._step_est = 0.002
        self._ode_samples = {}  # (mid, shape) -> [seconds, ...]
        self._cost_frozen = False
        # EWMA of observed text-segment lengths (tokens from segment start
        # to som/eos) — caps the chunk chooser's per-row useful-token
        # estimate; None until the first segment completes
        self._seg_ewma = None
        self._seg_start = {}  # rid -> n_sampled at current segment start
        self.metrics = metrics
        self._tick = 0

    @classmethod
    def for_workload(
        cls, model, params, prompts, max_length, *, max_requests, **kw
    ):
        """Engine sized so no prompt in `prompts` (each budgeted
        `max_length` sampled tokens) can overflow the pool — the
        sample_batch capacity formula, applied over the workload."""
        need = 0
        for p in prompts:
            items = model._prompt_to_items(p)
            tc, _ = _seq_stats(model, items)
            need = max(need, tc + int(max_length) + 256 + 2)
        return cls(
            model, params, max_requests=max_requests, max_seq_len=need, **kw
        )

    # ------------------------------------------------------------------

    def submit(self, prompt, max_length: int = 2048) -> int:
        items = self.model._prompt_to_items(prompt)
        tc, co = _seq_stats(self.model, items)
        assert tc + 2 <= self.cap, (
            f"prompt ({tc} tokens) cannot fit the pool capacity {self.cap} "
            f"— raise max_seq_len"
        )
        rid = self._next_rid
        self._next_rid += 1
        req = _Req(items, tc, co)
        self.queue.append(_MMSlot(rid, req, int(max_length)))
        return rid

    @property
    def has_work(self) -> bool:
        return bool(self.queue) or any(s is not None for s in self.slots)

    # ------------------------------------------------------------------

    @staticmethod
    def _pow2_splits(n: int):
        """Split a group of n into pow2-sized subgroups (largest first):
        bounds the compiled (width, nb) admission-trace set to
        O(log R x log widths), all warmable by `warmup()` — an arbitrary
        nb would compile a fresh prefill trace mid-serve."""
        out = []
        while n > 0:
            p = 1 << (n.bit_length() - 1)
            out.append(p)
            n -= p
        return out

    def _admit_pending(self):
        mult = self.model.pad_multiple
        groups = {}
        for slot in range(self.R):
            if not self.queue:
                break
            if self.slots[slot] is not None:
                continue
            ent = self.queue.popleft()
            groups.setdefault(
                _bucket_len(max(ent.req.tok_count, 1), mult), []
            ).append((slot, ent))
        subgroups = []
        for width, pairs in groups.items():
            i = 0
            for sz in self._pow2_splits(len(pairs)):
                subgroups.append((width, pairs[i : i + sz]))
                i += sz
        for width, pairs in subgroups:
            batch_items = [ent.req.items for _, ent in pairs]
            if self.use_cfg:
                batch_items += [
                    _uncond_of(self.model, ent.req.items) for _, ent in pairs
                ]
            packed = self.model.pack(
                batch_items, wrap_sos_eos=False, add_meta=False,
                pad_multiple=width,
            )
            slots_c = np.asarray([s for s, _ in pairs], np.int32)
            slots_all = (
                np.concatenate([slots_c, self.R + slots_c])
                if self.use_cfg
                else slots_c
            )
            fn = self.model._get_jit(
                "mmeng_admit", partial(_admit_impl, self.model),
                static_argnames=("cap", "quantize", "transposed"),
                donate_argnums=(1, 2),
            )
            self.cache, self.last_logits = fn(
                self.params, self.cache, self.last_logits,
                jax.tree.map(jnp.asarray, packed),
                jnp.asarray(slots_c), jnp.asarray(slots_all),
                cap=self.cap, quantize=bool(self._quantize),
                transposed=self._transposed,
            )
            for (slot, ent), ln in zip(pairs, np.asarray(packed.lengths)):
                ent.req.slots_used = int(ln)
                ent.req.pending = None
                _transition(self.model, ent.req, self.fixed_modality_shape)
                self.slots[slot] = ent
                self._seg_start[ent.rid] = 0
                self.stats["admitted"] += 1

    def _rebuild(self, new_cap: int):
        """Re-prefill every live row at a larger capacity. Correct but
        expensive (recompiles the per-cap traces) — size max_seq_len /
        for_workload so this never fires in production."""
        model = self.model
        self.cap = _round_up(new_cap, 128)
        self._quantize, self._transposed = model._resolve_serving_plan(
            self.cap, self.rows, self._kv_quantize_arg
        )
        dummy = [np.asarray([model.sos_id], np.int32)]
        batch_items = []
        for slot in range(self.R):
            ent = self.slots[slot]
            batch_items.append(ent.req.items if ent else list(dummy))
        if self.use_cfg:
            batch_items += [
                _uncond_of(model, items) for items in batch_items[: self.R]
            ]
        width = _bucket_len(
            max(_seq_stats(model, it)[0] for it in batch_items),
            model.pad_multiple,
        )
        packed = model.pack(
            batch_items, wrap_sos_eos=False, add_meta=False,
            pad_multiple=width,
        )
        fn = model._get_jit(
            "sample_prefill", model._prefill_impl,
            static_argnames=("cap", "quantize", "transposed"),
        )
        last, cache = fn(
            self.params, jax.tree.map(jnp.asarray, packed), cap=self.cap,
            quantize=bool(self._quantize), transposed=self._transposed,
        )
        lengths = np.asarray(packed.lengths, np.int32)
        self.cache = {**cache, "idx": jnp.asarray(lengths)}
        self.last_logits = last[: self.R].astype(jnp.float32)
        for slot in range(self.R):
            ent = self.slots[slot]
            if ent is None:
                continue
            r = ent.req
            r.tok_count, r.collapse = _seq_stats(model, r.items)
            r.slots_used = int(lengths[slot])
            r.pending = None  # live text rows re-pick from the fresh
            # logits with the SAME (rid, n_sampled) fold key the streamed
            # path would have used — identical semantics (sample_batch's
            # capacity-rebuild contract, tested there)
        self.stats["rebuilds"] += 1

    # ------------------------------------------------------------------

    def _retire_overlong(self):
        for ent in self.slots:
            if ent and not ent.req.done and ent.req.curr_length > ent.max_length:
                ent.req.done = True

    def _text_key(self, rid, n_sampled):
        return jax.random.fold_in(
            jax.random.fold_in(self.rng, rid), n_sampled
        )

    # ------------------------------------------------------------------
    # measured dispatch-cost model (VERDICT r4 #2: the text engine's
    # warmup/chunk-chooser/auto-dispatch stack, ported)
    # ------------------------------------------------------------------

    def _fit_cost_model(self):
        """Least-squares (rtt, step) from clean chunk timings — same
        estimator as ServingEngine._fit_cost_model."""
        pts = []
        for k, ts in self._chunk_samples.items():
            pts.extend((k, t) for t in ts[1:])
        if len({k for k, _ in pts}) >= 2 and len(pts) >= 3:
            ks = np.array([p[0] for p in pts], np.float64)
            ts = np.array([p[1] for p in pts], np.float64)
            step, rtt = np.polyfit(ks, ts, 1)
            if step > 0 and rtt > 0:
                self._step_est, self._rtt_est = float(step), float(rtt)

    def _note_segment(self, rid: int, n_sampled: int):
        """A request's text segment just ended (som park / eos / budget):
        fold its length into the segment-length EWMA that caps the chunk
        chooser."""
        seg = n_sampled - self._seg_start.get(rid, 0)
        self._seg_start[rid] = n_sampled
        if seg <= 0:
            return
        if self._seg_ewma is None:
            self._seg_ewma = float(seg)
        else:
            self._seg_ewma = 0.8 * self._seg_ewma + 0.2 * float(seg)

    def _seg_cap(self) -> Optional[int]:
        """Expected useful tokens per streaming row before its som lands
        (1.5x EWMA + headroom; None until a segment has been observed)."""
        if self._seg_ewma is None:
            return None
        return max(4, int(self._seg_ewma * 1.5) + 2)

    def _chunk_len(self, stream) -> int:
        """Adaptive text-chunk length: maximize useful tokens/sec under the
        fitted rtt + k*step dispatch cost (engine.choose_chunk), with each
        row's useful-token estimate capped at its budget AND the observed
        segment-length EWMA (rows stop in-scan at som — streaming far past
        the expected som is pure wasted scan compute)."""
        from transfusion_tpu.models.engine import choose_chunk

        if not self._cost_frozen:
            self._fit_cost_model()
        cap = self._seg_cap()
        rem = []
        for i in stream:
            ent = self.slots[i]
            r = ent.req
            if r.parked or r.done:
                rem.append(1)  # flush-only row
                continue
            b = ent.max_length - r.curr_length + 1
            rem.append(min(b, cap) if cap is not None else b)
        return choose_chunk(
            rem, self._rtt_est, self._step_est, self.text_chunk
        )

    def ode_cost(self, mid=0, shape=None) -> Optional[float]:
        """Measured seconds for one grouped ODE dispatch (integrate +
        condition + fetch) at (mid, shape); falls back to the mean over all
        measured groups, then None (unmeasured — run warmup(shapes=...))."""
        if shape is not None:
            ts = self._ode_samples.get((mid, tuple(shape)))
            if ts:
                return float(np.mean(ts))
        all_ts = [t for ts in self._ode_samples.values() for t in ts]
        return float(np.mean(all_ts)) if all_ts else None

    def warmup(self, shapes=None, prompt_widths=None, group_sizes=None):
        """Precompile every trace the serve loop can request and fit the
        dispatch-cost model; freeze it so chunk plans stay deterministic.

        Without warmup, the fitted chunk chooser can request a chunk
        length no prior tick compiled — a multi-second remote compile
        landing mid-serve (the r4 text-engine lesson). Warms:

        * the text-chunk ladder (every pow2 k <= text_chunk), timed inert
          (active mask all-False) — fits (rtt, step);
        * the pick trace;
        * one grouped ODE + conditioning trace per (mid, shape) in
          `shapes` (default: every modality's default shape), timed inert
          — the ODE leg of the cost model;
        * admission prefill traces for every (width, pow2 group size)
          in `prompt_widths` x `group_sizes` (defaults: the pad_multiple
          bucket x all pow2 sizes <= max_requests), run against a
          THROWAWAY copy of the pool so live state is untouched.
        """
        model, R, rows = self.model, self.R, self.rows

        # ---- text chunk ladder ----
        toks0 = jnp.zeros((R,), jnp.int32)
        pos0 = jnp.zeros((rows,), jnp.int32)
        inert = jnp.zeros((R,), bool)
        rem = jnp.ones((R,), jnp.int32)
        k = 1
        while k <= self.text_chunk:
            fn = model._get_jit(
                "sampleb_chunk", partial(_chunk_tick_impl, model),
                static_argnames=(
                    "temperature", "min_p", "R", "k", "stop_ids"
                ),
                donate_argnums=(1,),
            )
            for first in (True, False):
                t0 = time.perf_counter()
                payload, self.cache = fn(
                    self.params, self.cache, toks0, pos0, inert, rem,
                    self.rng, toks0, toks0,
                    temperature=self.text_temperature,
                    min_p=self.text_min_p,
                    R=R, k=k, stop_ids=self._stop_ids,
                )
                np.asarray(payload)  # force completion (tunnel ack)
                if not first:
                    self._chunk_samples.setdefault(k, []).extend(
                        [0.0, time.perf_counter() - t0]
                    )
            k <<= 1
        self._fit_cost_model()

        # ---- pick trace ----
        fn = model._get_jit(
            "sampleb_pick", partial(_pick_impl, model),
            static_argnames=("temperature", "min_p"),
        )
        np.asarray(fn(
            self.last_logits, jnp.stack([jax.random.PRNGKey(0)] * R),
            temperature=self.text_temperature, min_p=self.text_min_p,
        ))

        # ---- grouped ODE per (mid, shape) ----
        if shapes is None:
            shapes = [
                (mid, tuple(mc.default_shape))
                for mid, mc in enumerate(model.modalities)
                if mc.default_shape is not None
            ]
        for mid, shape in shapes:
            mc = model.modalities[mid]
            spatial = tuple(shape)
            L = int(math.prod(model.seq_shape_for(mid, spatial)))
            noise = jnp.zeros((R, *spatial, mc.dim_latent), jnp.float32)
            member = jnp.zeros((rows,), bool)
            p0 = jnp.zeros((rows,), jnp.int32)
            ofn = model._get_jit(
                "sampleb_ode", partial(_ode_impl, model),
                static_argnames=("mid", "L", "steps", "use_cfg", "R"),
            )
            afn = model._get_jit(
                "sampleb_append", partial(_append_impl, model),
                static_argnames=("mid", "L", "R"),
                donate_argnums=(1,),
            )
            for first in (True, False):
                t0 = time.perf_counter()
                sampled = ofn(
                    self.params, self.cache, noise, p0, member,
                    jnp.float32(self.cfg_scale),
                    mid=mid, L=L, steps=self.modality_steps,
                    use_cfg=self.use_cfg, R=R,
                )
                self.cache = afn(
                    self.params, self.cache, sampled, p0, member,
                    mid=mid, L=L, R=R,
                )
                np.asarray(sampled)
                if not first:
                    self._ode_samples.setdefault(
                        (mid, spatial), []
                    ).append(time.perf_counter() - t0)

        # ---- admission traces against a throwaway pool copy ----
        if prompt_widths is None:
            prompt_widths = [
                _bucket_len(1, model.pad_multiple)
            ]
        if group_sizes is None:
            group_sizes, g = [], 1
            while g <= R:
                group_sizes.append(g)
                g <<= 1
        dummy = np.asarray([model.sos_id], np.int32)
        for width in prompt_widths:
            for nb in group_sizes:
                batch_items = [[dummy.copy()] for _ in range(nb)]
                if self.use_cfg:
                    batch_items += [
                        _uncond_of(model, it) for it in batch_items[:nb]
                    ]
                packed = model.pack(
                    batch_items, wrap_sos_eos=False, add_meta=False,
                    pad_multiple=width,
                )
                slots_c = np.arange(nb, dtype=np.int32)
                slots_all = (
                    np.concatenate([slots_c, R + slots_c])
                    if self.use_cfg
                    else slots_c
                )
                fn = model._get_jit(
                    "mmeng_admit", partial(_admit_impl, model),
                    static_argnames=("cap", "quantize", "transposed"),
                    donate_argnums=(1, 2),
                )
                scratch = {
                    kk: jnp.array(v, copy=True)
                    for kk, v in self.cache.items()
                }
                scratch_logits = jnp.array(self.last_logits, copy=True)
                out_pool, out_logits = fn(
                    self.params, scratch, scratch_logits,
                    jax.tree.map(jnp.asarray, packed),
                    jnp.asarray(slots_c), jnp.asarray(slots_all),
                    cap=self.cap, quantize=bool(self._quantize),
                    transposed=self._transposed,
                )
                np.asarray(out_logits)  # force; then discard the copy

        self._cost_frozen = True

    def serve(
        self, prompts, max_length, *,
        expected_segments=1.0, plan_only: bool = False,
    ):
        """Auto-dispatched multimodal batch serving: choose continuous
        batching or fixed `sample_batch` waves from the fitted dispatch
        cost model (serving.plan_dispatch_mm) and return one decoded
        result list per prompt, in order.

        max_length / expected_segments may be scalars or per-prompt
        sequences — budget skew is exactly what the planner weighs (waves
        pay every member the wave max; the engine refills freed slots).
        Requires warmup() for a measured ODE cost — unmeasured engines
        plan with a conservative default. plan_only=True returns just the
        decision string ('engine' | 'waves') without serving.
        """
        from transfusion_tpu.models.sample_batch import sample_batch
        from transfusion_tpu.models.serving import plan_dispatch_mm

        n = len(prompts)
        if isinstance(max_length, (int, float)):
            max_lengths = [int(max_length)] * n
        else:
            max_lengths = [int(v) for v in max_length]
            assert len(max_lengths) == n, (len(max_lengths), n)
        if isinstance(expected_segments, (int, float)):
            exp_segs = [float(expected_segments)] * n
        else:
            exp_segs = [float(v) for v in expected_segments]
            assert len(exp_segs) == n, (len(exp_segs), n)
        # text budget per request ~= total budget minus expected modality
        # tokens (each segment occupies L slots of the length budget)
        L_est = 0
        if self.model.modalities:
            mid0 = 0
            shp = (
                tuple(self.fixed_modality_shape)
                if self.fixed_modality_shape is not None
                else tuple(self.model.modalities[mid0].default_shape or ())
            )
            if shp:
                L_est = int(
                    math.prod(self.model.seq_shape_for(mid0, shp))
                )
        ode_s = self.ode_cost()
        reqs = [
            (max(8, ml - int(es * L_est)), es)
            for ml, es in zip(max_lengths, exp_segs)
        ]
        plan = plan_dispatch_mm(
            reqs, self.R, self._rtt_est, self._step_est,
            ode_s if ode_s is not None else 0.5,
            max_chunk=self.text_chunk, seg_cap=self._seg_cap(),
            seg_tokens=L_est,
        )
        if plan_only:
            return plan
        if plan == "waves":
            # LPT-style wave formation: group similar budgets into the same
            # wave (stable sort, budget-descending) so each wave's members
            # drain together — a cheap request never shares a wave with a
            # long pole it must idle behind. Results are restored to
            # submission order.
            order = sorted(
                range(len(prompts)), key=lambda i: (-max_lengths[i], i)
            )
            out = [None] * len(prompts)
            for i in range(0, len(order), self.R):
                idxs = order[i : i + self.R]
                outs = sample_batch(
                    self.model, self.params, [prompts[j] for j in idxs],
                    rng=self.rng,
                    max_length=[max_lengths[j] for j in idxs],
                    text_temperature=self.text_temperature,
                    text_min_p=self.text_min_p,
                    fixed_modality_shape=self.fixed_modality_shape,
                    init_modality_noise=self.init_modality_noise,
                    modality_steps=self.modality_steps,
                    cfg_scale=self.cfg_scale,
                    kv_quantize=self._kv_quantize_arg,
                    return_unprocessed_modalities=self.return_unprocessed,
                    text_chunk=self.text_chunk,
                )
                for j, o in zip(idxs, outs):
                    out[j] = o
            return out
        # static pool: admit longest-first (same LPT ordering as the waves
        # branch) — freed slots then backfill with cheap requests while the
        # long poles stream, instead of poles arriving staggered behind a
        # FIFO of cheap work. Streaming submit()/run() use remains
        # arrival-ordered; results are restored to submission order.
        order = sorted(
            range(len(prompts)), key=lambda i: (-max_lengths[i], i)
        )
        rids = [None] * len(prompts)
        for i in order:
            rids[i] = self.submit(prompts[i], max_lengths[i])
        by_rid = {f.rid: f.output for f in self.run()}
        return [by_rid[rid] for rid in rids]

    def step(self):
        """One engine tick: admit, advance text rows one chunk, integrate
        one round of modality groups, retire. Returns FinishedRequests."""
        model, R, rows = self.model, self.R, self.rows
        admitted_before = self.stats["admitted"]
        tick_chunk_k, tick_chunk_s, tick_ode = 0, 0.0, 0
        self._admit_pending()
        n_admitted = self.stats["admitted"] - admitted_before
        live = [
            i for i in range(R)
            if self.slots[i] is not None and not self.slots[i].req.done
        ]
        if not live:
            return self._collect_finished()
        self._retire_overlong()

        # ---- pick: text-phase slots with no pending (post-admission /
        # post-rebuild) sample from the stored logits --------------------
        need_pick = [
            i for i in live
            if not self.slots[i].req.done
            and not self.slots[i].req.parked
            and self.slots[i].req.pending is None
        ]
        if need_pick:
            keys = [jax.random.PRNGKey(0)] * R
            for i in need_pick:
                ent = self.slots[i]
                keys[i] = self._text_key(ent.rid, ent.req.n_sampled)
            fn = model._get_jit(
                "sampleb_pick", partial(_pick_impl, model),
                static_argnames=("temperature", "min_p"),
            )
            picks = np.asarray(fn(
                self.last_logits, jnp.stack(keys),
                temperature=self.text_temperature, min_p=self.text_min_p,
            ))
            for i in need_pick:
                ent = self.slots[i]
                _consume(
                    model, ent.req, int(picks[i]), self.fixed_modality_shape
                )
                self.stats["text_tokens"] += 1
                if ent.req.done or ent.req.parked:
                    self._note_segment(ent.rid, ent.req.n_sampled)
            self._retire_overlong()

        # ---- chunked text decode (in-scan stop at som/eos/budget) ------
        stream = [
            i for i in live
            if self.slots[i].req.pending is not None
        ]
        if stream:
            toks0 = np.zeros(R, np.int32)
            pos0 = np.zeros(rows, np.int32)
            act0 = np.zeros(R, bool)
            rem = np.zeros(R, np.int32)
            cnt0 = np.zeros(R, np.int32)
            seeds = np.zeros(R, np.int32)
            for i in stream:
                ent = self.slots[i]
                r = ent.req
                toks0[i] = r.pending
                pos0[i] = r.tok_count - r.collapse
                act0[i] = True
                rem[i] = (
                    1 if (r.parked or r.done)
                    else ent.max_length - r.curr_length + 1
                )
                cnt0[i] = r.n_sampled
                seeds[i] = ent.rid
                if self.use_cfg:
                    pos0[R + i] = pos0[i]
            k = self._chunk_len(stream)
            fn = model._get_jit(
                "sampleb_chunk", partial(_chunk_tick_impl, model),
                static_argnames=(
                    "temperature", "min_p", "R", "k", "stop_ids"
                ),
                donate_argnums=(1,),
            )
            t0 = time.perf_counter()
            payload, self.cache = fn(
                self.params, self.cache, jnp.asarray(toks0),
                jnp.asarray(pos0), jnp.asarray(act0), jnp.asarray(rem),
                self.rng, jnp.asarray(cnt0), jnp.asarray(seeds),
                temperature=self.text_temperature, min_p=self.text_min_p,
                R=R, k=k, stop_ids=self._stop_ids,
            )
            payload = np.asarray(payload)  # one host fetch per chunk
            elapsed = time.perf_counter() - t0
            if not self._cost_frozen:
                self._chunk_samples.setdefault(k, []).append(elapsed)
            tick_chunk_k, tick_chunk_s = k, elapsed
            toks_e = payload[:, :k]
            emits = payload[:, k:].astype(bool)
            self.stats["text_chunks"] += 1
            for i in stream:
                ent = self.slots[i]
                r = ent.req
                m = int(emits[i].sum())
                r.tok_count += m
                r.slots_used += m
                if r.parked or r.done:
                    r.pending = None  # som flushed / eos never continued
                else:
                    for j in range(m):
                        _consume(
                            model, r, int(toks_e[i, j]),
                            self.fixed_modality_shape,
                        )
                        self.stats["text_tokens"] += 1
                        if r.done or r.parked:
                            self._note_segment(ent.rid, r.n_sampled)
                            break
            self._retire_overlong()

        # ---- ODE: parked slots grouped by (modality, shape) ------------
        groups = {}
        for i in live:
            r = self.slots[i].req
            if not r.done and r.parked and r.pending is None:
                groups.setdefault((r.mid, r.shape), []).append(i)
        for (mid, shape), members in groups.items():
            mc = model.modalities[mid]
            spatial = tuple(shape)
            L = int(math.prod(model.seq_shape_for(mid, spatial)))

            if any(
                self.slots[i].req.slots_used + L + 2 > self.cap
                for i in members
            ):
                self._rebuild(
                    max(
                        ent.req.slots_used
                        for ent in self.slots
                        if ent is not None
                    )
                    + L + 256
                )
                # rebuilt rows re-pick next tick; park states preserved
            noise = np.zeros((R, *spatial, mc.dim_latent), np.float32)
            member_mask = np.zeros(rows, bool)
            p0 = np.zeros(rows, np.int32)
            for i in range(R):
                ent = self.slots[i]
                if ent is not None:
                    p0[i] = ent.req.tok_count - ent.req.collapse
                if self.use_cfg:
                    p0[R + i] = p0[i]
            for i in members:
                ent = self.slots[i]
                r = ent.req
                member_mask[i] = True
                if self.use_cfg:
                    member_mask[R + i] = True
                if self.init_modality_noise is not None:
                    flat = np.asarray(self.init_modality_noise)[
                        : int(math.prod(spatial)), : mc.dim_latent
                    ]
                    noise[i] = flat.reshape(*spatial, mc.dim_latent)
                else:
                    nk = jax.random.fold_in(
                        jax.random.fold_in(
                            jax.random.fold_in(self.rng, 0x6E0), ent.rid
                        ),
                        r.n_segments,
                    )
                    noise[i] = np.asarray(
                        jax.random.normal(nk, (*spatial, mc.dim_latent))
                    )

            fn = model._get_jit(
                "sampleb_ode", partial(_ode_impl, model),
                static_argnames=("mid", "L", "steps", "use_cfg", "R"),
            )
            t0 = time.perf_counter()
            sampled = fn(
                self.params, self.cache, jnp.asarray(noise),
                jnp.asarray(p0), jnp.asarray(member_mask),
                jnp.float32(self.cfg_scale),
                mid=mid, L=L, steps=self.modality_steps,
                use_cfg=self.use_cfg, R=R,
            )
            fn = model._get_jit(
                "sampleb_append", partial(_append_impl, model),
                static_argnames=("mid", "L", "R"),
                donate_argnums=(1,),
            )
            self.cache = fn(
                self.params, self.cache, sampled, jnp.asarray(p0),
                jnp.asarray(member_mask), mid=mid, L=L, R=R,
            )
            sampled_np = np.asarray(sampled)  # one fetch per group
            if not self._cost_frozen:
                self._ode_samples.setdefault((mid, spatial), []).append(
                    time.perf_counter() - t0
                )
            tick_ode += 1
            self.stats["ode_dispatches"] += 1

            from transfusion_tpu.data.packing import to_user_layout

            for i in members:
                r = self.slots[i].req
                r.items.append(
                    (mid, to_user_layout(
                        sampled_np[i], mc.channel_first_latent
                    ))
                )
                r.items.append(np.asarray([model.eom_ids[mid]], np.int32))
                r.tok_count += L
                r.collapse += L - 1
                r.slots_used += L
                r.curr_length += L
                r.n_segments += 1
                r.pending = model.eom_ids[mid]  # streamed next tick
                r.parked = False
                r.mid = None
                r.shape = None
                self.stats["modality_tokens"] += L
            self._retire_overlong()

        finished = self._collect_finished()
        if self.metrics is not None:
            self._tick += 1
            predicted = (
                self._rtt_est + tick_chunk_k * self._step_est
                if tick_chunk_k else 0.0
            )
            self.metrics.log(self._tick, {
                "admitted": n_admitted,
                "retired": len(finished),
                "chunk_k": tick_chunk_k,
                "chunk_seconds": tick_chunk_s,
                "cost_model_residual_s": tick_chunk_s - predicted,
                "ode_groups": tick_ode,
                "seg_ewma": self._seg_ewma or 0.0,
                "active_slots": sum(
                    1 for s in self.slots
                    if s is not None and not s.req.done
                ),
                "queue_depth": len(self.queue),
            })
        return finished

    def _collect_finished(self):
        finished = []
        for slot in range(self.R):
            ent = self.slots[slot]
            if ent is None or not ent.req.done:
                continue
            items = ent.req.items
            output = (
                items
                if self.return_unprocessed
                else self.model.decode_modalities(items)
            )
            finished.append(FinishedRequest(ent.rid, items, output))
            self.slots[slot] = None
            self.stats["finished"] += 1
        return finished

    def run(self, prompts=None, max_length: Optional[int] = None):
        """Drive until the queue and all slots drain. Optionally submit
        `prompts` (each budgeted `max_length`) first. Returns
        FinishedRequests in completion order."""
        if prompts is not None:
            assert max_length is not None
            for p in prompts:
                self.submit(p, max_length)
        out = []
        while self.has_work:
            out.extend(self.step())
        return out

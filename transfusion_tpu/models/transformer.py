"""The Transfusion transformer stack (flax.linen), TPU-first.

Parity target: reference transfusion.py:1035-1252 (`Transformer`). Features:
  * random-fourier time conditioning MLP (ref :1060-1064)
  * per-block AdaptiveWrapper (DiT adaLN / ada-LN-zero)
  * U-Net skip connections over the depth (UViT; ref :1079-1081, 1199-1212)
  * value residual from the first layer (ref :1190, 1224-1229)
  * hyper-connection multi-stream residuals (ref :1066-1070, 1185, 1243)
  * unified masking: causal, transfusion span mask, or none (modality-only)
  * preallocated KV ring-buffer cache: prefill and decode use the same code
    path; position validity is an explicit mask (XLA-friendly, no growing
    tensors)
  * optional per-block gradient checkpointing (`remat=True`) — activations
    are rematerialized in the backward pass, trading one extra forward for
    O(depth) activation memory (jax.checkpoint, absent in the reference)

The mask contract replaces the reference's mode flags (ref :1134-1168):
  - no cache: `causal=True` or `spans` builds the structural mask
  - cache passed: slot validity (the cache's explicit mask, or
    arange(N) < idx + n) is always applied; `causal` composes with absolute
    positions; spans/attn_mask are for prefill where the chunk covers the
    whole prefix.
Callers pass only the *tail* tokens when decoding with a cache (the reference
instead slices internally, ref :1161-1168).
"""

from __future__ import annotations

import logging
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from transfusion_tpu.models.layers import (
    AdaptiveWrapper,
    Attention,
    FeedForward,
    RMSNorm,
    random_fourier_embed,
)
from transfusion_tpu.ops.hyper_connections import (
    HyperConnection,
    expand_stream,
    reduce_stream,
)
from transfusion_tpu.ops.rope import rope_angles
from transfusion_tpu.ops.spans import spans_to_attn_mask, spans_to_is_any_modality

_logger = logging.getLogger(__name__)


def make_kv_cache(
    depth: int,
    batch: int,
    heads: int,
    max_len: int,
    dim_head: int,
    dtype=jnp.float32,
    track_mask: bool = False,
    quantize: Optional[str] = None,  # None | 'int8'
    transposed: bool = False,  # store K/V as [.., dim_head, max_len]
    # ("kT"/"vT") — the layout the Pallas decode kernel streams (sliced HBM
    # DMA needs a 128-aligned trailing dim; capacity is one, head_dim=64
    # is not). Use for attn_impl='flash' models; the dense path transposes
    # back on read.
):
    """Preallocated KV ring buffer for `depth` layers.

    track_mask=True adds an explicit per-slot validity mask Bool[b, max_len]
    so padded prefills work: the *caller* marks which freshly-written slots
    are real (update the mask before each forward); without it validity is
    simply arange(max_len) < idx + n.

    quantize='int8' stores K/V as int8 with a per-(token, head) float32
    scale (symmetric absmax quantization, applied post-RoPE at write time in
    `Attention`; scales live as [.., 1, max_len] so the decode kernel can
    stream them as legal lane tiles). Long-history decode is bound by
    streaming the cache from HBM, so halving its footprint (vs bf16; 4x vs
    f32) buys bandwidth directly; the Pallas decode kernel
    (ops/pallas_decode_kernel.py) dequantizes in-VMEM so the HBM traffic
    stays int8-wide. The reference has no serving path at all (its
    generate_text_only re-forwards the full prefix per token, ref
    transfusion.py:2015-2038).
    """
    if transposed:
        shape = (depth, batch, heads, dim_head, max_len)
        kk, vk = "kT", "vT"
    else:
        shape = (depth, batch, heads, max_len, dim_head)
        kk, vk = "k", "v"
    cache = {"idx": jnp.zeros((), jnp.int32)}
    if quantize is not None:
        assert quantize == "int8", quantize
        cache[kk] = jnp.zeros(shape, jnp.int8)
        cache[vk] = jnp.zeros(shape, jnp.int8)
        cache["k_scale"] = jnp.zeros(
            (depth, batch, heads, 1, max_len), jnp.float32
        )
        cache["v_scale"] = jnp.zeros(
            (depth, batch, heads, 1, max_len), jnp.float32
        )
    else:
        cache[kk] = jnp.zeros(shape, dtype)
        cache[vk] = jnp.zeros(shape, dtype)
    if track_mask:
        cache["mask"] = jnp.zeros((batch, max_len), bool)
    return cache


def cache_capacity(cache: dict) -> int:
    """Slot capacity of a cache from either layout."""
    if "kT" in cache:
        return cache["kT"].shape[-1]
    return cache["k"].shape[-2]


def cache_mark_valid(cache: dict, new_valid):
    """Mark the next chunk's slots valid: new_valid Bool[b, L] is written at
    the current idx (scalar, or Int[b] for per-row ragged offsets). Call
    before the forward that writes those slots."""
    if "mask" not in cache:
        return cache
    idx = cache["idx"]
    if jnp.ndim(idx) == 1:
        mask = jax.vmap(
            lambda m, nv, i: jax.lax.dynamic_update_slice(m, nv, (i,))
        )(cache["mask"], new_valid, idx)
    else:
        mask = jax.lax.dynamic_update_slice(
            cache["mask"], new_valid, (jnp.zeros((), jnp.int32), idx)
        )
    return {**cache, "mask": mask}


class TransformerBlock(nn.Module):
    """One (skip? -> attention -> feedforward) layer over the residual
    streams. All static configuration lives in attributes so the module can
    be wrapped with nn.remat; every call argument is an array / dict of
    arrays / None."""

    dim: int
    dim_head: int
    heads: int
    dropout: float
    ff_expansion_factor: float
    attn_softcap: float
    attn_gate_values: bool
    attn_laser: bool
    attn_impl: str
    streams: int
    fracs: int
    layer_index: int  # 0-based layer
    is_first: bool
    has_skip: bool
    modality_only: bool
    flash_causal: bool
    deterministic: bool
    fused_nomask: bool = False  # ring/cp full attention (no structural mask)
    prefill: bool = False  # cached prefill — see Attention
    fuse_projections: bool = True  # see Attention.fuse_projections
    mesh: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        s,  # [streams, b, n, dim]
        skip,  # like s | None
        cond,  # [b, n|1|I, 4*dim] | None
        cond_index,  # Int[b, n] | None — per-instance cond gather
        mask,  # Bool[b|1, 1, n, kv] | None
        rope,  # angles | None
        is_any_modality,  # Bool[b, n] | None
        value_residual,  # [b, h, n, dh] | None
        layer_cache,  # dict | None
        flash_spans,  # Int[b, m, 3] | None
        value_residual_valid=None,  # None | Bool[] — see Attention
        decode_bias=None,  # Float[b, 8, cap] | None — see Attention
        decode_lens=None,  # Int[b] | None — see Attention
    ):
        ind = self.layer_index

        if self.has_skip and skip is not None:
            residual = s
            s = (
                nn.Dense(
                    self.dim, use_bias=False, dtype=self.dtype,
                    name=f"skip_proj_{ind}",
                )(jnp.concatenate([s, skip], axis=-1))
                + residual
            )

        attn = Attention(
            dim=self.dim,
            dim_head=self.dim_head,
            heads=self.heads,
            dropout=self.dropout,
            softcap_value=self.attn_softcap,
            gate_values=self.attn_gate_values,
            laser=self.attn_laser,
            learned_value_residual_mix=not self.is_first,
            attn_impl=self.attn_impl,
            fuse_projections=self.fuse_projections,
            mesh=self.mesh,
            dtype=self.dtype,
            name=f"attn_{ind}",
        )
        ff = FeedForward(
            dim=self.dim,
            expansion_factor=self.ff_expansion_factor,
            dropout=self.dropout,
            dtype=self.dtype,
            name=f"ff_{ind}",
        )
        attn_wrapped = AdaptiveWrapper(
            fn=attn, dim=self.dim, dim_cond=self.dim * 4, dtype=self.dtype,
            name=f"attn_ada_{ind}",
        )
        ff_wrapped = AdaptiveWrapper(
            fn=ff, dim=self.dim, dim_cond=self.dim * 4, dtype=self.dtype,
            name=f"ff_ada_{ind}",
        )
        hc_attn = HyperConnection(
            dim=self.dim, streams=self.streams, fracs=self.fracs,
            layer_index=2 * ind, name=f"hc_attn_{ind}",
        )
        hc_ff = HyperConnection(
            dim=self.dim, streams=self.streams, fracs=self.fracs,
            layer_index=2 * ind + 1, name=f"hc_ff_{ind}",
        )

        flash_spec = None
        if flash_spans is not None or self.flash_causal or self.fused_nomask:
            flash_spec = {"spans": flash_spans, "causal": self.flash_causal}

        adaptive_kwargs = dict(
            cond=cond,
            cond_index=cond_index,
            modality_only=self.modality_only,
            is_any_modality=is_any_modality,
        )

        branch, s_mixed = hc_attn(s)
        attn_out, attn_values, new_cache = attn_wrapped(
            branch,
            mask=mask,
            rope=rope,
            cache=layer_cache,
            value_residual=value_residual,
            value_residual_valid=value_residual_valid,
            flash_spec=flash_spec,
            decode_bias=decode_bias,
            decode_lens=decode_lens,
            prefill=self.prefill,
            deterministic=self.deterministic,
            **adaptive_kwargs,
        )
        s = hc_attn(s_mixed, attn_out)

        branch, s_mixed = hc_ff(s)
        ff_out = ff_wrapped(
            branch, deterministic=self.deterministic, **adaptive_kwargs
        )
        s = hc_ff(s_mixed, ff_out)

        return s, attn_values, new_cache


class Transformer(nn.Module):
    dim: int
    depth: int
    dim_head: int = 64
    heads: int = 8
    dropout: float = 0.0
    ff_expansion_factor: float = 4.0
    attn_laser: bool = False
    unet_skips: bool = True
    num_residual_streams: int = 1
    num_residual_fracs: int = 4
    attn_impl: str = "dense"  # 'dense' | 'flash' | 'ring' | 'cp_allgather'
    mesh: Any = None  # jax.sharding.Mesh with a 'context' axis (ring/cp)
    attn_softcap: float = 50.0
    attn_gate_values: bool = True
    rope_theta: float = 10000.0
    fourier_seed: int = 0
    fuse_projections: bool = False  # one concatenated QK/V/mix/gates
    # matmul per attention — measured 3% slower end-to-end, see
    # Attention.fuse_projections
    remat: bool = False
    remat_policy: str = "full"  # 'full' | 'dots' — 'dots' saves matmul
    # outputs and rematerializes only elementwise ops in the backward
    # (jax.checkpoint_policies.dots_with_no_batch_dims_saveable): most of
    # full remat's memory win at a fraction of its recompute FLOPs
    dtype: Any = jnp.float32

    def _use_decode_kernel(self, cache, prefill, spans, attn_mask, causal, n):
        """Cached-decode steps route to the Pallas decode kernel when the
        mask reduces to per-slot validity: no structural spans/attn_mask, and
        causality only via the write index (single-token text decode).
        Exclusions on a kernel-layout cache are logged once per trace so a
        silently-dense serving path is visible (a LASER model, span-masked
        chunk, or multi-token step forfeits the kernel's 15-35% long-history
        win — docs_evidence.md serving table)."""
        if cache is None or prefill or self.attn_impl != "flash":
            return False
        if "kT" not in cache:
            return False  # kernel needs the transposed cache layout

        def _excluded(why):
            _logger.info(
                "decode kernel excluded for this cached step (%s) — "
                "falling back to the dense cached path", why,
            )
            return False

        if self.attn_laser:
            return _excluded("LASER attention")
        if spans is not None or attn_mask is not None:
            return _excluded("structural span/attention mask")
        if causal and n != 1:
            # per-row causality not expressible as a row bias
            return _excluded(f"multi-token causal chunk (n={n})")
        from transfusion_tpu.ops.pallas_decode_kernel import decode_supported

        return decode_supported(cache_capacity(cache), self.dim_head, n)

    def _build_mask(self, n, cache, causal, spans, attn_mask, batch):
        """Compose Bool[b|1, 1, n, kv] or return None (full attention)."""
        masks = []

        if cache is not None:
            kv_len = cache_capacity(cache)
            idx = cache["idx"]
            kv_pos = jnp.arange(kv_len)
            if cache.get("mask") is not None:
                valid = cache["mask"]  # [b, kv] — caller keeps it current
                masks.append(
                    jnp.broadcast_to(
                        valid[:, None, None, :],
                        (valid.shape[0], 1, n, kv_len),
                    )
                )
            else:
                idx_b = idx[:, None] if jnp.ndim(idx) == 1 else idx
                valid = kv_pos[None, :] < (idx_b + n)  # [b|1, kv]
                masks.append(
                    jnp.broadcast_to(
                        valid[:, None, None, :],
                        (valid.shape[0], 1, n, kv_len),
                    )
                )
            if causal:
                idx_b = idx[:, None] if jnp.ndim(idx) == 1 else idx
                q_pos = idx_b + jnp.arange(n)  # [b|1(?), n] or [n]
                if q_pos.ndim == 1:
                    masks.append(
                        (q_pos[:, None] >= kv_pos[None, :])[None, None]
                    )
                else:
                    masks.append(
                        (q_pos[:, :, None] >= kv_pos[None, None, :])[:, None]
                    )
            if spans is not None:
                m = spans_to_attn_mask(n, spans)  # [b, n, n] (prefill only)
                m = jnp.pad(m, ((0, 0), (0, 0), (0, kv_len - n)))
                masks.append(m[:, None])
            if attn_mask is not None:
                m = jnp.pad(attn_mask, ((0, 0), (0, 0), (0, kv_len - n)))
                masks.append(m[:, None])
        else:
            if causal:
                seq = jnp.arange(n)
                masks.append((seq[:, None] >= seq[None, :])[None, None])
            if spans is not None:
                masks.append(spans_to_attn_mask(n, spans)[:, None])
            if attn_mask is not None:
                masks.append(attn_mask[:, None])

        if not masks:
            return None

        out = masks[0]
        for m in masks[1:]:
            out = out & m
        return out

    @nn.compact
    def __call__(
        self,
        x,  # Float[b, n, dim] — only the tokens to process (tail if decoding)
        times=None,  # None | Float[b] | Float[b, n] — per-token conditioning
        times_inst=None,  # None | Float[b, m] — per-INSTANCE times (requires
        # spans): the adaLN projections run over m+1 rows instead of n
        # tokens and are gathered per token — identical numerics, far fewer
        # FLOPs (the conditioning MLPs dominate the model cost)
        attn_mask=None,  # Bool[b, n, n] | None
        spans=None,  # Int[b, m, 3] | None
        is_any_modality=None,  # bool | Bool[b, n] | None
        rotary_pos=None,  # Int[n] | Int[b, n] | None — absolute positions of x
        cache: Optional[dict] = None,
        modality_only: bool = False,
        causal: bool = False,
        prefill: bool = False,  # cached prefill: the chunk is the whole
        # valid prefix (cache idx 0) — attention runs over the chunk alone
        # via the flash kernel instead of an O(n * cap) dense pass against
        # the mostly-empty buffer; the cache is still written
        deterministic: bool = True,
    ):
        b, n, _ = x.shape
        is_cp = self.attn_impl in ("ring", "cp_allgather")
        assert not (is_cp and self.dropout > 0), (
            f"attn_impl='{self.attn_impl}' does not implement attention "
            "dropout (the ring/all-gather schedules have no dropout hook) "
            "— set dropout=0 or use the dense/flash path"
        )
        use_flash = (
            self.attn_impl == "flash" or is_cp
        ) and cache is None
        prefill_flash = (
            prefill and cache is not None and self.attn_impl == "flash"
        )
        if is_cp and cache is None:
            csize = self.mesh.shape.get("context", 1) if self.mesh else 1
            assert n % max(csize, 1) == 0, (
                f"attn_impl='{self.attn_impl}': sequence length {n} must be "
                f"divisible by the context axis size {csize} — pick a "
                "pad_multiple divisible by it"
            )

        # --- time conditioning -------------------------------------------
        cond = None
        cond_index = None
        if times_inst is not None or times is not None:
            # the reference keeps the fourier frequencies as a frozen buffer
            # (ref :670-688); a stop_gradient'd param here so reference
            # checkpoints can be ported into the tree (ops/port.py)
            fourier_w = jax.lax.stop_gradient(
                self.param(
                    "fourier_weights",
                    lambda rng, shape: jax.random.normal(
                        jax.random.PRNGKey(self.fourier_seed), shape
                    ),
                    (self.dim // 2,),
                )
            )
        if times_inst is not None:
            assert spans is not None and times is None
            m = times_inst.shape[1]
            inst_times = jnp.concatenate(
                [jnp.zeros((b, 1), times_inst.dtype), times_inst], axis=1
            )  # row 0 = text (time 0)
            rfe = random_fourier_embed(inst_times, self.dim, weights=fourier_w)
            cond = nn.silu(
                nn.Dense(self.dim * 4, dtype=self.dtype, name="to_time_cond")(rfe)
            )
            from transfusion_tpu.ops.spans import spans_to_instance_mask

            inst_mask = spans_to_instance_mask(n, spans)  # [b, m, n]
            cond_index = jnp.einsum(
                "bmn,m->bn", inst_mask.astype(jnp.int32), jnp.arange(1, m + 1)
            )
        elif times is not None:
            if times.ndim == 0:
                times = jnp.broadcast_to(times, (b,))
            rfe = random_fourier_embed(times, self.dim, weights=fourier_w)
            cond = nn.silu(
                nn.Dense(self.dim * 4, dtype=self.dtype, name="to_time_cond")(rfe)
            )

        # --- masks ---------------------------------------------------------
        flash_spans = None
        flash_causal = False
        fused_nomask = False
        decode_bias = None
        decode_lens = None
        if (
            (use_flash or prefill_flash)
            and (spans is not None or causal)
            and attn_mask is None
        ):
            flash_spans, flash_causal = spans, causal
            mask = None
        elif is_cp and cache is None and attn_mask is None:
            # ring/cp handle full (unmasked) attention too — keeps the
            # modality-only path sequence-sharded
            fused_nomask = True
            mask = None
        elif self._use_decode_kernel(cache, prefill, spans, attn_mask, causal, n):
            # cached decode via the Pallas decode kernel: masking reduces to
            # per-slot validity (the reference likewise disables structural
            # masks during cached decode, ref :938-939), expressed as an
            # additive bias with 8 duplicate sublanes (HBM tiling)
            from transfusion_tpu.ops.pallas_decode_kernel import NEG_INF

            cap = cache_capacity(cache)
            if cache.get("mask") is not None:
                valid = cache["mask"]  # [b, cap]
            else:
                # no explicit mask: slots below idx + n are valid (for
                # causal single-token decode this IS causality: cols <= idx)
                idx = cache["idx"]
                idx_b = idx[:, None] if jnp.ndim(idx) == 1 else idx
                valid = jnp.arange(cap)[None, :] < (idx_b + n)
            bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)
            decode_bias = jnp.broadcast_to(bias[:, None, :], (b, 8, cap))
            # per-row streaming bound for the kernel's early exit: idx + n
            # covers the highest slot this chunk writes. NOT sum(valid) —
            # after a padded prefill the valid slots are not a prefix (the
            # write pointer sits at the padded width while the mask marks
            # only true tokens), and a count would stop short of the
            # freshly written slots.
            idx = cache["idx"]
            decode_lens = jnp.broadcast_to(
                (idx + n).astype(jnp.int32), (b,)
            )
            mask = None
        else:
            mask = self._build_mask(n, cache, causal, spans, attn_mask, b)

        if is_any_modality is None and spans is not None:
            is_any_modality = spans_to_is_any_modality(n, spans)
        if isinstance(is_any_modality, bool):
            is_any_modality = jnp.full((b, n), is_any_modality)

        # --- rotary ---------------------------------------------------------
        rope = None
        if rotary_pos is not None:
            rope = rope_angles(rotary_pos, self.dim_head, self.rope_theta)

        # --- layers ----------------------------------------------------------
        streams = self.num_residual_streams
        s = expand_stream(x, streams)

        skips = []
        value_residual = None
        new_layer_caches = []
        new_idx = None

        block_cls = TransformerBlock
        if self.remat and cache is None:
            policy = None
            if self.remat_policy == "dots":
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            else:
                assert self.remat_policy == "full", self.remat_policy
            block_cls = nn.remat(
                TransformerBlock, prevent_cse=True, policy=policy
            )

        for ind in range(self.depth):
            layer = ind + 1

            if self.unet_skips and layer <= (self.depth // 2):
                skips.append(s)

            has_skip = ind >= (self.depth / 2) and self.unet_skips
            skip = skips.pop() if has_skip else None

            layer_cache = None
            if cache is not None:
                layer_cache = {
                    kk: cache[kk][ind]
                    for kk in ("k", "v", "kT", "vT", "k_scale", "v_scale")
                    if kk in cache
                }
                layer_cache["idx"] = cache["idx"]
                if "mask" in cache:
                    layer_cache["mask"] = cache["mask"]

            block = block_cls(
                dim=self.dim,
                dim_head=self.dim_head,
                heads=self.heads,
                dropout=self.dropout,
                ff_expansion_factor=self.ff_expansion_factor,
                attn_softcap=self.attn_softcap,
                attn_gate_values=self.attn_gate_values,
                attn_laser=self.attn_laser,
                attn_impl=self.attn_impl,
                streams=streams,
                fracs=self.num_residual_fracs,
                layer_index=ind,
                is_first=ind == 0,
                has_skip=has_skip,
                modality_only=modality_only,
                flash_causal=flash_causal,
                deterministic=deterministic,
                fused_nomask=fused_nomask,
                prefill=prefill,
                fuse_projections=self.fuse_projections,
                mesh=self.mesh,
                dtype=self.dtype,
                name=f"block_{ind}",
            )

            s, attn_values, layer_new_cache = block(
                s, skip, cond, cond_index, mask, rope, is_any_modality,
                value_residual, layer_cache, flash_spans,
                decode_bias=decode_bias, decode_lens=decode_lens,
            )
            if value_residual is None:
                value_residual = attn_values
            if layer_new_cache is not None:
                new_layer_caches.append(layer_new_cache)
                new_idx = layer_new_cache["idx"]

        x = reduce_stream(s)
        assert len(skips) == 0

        out = RMSNorm(self.dim, name="final_norm")(x)

        new_cache = None
        if cache is not None:
            new_cache = {
                kk: jnp.stack([lc[kk] for lc in new_layer_caches])
                for kk in ("k", "v", "kT", "vT", "k_scale", "v_scale")
                if kk in cache
            }
            new_cache["idx"] = new_idx
            if "mask" in cache:
                new_cache["mask"] = cache["mask"]

        return out, new_cache

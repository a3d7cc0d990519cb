"""Core neural modules (flax.linen), TPU-first.

Parity map into the reference (/root/reference/transfusion_pytorch/transfusion.py):
  random_fourier_embed  <-  RandomFourierEmbed        (ref :670-688)
  AdaptiveWrapper       <-  AdaptiveWrapper           (ref :693-828)
  RMSNorm               <-  RMSNorm                   (ref :832-839)
  FeedForward/GEGLU     <-  GEGLU + FeedForward       (ref :841-863)
  Attention             <-  Attention                 (ref :865-1033)

Design differences (TPU-native):
  * KV caches are preallocated ring buffers written with
    `dynamic_update_slice` (static shapes under jit) instead of torch's
    growing `cat` (ref :958-966). Rotated keys are cached, so decode steps
    rotate only the new chunk.
  * Masking is always an explicit boolean tensor (or the Pallas kernel's
    block-sparse span metadata) — never data-dependent Python control flow.
  * Softmax/score math accumulates in float32 regardless of compute dtype.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from einops import rearrange, repeat

from transfusion_tpu.ops.norms import l2norm, softclamp, safe_log, max_neg_value
from transfusion_tpu.ops.rope import apply_rope


def attention_uses_nhd(attn_impl, *, has_flash_spec, has_cache,
                       has_decode_bias, h, n, d):
    """THE routing predicate for the fused NHD attention path — shared by
    `Attention.__call__` and the pipeline engines, which must size their
    value-residual carry in the layout the attention will produce:
    [b, n, h*d] on the NHD route, [b, h, n, d] otherwise."""
    if (
        attn_impl != "flash"
        or not has_flash_spec
        or has_cache
        or has_decode_bias
    ):
        return False
    from transfusion_tpu.ops.pallas_attn_kernel import nhd_eligible

    return nhd_eligible(h, n, d)


def random_fourier_embed(times, dim: int, seed: int = 0, weights=None):
    """[times, sin(2pi f t), cos(2pi f t)] with fixed random frequencies.

    times: Float[b] or Float[b, n]; returns Float[b, n, dim + 1] (n=1 for 1-D
    input). The frequency buffer is a fixed (non-trainable) standard normal
    draw, matching the reference's registered buffer (ref :670-688). Pass
    `weights` (Float[dim//2], e.g. the Transformer's `fourier_weights` param)
    to use ported reference frequencies; otherwise a seed-derived draw is used.
    """
    assert dim % 2 == 0
    if times.ndim == 1:
        times = times[:, None]

    if weights is None:
        weights = jax.random.normal(jax.random.PRNGKey(seed), (dim // 2,))
    freqs = times[..., None] * weights * 2.0 * jnp.pi  # [b, n, dim/2]
    return jnp.concatenate([times[..., None], jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


def _quantize_rows(x, eps: float = 1e-8):
    """Symmetric absmax int8 quantization over the last axis.

    x: Float[..., d] -> (Int8[..., d], Float32[..., 1] scale) with
    x ~= q * scale. Rows of exact zeros get scale eps (q = 0)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, eps)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


class RMSNorm(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,))
        return l2norm(x) * (self.dim**0.5) * (gamma + 1.0)


class FeedForward(nn.Module):
    dim: int
    expansion_factor: float = 4.0
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dim_inner = int(self.dim * self.expansion_factor * 2 / 3)
        h = nn.Dense(dim_inner * 2, dtype=self.dtype, name="proj_in")(x)
        h, gates = jnp.split(h, 2, axis=-1)
        h = nn.gelu(gates, approximate=False) * h
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(h)


class Attention(nn.Module):
    """Multi-head attention with the reference's full feature set.

    Features (all parity, ref :865-1033): fused QK projection + separate V,
    learned value-residual mixing, per-head output value gates, tanh softcap
    on logits, optional LASER attention (exp-space values), RoPE, KV cache.

    Call returns `(out, orig_values, new_cache)`.
    """

    dim: int
    dim_head: int = 64
    heads: int = 8
    dropout: float = 0.0
    softcap_value: float = 50.0
    gate_values: bool = True
    laser: bool = False
    laser_softclamp_value: float = 15.0
    learned_value_residual_mix: bool = False
    fuse_projections: bool = False  # run to_qk / to_v / (mix) / (gates)
    # as ONE [dim, ~4*dim_inner] matmul. XLA's TPU pipeline does NOT merge
    # the separate dots (verified in compiled HLO) and the h-wide gate/mix
    # projections waste MXU lanes, yet the fused step measured 3% SLOWER
    # end-to-end at the bench config (31.8 -> 32.8 ms/step,
    # scripts/probe_fused_proj.py): the concat/slice copies it adds in
    # fwd+bwd outweigh the saved passes. Kept as an option (param tree and
    # numerics are unchanged either way — the child Dense modules still own
    # their kernels; only the compute is concatenated), default off.
    attn_impl: str = "dense"  # 'dense' | 'flash' | 'ring' | 'cp_allgather'
    mesh: Any = None  # jax.sharding.Mesh — required for ring/cp_allgather
    context_axis: str = "context"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        mask=None,  # Bool[b, 1, n, kv] | None (None = attend everything)
        rope=None,  # angles Float[b, n, dim_head] | Float[n, dim_head] | None
        cache: Optional[dict] = None,
        value_residual=None,  # Float[b, h, n, dim_head] | None
        value_residual_valid=None,  # None | Bool[] (traced) — when given,
        # the mix is applied only where True. Lets a homogeneous scanned /
        # pipelined stack (parallel/pipeline.py) pass every layer the same
        # arguments: the first layer runs with valid=False (plain V).
        flash_spec: Optional[dict] = None,  # spans/causal info for Pallas path
        decode_bias=None,  # Float[b, 8, cap] additive validity — routes
        # cached decode through the Pallas decode kernel (reads the cache at
        # its stored width, int8 dequant in-kernel; ops/pallas_decode_kernel)
        decode_lens=None,  # Int[b] per-row valid counts (kernel early exit)
        prefill: bool = False,  # cached prefill: attend over the chunk alone
        # with the flash kernel (the chunk IS the whole valid prefix; the
        # dense path would build an O(n * cap) score matrix against the
        # mostly-empty buffer) while still writing the cache
        deterministic: bool = True,
    ):
        b, n, _ = x.shape
        h, dh = self.heads, self.dim_head
        dim_inner = h * dh
        scale = dh**-0.5

        d_qk = nn.Dense(
            dim_inner * 2, use_bias=False, dtype=self.dtype, name="to_qk"
        )
        d_v = nn.Dense(
            dim_inner, use_bias=False, dtype=self.dtype, name="to_v"
        )
        learn_mix = (
            value_residual is not None and self.learned_value_residual_mix
        )
        d_mix = (
            nn.Dense(h, dtype=self.dtype, name="to_value_residual_mix")
            if learn_mix
            else None
        )
        d_gates = (
            nn.Dense(h, use_bias=False, dtype=self.dtype, name="to_gates")
            if self.gate_values
            else None
        )

        mix_pre = gates_pre = None
        if self.fuse_projections:
            # bind the children on a 1-token slice (creates the params with
            # their usual names/init; the unused outputs are DCE'd), then
            # run all projections as one concatenated matmul
            mods = [m for m in (d_qk, d_v, d_mix, d_gates) if m is not None]
            for m in mods:
                m(x[:1, :1])
            kernel = jnp.concatenate(
                [m.variables["params"]["kernel"] for m in mods], axis=-1
            ).astype(self.dtype)
            y = x @ kernel
            qk, v = (
                y[..., : dim_inner * 2],
                y[..., dim_inner * 2 : dim_inner * 3],
            )
            off = dim_inner * 3
            if d_mix is not None:
                mix_pre = y[..., off : off + h] + d_mix.variables["params"][
                    "bias"
                ].astype(self.dtype)
                off += h
            if d_gates is not None:
                gates_pre = y[..., off : off + h]
        else:
            qk = d_qk(x)
            v = d_v(x)
            if d_mix is not None:
                mix_pre = d_mix(x)
            if d_gates is not None:
                gates_pre = d_gates(x)

        q, k = jnp.split(qk, 2, axis=-1)

        # --- fused NHD route (cache-less flash path only): q/k/v stay in
        # the native post-projection [b, n, h*d] layout and rotary is
        # applied inside the Pallas batched kernel — eliminating the two
        # XLA rope passes and the 3-in/1-out head-layout copies that a
        # pallas_call operand would otherwise force XLA to materialize
        # (~0.2 ms/layer at the flagship shape; scripts/probe_nhd.py).
        nhd_route = attention_uses_nhd(
            self.attn_impl,
            has_flash_spec=flash_spec is not None,
            has_cache=cache is not None,
            has_decode_bias=decode_bias is not None,
            h=h,
            n=n,
            d=dh,
        )
        if nhd_route:
            from transfusion_tpu.ops.pallas_attn_kernel import (
                flash_attention_nhd,
            )

            orig_v = v  # [b, n, h*d] — consumers route identically, so the
            # value-residual layout is consistent across the stack
            if value_residual is not None:
                if self.learned_value_residual_mix:
                    mix = repeat(
                        nn.sigmoid(mix_pre), "b n h -> b n (h d)", d=dh
                    )
                else:
                    mix = 0.5
                mixed = v * mix + value_residual * (1.0 - mix)
                v = (
                    mixed
                    if value_residual_valid is None
                    else jnp.where(value_residual_valid, mixed, v)
                )
            cos = sin = None
            if rope is not None:
                ang = (rope if rope.ndim > 2 else rope[None]).astype(
                    jnp.float32
                )
                ang = jnp.broadcast_to(ang, (b, n, dh))
                cos, sin = jnp.cos(ang), jnp.sin(ang)
            v_att = v
            if self.laser:
                v_att = jnp.exp(softclamp(v, self.laser_softclamp_value))
            out = flash_attention_nhd(
                q,
                k,
                v_att,
                h,
                cos=cos,
                sin=sin,
                spans=flash_spec.get("spans"),
                causal=flash_spec.get("causal", False),
                softcap=self.softcap_value,
            )
            if self.laser:
                out = safe_log(out)
            if self.gate_values:
                out = out * repeat(
                    nn.sigmoid(gates_pre), "b n h -> b n (h d)", d=dh
                )
            out = nn.Dense(
                self.dim, use_bias=False, dtype=self.dtype, name="to_out"
            )(out)
            return out, orig_v, None

        q, k, v = (
            rearrange(t, "b n (h d) -> b h n d", h=h) for t in (q, k, v)
        )

        orig_v = v

        if value_residual is not None:
            if self.learned_value_residual_mix:
                mix = rearrange(nn.sigmoid(mix_pre), "b n h -> b h n 1")
            else:
                mix = 0.5
            mixed = v * mix + value_residual * (1.0 - mix)
            if value_residual_valid is None:
                v = mixed
            else:
                v = jnp.where(value_residual_valid, mixed, v)

        if rope is not None:
            angles = rope if rope.ndim > 2 else rope[None]
            angles = angles[:, None]  # [b, 1, n, dh]
            q = apply_rope(angles, q)
            k = apply_rope(angles, k)

        use_decode_kernel = False
        if cache is not None:
            idx = cache["idx"]
            tposed = "kT" in cache  # [b, h, d, cap] decode-kernel layout
            kk, vk = ("kT", "vT") if tposed else ("k", "v")
            axis = 3 if tposed else 2
            quant_cache = cache[kk].dtype == jnp.int8

            def write_at(buf, chunk, ax):
                if jnp.ndim(idx) == 1:
                    # per-row write offsets (ragged batched serving): each
                    # request's chunk lands at its own history end
                    return jax.vmap(
                        lambda bu, ch, i: jax.lax.dynamic_update_slice_in_dim(
                            bu, ch, i, axis=ax - 1
                        )
                    )(buf, chunk, idx)
                return jax.lax.dynamic_update_slice_in_dim(
                    buf, chunk, idx, axis=ax
                )

            def write(buf, chunk):
                if tposed:
                    chunk = chunk.swapaxes(-1, -2)
                return write_at(buf, chunk, axis)

            if quant_cache:
                # int8 KV cache (make_kv_cache(quantize='int8')): symmetric
                # absmax quantization per (token, head) row, post-RoPE.
                # Scales are stored as [b, h, 1, cap] so the decode kernel
                # can stream them as legal (1, bk)-lane tiles.
                k_q, k_s = _quantize_rows(k)
                v_q, v_s = _quantize_rows(v)
                k_buf, v_buf = write(cache[kk], k_q), write(cache[vk], v_q)
                k_sc = write_at(cache["k_scale"], k_s.swapaxes(-1, -2), 3)
                v_sc = write_at(cache["v_scale"], v_s.swapaxes(-1, -2), 3)
                new_cache = {
                    kk: k_buf, vk: v_buf,
                    "k_scale": k_sc, "v_scale": v_sc,
                    "idx": idx + n,
                }
            else:
                k_buf, v_buf = write(cache[kk], k), write(cache[vk], v)
                new_cache = {kk: k_buf, vk: v_buf, "idx": idx + n}
            if "mask" in cache:
                new_cache["mask"] = cache["mask"]

            use_decode_kernel = decode_bias is not None and not prefill
            if use_decode_kernel:
                assert tposed  # guaranteed by Transformer._use_decode_kernel
            if prefill and flash_spec is not None:
                # cached prefill: the chunk is the entire valid prefix —
                # attend within it via the flash kernel; the buffer is only
                # written, never read
                k_full, v_full = k, v
            elif use_decode_kernel:
                k_full = v_full = None  # kernel reads the raw buffers
            elif quant_cache:
                # XLA fallback: materialize the dequantized cache
                if tposed:
                    k_full = (k_buf * k_sc).swapaxes(-1, -2).astype(k.dtype)
                    v_full = (v_buf * v_sc).swapaxes(-1, -2).astype(v.dtype)
                else:
                    k_full = (k_buf * k_sc.swapaxes(-1, -2)).astype(k.dtype)
                    v_full = (v_buf * v_sc.swapaxes(-1, -2)).astype(v.dtype)
            elif tposed:
                k_full = k_buf.swapaxes(-1, -2)
                v_full = v_buf.swapaxes(-1, -2)
            else:
                k_full, v_full = k_buf, v_buf
        else:
            quant_cache = False
            k_full, v_full = k, v
            new_cache = None

        v_att = v_full
        if self.laser:
            assert not use_decode_kernel  # excluded upstream
            v_att = jnp.exp(softclamp(v_full, self.laser_softclamp_value))

        fused = flash_spec is not None and (cache is None or prefill)
        if use_decode_kernel:
            from transfusion_tpu.ops.pallas_decode_kernel import decode_attention

            out = decode_attention(
                q,
                k_buf,
                v_buf,
                bias=decode_bias,
                k_scale=k_sc if quant_cache else None,
                v_scale=v_sc if quant_cache else None,
                softcap=self.softcap_value,
                lens=decode_lens,
            )
        elif self.attn_impl == "flash" and fused:
            from transfusion_tpu.ops.pallas_attn import transfusion_flash_attention

            out = transfusion_flash_attention(
                q,
                k_full,
                v_att,
                spans=flash_spec.get("spans"),
                causal=flash_spec.get("causal", False),
                softcap=self.softcap_value,
            )
        elif (
            self.attn_impl in ("ring", "cp_allgather")
            and fused
            # during flax init the dummy shapes aren't mesh-divisible; the
            # dense fallback below creates the exact same param tree
            and not self.is_initializing()
        ):
            # context parallelism: sequence sharded over the mesh's
            # 'context' axis; span mask evaluated at global indices so
            # causality/rectangles are exact across shards
            from transfusion_tpu.parallel.context import (
                context_parallel_attention,
                ring_attention,
            )

            assert self.mesh is not None, (
                f"attn_impl='{self.attn_impl}' needs a mesh with a "
                f"'{self.context_axis}' axis — pass mesh= to the transformer "
                "config (e.g. make_mesh(context=...))"
            )
            cp_fn = (
                ring_attention
                if self.attn_impl == "ring"
                else context_parallel_attention
            )
            out = cp_fn(
                q,
                k_full,
                v_att,
                spans=flash_spec.get("spans"),
                causal=flash_spec.get("causal", False),
                softcap=self.softcap_value,
                mesh=self.mesh,
                axis=self.context_axis,
            )
        else:
            sim = jnp.einsum(
                "bhid,bhjd->bhij", q * scale, k_full,
                preferred_element_type=jnp.float32,
            )
            if self.softcap_value > 0:
                sim = softclamp(sim, self.softcap_value)

            if mask is not None:
                sim = jnp.where(mask, sim, max_neg_value(sim.dtype))

            attn = jax.nn.softmax(sim, axis=-1)
            attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
            out = jnp.einsum(
                "bhij,bhjd->bhid", attn.astype(v_att.dtype), v_att,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)

        if self.laser:
            out = safe_log(out)

        if self.gate_values:
            out = out * nn.sigmoid(rearrange(gates_pre, "b n h -> b h n 1"))

        out = rearrange(out, "b h n d -> b n (h d)")
        out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_out")(out)

        return out, orig_v, new_cache


class AdaptiveWrapper(nn.Module):
    """DiT-style per-token adaptive conditioning around a block (ref :693-828).

    Text tokens: plain LayerNorm * (gamma+1) in, * (layerscale+1) out.
    Modality tokens: FiLM (adaLN) in, ada-LN-zero sigmoid gate out
    (gate bias init -2). Mixed sequences select per token via
    `is_any_modality`.

    The wrapped `fn` may return a tuple — only the first element is
    conditioned (mirrors the reference's pytree handling, ref :736-741).
    """

    fn: nn.Module
    dim: int
    dim_cond: int
    ada_ln_zero_init_bias: float = -2.0
    dtype: Any = jnp.float32  # activation dtype of the residual stream —
    # the LN statistics and FiLM projections still compute in f32, but
    # every tensor handed back to the stream is cast so a bf16 model keeps
    # a bf16 residual (the train step is HBM-bandwidth-bound; an f32
    # stream doubles the traffic)

    @nn.compact
    def __call__(
        self,
        x,
        cond=None,  # Float[b, n|I, dim_cond] | Float[b, dim_cond] | None
        cond_index=None,  # Int[b, n] | None — token -> cond row gather.
        # Transfusion times are constant per modality instance, so the FiLM
        # and ada-LN-zero projections can run over I = instances+1 rows and
        # be gathered per token — identical math, a fraction of the FLOPs.
        is_any_modality=None,  # bool | Bool[b, n] | None
        modality_only: bool = False,
        **kwargs,
    ):
        if cond is not None and cond.ndim == 2:
            cond = cond[:, None, :]

        # epsilon matches torch nn.LayerNorm (ref :707) so ported reference
        # weights reproduce identical activations; stats in f32
        x_ln = nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-5,
            dtype=jnp.float32, name="ln",
        )(x).astype(self.dtype)

        gamma_ln = self.param(
            "layernorm_gamma", nn.initializers.zeros, (self.dim,)
        ).astype(self.dtype)
        layerscale = self.param(
            "layerscale", nn.initializers.zeros, (self.dim,)
        ).astype(self.dtype)

        if cond is not None:
            film = nn.Dense(
                self.dim * 2,
                kernel_init=nn.initializers.zeros,
                name="to_film",
            )(cond)
            ada_gate = nn.sigmoid(
                nn.Dense(
                    self.dim,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.constant(self.ada_ln_zero_init_bias),
                    name="to_ada_ln_zero",
                )(cond)
            )
            if cond_index is not None:
                # gather per-token rows via a one-hot matmul: MXU-friendly
                # and fuses cleanly (take_along_axis lowers to huge select
                # chains on TPU)
                onehot = jax.nn.one_hot(
                    cond_index, cond.shape[1], dtype=film.dtype
                )  # [b, n, I]
                film = jnp.einsum("bni,bio->bno", onehot, film)
                ada_gate = jnp.einsum("bni,bio->bno", onehot, ada_gate)
            film = film.astype(self.dtype)
            ada_gate = ada_gate.astype(self.dtype)
            gamma_f, beta_f = jnp.split(film, 2, axis=-1)

        def run(fn_in):
            out = self.fn(fn_in, **kwargs)
            if isinstance(out, tuple):
                return out[0], out[1:]
            return out, None

        if modality_only:
            assert cond is not None
            out, rest = run(x_ln * (gamma_f + 1.0) + beta_f)
            out = out * ada_gate
        elif cond is None:
            out, rest = run(x_ln * (gamma_ln + 1.0))
            out = out * (layerscale + 1.0)
        else:
            assert is_any_modality is not None
            if isinstance(is_any_modality, bool):
                is_any_modality = jnp.full(x.shape[:-1], is_any_modality)
            sel = is_any_modality[..., None]

            text_in = x_ln * (gamma_ln + 1.0)
            mod_in = x_ln * (gamma_f + 1.0) + beta_f
            out, rest = run(jnp.where(sel, mod_in, text_in))
            out = jnp.where(sel, out * ada_gate, out * (layerscale + 1.0))

        if rest is None:
            return out
        return (out, *rest)

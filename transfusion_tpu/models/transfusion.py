"""The Transfusion model — joint next-token prediction + rectified flow.

TPU-native rebuild of the reference `Transfusion` class
(/root/reference/transfusion_pytorch/transfusion.py:1256-2949) on top of the
packed-sequence pipeline:

  * `TransfusionCore` (flax.linen): transformer + embeddings + per-modality
    latent<->model projections + axial pos-emb MLPs. Pure functions of
    (params, PackedBatch) — one jit per bucket signature.
  * `Transfusion` (plain Python): configuration, vocab layout, the packer
    spec, jitted loss/forward functions, and the host-orchestrated sampling
    state machine. Mirrors the reference's public API surface:
    forward/loss, forward_text, forward_modality, sample,
    generate_text_only, generate_modality_only, create_ema.

Loss semantics (parity with reference :2842-2949):
  total = text_CE * text_frac * text_w
        + sum_t flow_MSE_t * frac_t * flow_w
        + sum_t velocity_MSE_t * frac_t * velocity_w      (if EMA given)
        + sum_t recon_MSE_t * frac_t * recon_w            (if recon_w > 0)
  where text_frac = (# learned text labels) / total_tokens and
  frac_t = (# sequence positions of modality t) / total_tokens.

Documented deviations from the reference (each intentional):
  * per-instance noising times actually index times[b, m] (the reference's
    assembly loop increments its modality index once per *batch row*,
    transfusion.py:2488/2656, so every instance uses times[b, 0]);
  * sampling never re-frames modalities with a second [meta][shape][som]
    (the sampled text stream already contains the frame; the reference's
    non-return_embed sampling forwards re-add it, :2586-2605);
  * during sampling, past (already decoded) modalities are conditioned at
    time 1.0 in every forward (the reference only pins 1.0 inside the ODE
    step, :1863, and leaves random times during text steps);
  * the meta shape string records the latent spatial shape (see
    data/packing.py docstring);
  * multi-dimensional meta strings parse successfully ("4,4" -> (4,4));
    the reference's isdigit() gate (:1735) rejects any shape with a comma
    and always falls back to the default shape.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import math
import warnings
from typing import Any, Callable, NamedTuple, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from transfusion_tpu.data.packing import (
    ModalityPackSpec,
    PackSpec,
    PackedBatch,
    normalize_sample,
    pack_samples,
    to_channel_last,
    to_user_layout,
)
from transfusion_tpu.models.transformer import Transformer, make_kv_cache
from transfusion_tpu.ops.axial import ContinuousAxialPositionalEmbedding
from transfusion_tpu.ops.flow import min_p_filter, model_output_to_flow, noise_data
from transfusion_tpu.ops.norms import max_neg_value
from transfusion_tpu.ops.odeint import odeint
from transfusion_tpu.ops.spans import (
    spans_to_is_any_modality,
    spans_to_modality_mask,
    spans_to_rotary_positions,
)
from transfusion_tpu.utils.helpers import (
    cast_tuple,
    decode_chars,
    default,
    round_up_to_multiple,
    tokens_since_rightmost_id,
)

logger = logging.getLogger("transfusion_tpu")


def default_to_modality_shape_fn(s: str) -> tuple[int, ...]:
    return tuple(int(x) for x in s.split(","))


class LossBreakdown(NamedTuple):
    total: Any
    text: Any
    flow: list
    velocity: Optional[list] = None
    recon: Optional[list] = None


@dataclasses.dataclass(frozen=True)
class ModalityConfig:
    dim_latent: int
    channel_first_latent: bool = False
    add_pos_emb: bool = False
    num_dim: Optional[int] = None
    default_shape: Optional[tuple] = None
    to_shape_fn: Callable = default_to_modality_shape_fn


# ---------------------------------------------------------------------------
# default latent <-> model projections
# ---------------------------------------------------------------------------


class LatentToModel(nn.Module):
    dim: int
    dim_latent: int

    @nn.compact
    def __call__(self, x):
        if self.dim_latent == self.dim:
            return x
        return nn.Dense(self.dim, name="proj")(x)


class ModelToLatent(nn.Module):
    dim_latent: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.dim_latent, use_bias=False, name="proj")(x)


# ---------------------------------------------------------------------------
# the linen core
# ---------------------------------------------------------------------------


class TransfusionCore(nn.Module):
    """Transformer + embeddings + modality projections as one pure module.

    Modality encoders/decoders (external VAEs etc.) are deliberately NOT
    part of the core: they are frozen auxiliaries with their own params,
    managed by the `Transfusion` wrapper — this keeps the core's param tree
    exactly the trainable model (optimizer/EMA/checkpoint friendly).
    """

    vocab_size: int
    dim: int
    transformer_cfg: dict
    modalities: tuple[ModalityConfig, ...]
    # per-modality custom projection factories (pre/post transformer), or None
    pre_post_enc_dec: tuple = ()
    model_output_clean: bool = True
    eps: float = 1e-2
    dtype: Any = jnp.float32

    def setup(self):
        self.transformer = Transformer(
            dim=self.dim, dtype=self.dtype, **self.transformer_cfg
        )
        self.text_embed = nn.Embed(self.vocab_size, self.dim, name="text_embed")
        self.to_text_logits = nn.Dense(
            self.vocab_size, use_bias=False, dtype=self.dtype,
            name="to_text_logits",
        )

        lat2mod, mod2lat, pos_mlps = [], [], []
        for i, mc in enumerate(self.modalities):
            custom = self.pre_post_enc_dec[i] if i < len(self.pre_post_enc_dec) else None
            if custom is not None:
                pre, post = custom
                lat2mod.append(pre)
                mod2lat.append(post)
            else:
                lat2mod.append(LatentToModel(self.dim, mc.dim_latent))
                mod2lat.append(ModelToLatent(mc.dim_latent))
            if mc.add_pos_emb:
                assert mc.num_dim is not None, (
                    f"modality_num_dim must be set for modality {i} to use "
                    "axial positional embeddings"
                )
                pos_mlps.append(
                    ContinuousAxialPositionalEmbedding(
                        dim=self.dim, num_axial_dims=mc.num_dim
                    )
                )
            else:
                pos_mlps.append(None)

        self.latent_to_model = lat2mod
        self.model_to_latent = mod2lat
        self.pos_emb_mlps = pos_mlps

    # -- projection helpers ------------------------------------------------

    def project_latent(self, latents, modality_type: int):
        """Raw latent_to_model application: [k, *lat] -> [k, *seq_shape, dim]."""
        return self.latent_to_model[modality_type](latents)

    def latent_to_seq(self, latents, modality_type: int):
        """[k, *latent_shape, d_latent] -> rows [k, L, dim] (+ seq_shape)."""
        out = self.latent_to_model[modality_type](latents)
        seq_shape = tuple(out.shape[1:-1])
        return out.reshape(out.shape[0], -1, out.shape[-1]), seq_shape

    def seq_to_latent(self, rows, modality_type: int, seq_shape: tuple):
        """rows [k, L, dim] -> [k, *latent_shape, d_latent]."""
        k = rows.shape[0]
        x = rows.reshape(k, *seq_shape, rows.shape[-1])
        return self.model_to_latent[modality_type](x)

    def axial_pos_emb(self, modality_type: int, seq_shape: tuple):
        mlp = self.pos_emb_mlps[modality_type]
        if mlp is None:
            return None
        nd = self.modalities[modality_type].num_dim
        coords = ContinuousAxialPositionalEmbedding.coords_for_shape(seq_shape, nd)
        return mlp(coords)  # [L, dim]

    # -- joint packed forward ----------------------------------------------

    def joint_embed_in(self, packed: PackedBatch):
        """Embed text + scatter modality rows into the input sequence.
        Returns (x, rotary_pos, group_rows). Exposed as its own apply-method
        so the pipeline-parallel path can run the transformer trunk OUTSIDE
        the flax scope (parallel/pipeline.py builds its own canonical block
        modules, which flax forbids inside another module's method)."""
        text, spans = packed.text, packed.spans
        b, n = text.shape

        x = self.text_embed(jnp.where(text < 0, 0, text)).astype(self.dtype)

        group_rows = []
        for g in packed.groups:
            rows, seq_shape = self.latent_to_seq(g.latents, g.modality_type)
            assert seq_shape == g.seq_shape, (
                f"latent_to_model produced seq shape {seq_shape}, packer "
                f"assumed {g.seq_shape} for modality {g.modality_type}"
            )
            group_rows.append(rows)

            in_rows = rows
            pos = self.axial_pos_emb(g.modality_type, g.seq_shape)
            if pos is not None:
                in_rows = in_rows + pos[None]

            idx = g.offsets[:, None] + jnp.arange(g.seq_len)[None, :]
            x = x.at[g.batch_idx[:, None], idx].set(in_rows.astype(x.dtype))

        rotary_pos = spans_to_rotary_positions(n, spans)
        return x, rotary_pos, group_rows

    def joint_out(
        self, embed, packed: PackedBatch, times, group_rows,
        return_logits: bool = True,
    ):
        """Project the trunk output: text logits + per-group predicted
        flows (the second half of `joint`; see `joint_embed_in`)."""
        logits = self.to_text_logits(embed) if return_logits else None

        pred_flows = []
        for g, noised_rows in zip(packed.groups, group_rows):
            idx = g.offsets[:, None] + jnp.arange(g.seq_len)[None, :]
            out_rows = embed[g.batch_idx[:, None], idx]  # [k, L, dim]
            t_inst = times[g.batch_idx, g.span_rows]  # [k]
            if self.model_output_clean:
                out_rows = model_output_to_flow(
                    out_rows, noised_rows, t_inst, self.eps
                )
            pred_flows.append(self.seq_to_latent(out_rows, g.modality_type, g.seq_shape))
        return logits, pred_flows

    def joint(
        self,
        packed: PackedBatch,
        times,  # Float[b, m]
        cache: Optional[dict] = None,
        return_logits: bool = True,
        deterministic: bool = True,
    ):
        """Forward the packed multimodal sequence.

        packed.groups[*].latents must hold the *noised* latents (training)
        or the current ODE state (sampling). Returns
        (logits | None, embed, group_pred_flows, group_noised_rows, cache).
        group_pred_flows[i]: Float[k, *latent_shape, d_latent] — predicted
        flow in latent space (x-pred conversion applied in model space when
        model_output_clean, reference :2611-2619).
        """
        x, rotary_pos, group_rows = self.joint_embed_in(packed)
        spans = packed.spans

        embed, new_cache = self.transformer(
            x,
            times_inst=times,  # adaLN projections run per instance, not per
            # token (identical numerics, a fraction of the FLOPs)
            spans=spans,
            rotary_pos=rotary_pos,
            cache=cache,
            # joint is only ever called with a cache to prefill it (sampling
            # fast path): the chunk is the whole valid prefix, so attention
            # runs over the chunk via the flash kernel instead of a dense
            # pass against the empty buffer
            prefill=cache is not None,
            deterministic=deterministic,
        )

        logits, pred_flows = self.joint_out(
            embed, packed, times, group_rows, return_logits
        )
        return logits, embed, pred_flows, group_rows, new_cache

    # -- cached decode steps (sampling fast path) ---------------------------

    def decode_text_step(self, tok, rotary_pos, cache):
        """One cached text-decoding step. tok: Int[b, L] (usually L=1).

        The reference disables structural masking during cached decode
        (transfusion.py:938-939); validity comes from the cache mask."""
        b, L = tok.shape
        x = self.text_embed(jnp.where(tok < 0, 0, tok)).astype(self.dtype)
        times_tok = jnp.zeros((b, L))
        embed, new_cache = self.transformer(
            x,
            times=times_tok,
            rotary_pos=rotary_pos,
            cache=cache,
            is_any_modality=False,
        )
        return self.to_text_logits(embed), new_cache

    def decode_modality_rows(
        self, latents, t, rotary_pos, cache, modality_type: int,
    ):
        """Cached forward of one modality's rows (the ODE tail).

        latents: Float[b, *latent_shape, d]; t: time for conditioning and
        x-pred conversion — a scalar, or Float[b] with an independent time
        per row (the per-row adaptive ODE controller in grouped serving
        dispatches steps each pool row on its own clock).
        Returns (pred_flow_latents, new_cache)."""
        rows, seq_shape = self.latent_to_seq(latents, modality_type)
        b, L, _ = rows.shape

        in_rows = rows
        pos = self.axial_pos_emb(modality_type, seq_shape)
        if pos is not None:
            in_rows = in_rows + pos[None]

        t_arr = jnp.asarray(t, jnp.float32)
        times_row = jnp.broadcast_to(t_arr.reshape(-1), (b,))
        times_tok = jnp.broadcast_to(times_row[:, None], (b, L))
        embed, new_cache = self.transformer(
            in_rows.astype(self.dtype),
            times=times_tok,
            rotary_pos=rotary_pos,
            cache=cache,
            is_any_modality=True,
        )
        out_rows = embed
        if self.model_output_clean:
            out_rows = model_output_to_flow(
                out_rows, rows, times_row, self.eps
            )
        return self.seq_to_latent(out_rows, modality_type, seq_shape), new_cache

    # -- text-only path ------------------------------------------------------

    def text_forward(
        self, text, cache=None, rotary_pos=None, deterministic=True,
        prefill: bool = False,
    ):
        """Causal LM forward. text: Int[b, n] (chunk to process).

        rotary_pos defaults to arange(n); pass absolute positions when
        decoding with a cache. prefill=True (with a fresh cache at idx 0)
        runs attention over the chunk alone via the flash kernel."""
        b, n = text.shape
        if rotary_pos is None:
            rotary_pos = jnp.arange(n)
        x = self.text_embed(jnp.where(text < 0, 0, text)).astype(self.dtype)
        embed, new_cache = self.transformer(
            x,
            causal=True,
            rotary_pos=rotary_pos,
            cache=cache,
            prefill=prefill,
            deterministic=deterministic,
        )
        return self.to_text_logits(embed), new_cache

    # -- modality-only path ---------------------------------------------------

    def modality_forward(self, noised, times, modality_type: int, deterministic=True):
        """Pure flow-matching forward (reference forward_modality :2041-2141).

        noised: Float[b, *latent_shape, d_latent] (channel-last);
        times: Float[b]. Returns model output in latent space, x-pred
        conversion (latent space, per reference :2139-2141) applied by the
        caller which holds the noised input.
        """
        rows, seq_shape = self.latent_to_seq(noised, modality_type)
        pos = self.axial_pos_emb(modality_type, seq_shape)
        if pos is not None:
            rows = rows + pos[None]
        embed, _ = self.transformer(
            rows, times=times, modality_only=True, deterministic=deterministic
        )
        return self.seq_to_latent(embed, modality_type, seq_shape)

    # -- init helper ----------------------------------------------------------

    def init_all(self):
        """Touch every submodule so `init` creates the complete param tree."""
        b, n, m = 1, 8, 1
        text = jnp.zeros((b, n), jnp.int32)
        spans = jnp.zeros((b, m, 3), jnp.int32)
        x = self.text_embed(text).astype(self.dtype)
        times_tok = jnp.zeros((b, n))
        embed, _ = self.transformer(
            x, times=times_tok, spans=spans, rotary_pos=jnp.arange(n)
        )
        _ = self.to_text_logits(embed)

        for i, mc in enumerate(self.modalities):
            shape = mc.default_shape
            if shape is None:
                nd = mc.num_dim if mc.num_dim is not None else 1
                shape = (2,) * nd
            dummy = jnp.zeros((1, *shape, mc.dim_latent))
            rows, seq_shape = self.latent_to_seq(dummy, i)
            _ = self.seq_to_latent(rows, i, seq_shape)
            _ = self.axial_pos_emb(i, seq_shape)
        return ()


# ---------------------------------------------------------------------------
# device-side default time distribution (reference transfusion.py:202-216)
# ---------------------------------------------------------------------------


def default_modality_times(rng, num_modalities, m: int):
    """Per-sample: a random count of 'already decoded' modalities is pinned
    at time 0.5; the remaining instances share one U(0,1) time."""
    b = num_modalities.shape[0]
    r1, r2 = jax.random.split(rng)
    rand_num = jnp.floor(
        jax.random.uniform(r1, (b,)) * num_modalities.astype(jnp.float32)
    )
    prev_decoded = jnp.arange(m)[None, :] < rand_num[:, None]
    curr = jax.random.uniform(r2, (b,))
    return jnp.where(prev_decoded, 0.5, curr[:, None])


# ---------------------------------------------------------------------------
# the user-facing model
# ---------------------------------------------------------------------------


class Transfusion:
    """Configuration + pure jitted functions + host sampling orchestration.

    Constructor mirrors the reference's kwargs (transfusion.py:1256-1506).
    All compute methods are functional: they take `params` explicitly (get
    them from `init_params`). A minimal stateful convenience (`self.params`)
    is kept for example scripts.
    """

    def __init__(
        self,
        *,
        num_text_tokens: int,
        transformer: dict,
        dim_latent=None,
        channel_first_latent=False,
        add_pos_emb=False,
        modality_encoder=None,
        modality_decoder=None,
        pre_post_transformer_enc_dec=None,
        modality_default_shape=None,
        fallback_to_default_shape_if_invalid: bool = False,
        modality_num_dim=None,
        to_modality_shape_fn=default_to_modality_shape_fn,
        ignore_index: int = -1,
        flow_loss_weight: float = 1.0,
        text_loss_weight: float = 1.0,
        velocity_consistency_loss_weight: float = 0.1,
        reconstruction_loss_weight: float = 0.0,
        odeint_method: str = "midpoint",
        model_output_clean: bool = True,
        eps: float = 1e-2,
        prob_uncond: float = 0.1,
        pad_multiple: int = 64,
        ce_chunk_size: Optional[int] = None,
        dtype=jnp.float32,
    ):
        transformer = dict(transformer)
        self.dim = transformer.pop("dim")
        self.transformer_cfg = transformer

        dim_latent = default(dim_latent, self.dim)
        self.dim_latents = cast_tuple(dim_latent)
        T = self.num_modalities = len(self.dim_latents)

        channel_first = cast_tuple(channel_first_latent, T)
        add_pos = cast_tuple(add_pos_emb, T)
        to_shape_fns = cast_tuple(to_modality_shape_fn, T)

        if modality_default_shape is None or (
            isinstance(modality_default_shape, tuple)
            and all(isinstance(x, int) for x in modality_default_shape)
        ):
            modality_default_shape = (modality_default_shape,) * T
        self.modality_default_shape = modality_default_shape

        if modality_num_dim is None:
            modality_num_dim = tuple(
                len(s) if s is not None else None for s in modality_default_shape
            )
        num_dims = cast_tuple(modality_num_dim, T)

        self.modalities = tuple(
            ModalityConfig(
                dim_latent=self.dim_latents[i],
                channel_first_latent=channel_first[i],
                add_pos_emb=add_pos[i],
                num_dim=num_dims[i],
                default_shape=modality_default_shape[i],
                to_shape_fn=to_shape_fns[i],
            )
            for i in range(T)
        )

        # ---- token id layout (reference :1388-1415) ----
        self.num_text_tokens = num_text_tokens
        self.sos_id = num_text_tokens
        self.eos_id = num_text_tokens + 1
        self.null_text_id = num_text_tokens + 2
        self.som_ids = [num_text_tokens + 3 + i for i in range(T)]
        self.eom_ids = [num_text_tokens + 3 + T + i for i in range(T)]
        self.meta_id = num_text_tokens + 3 + 2 * T
        self.char_offset = self.meta_id + 1
        self.vocab_size = num_text_tokens + 3 + 2 * T + 129

        # ---- aux modules (encoders/decoders; frozen, own params) ----
        def norm_aux(x):
            if x is None:
                return [None] * T
            tup = x if isinstance(x, (tuple, list)) else (x,)
            if (
                len(tup) == 2
                and isinstance(tup[0], nn.Module)
                and not isinstance(tup[1], nn.Module)
                # disambiguate (module, params) from a 2-modality list
                # [module, None]: a pair's second element is a params
                # pytree — None there only means lazy params, which we
                # only assume when a per-modality reading is impossible
                and (tup[1] is not None or T != 2)
            ):
                tup = (tup,)  # single (module, params) pair
            elif len(tup) == 2 and isinstance(tup[0], nn.Module) and tup[1] is None:
                # T == 2 and the bare (module, None) form is ambiguous: it
                # is read as the per-modality list [module, None]. A lazy-
                # params pair must be spelled [(module, None)].
                warnings.warn(
                    "(module, None) with 2 modality types is read as a "
                    "per-modality list [encoder, no-encoder]; spell a "
                    "lazy-params pair as [(module, None)]",
                    stacklevel=3,
                )
            tup = list(tup)
            assert len(tup) in (1, T)
            if len(tup) == 1 and T > 1:
                tup = tup * T
            out = []
            for item in tup:
                if item is None:
                    out.append(None)
                elif isinstance(item, nn.Module):
                    out.append([item, None])  # params lazily initialized
                else:
                    out.append([item[0], item[1]])
            return out

        self.encoders = norm_aux(modality_encoder)
        self.decoders = norm_aux(modality_decoder)

        # ---- pre/post transformer projections (learnable unet) ----
        if pre_post_transformer_enc_dec is not None:
            pp = pre_post_transformer_enc_dec
            if isinstance(pp, tuple) and len(pp) == 2 and isinstance(pp[0], nn.Module):
                pp = (pp,)
            pp = tuple(pp) + (None,) * (T - len(pp))
        else:
            pp = (None,) * T
        self.pre_post = pp

        self.ignore_index = ignore_index
        self.flow_loss_weight = flow_loss_weight
        self.text_loss_weight = text_loss_weight
        self.velocity_consistency_loss_weight = velocity_consistency_loss_weight
        self.reconstruction_loss_weight = reconstruction_loss_weight
        self.has_recon_loss = reconstruction_loss_weight > 0.0
        self.odeint_method = odeint_method
        self.model_output_clean = model_output_clean
        self.eps = eps
        self.prob_uncond = prob_uncond
        self.pad_multiple = pad_multiple
        # sequence-chunked cross-entropy: never materializes the full
        # [b, n, vocab] logits tensor — set for large vocabularies
        self.ce_chunk_size = ce_chunk_size
        self.fallback_to_default_shape_if_invalid = fallback_to_default_shape_if_invalid
        self.dtype = dtype

        self.core = TransfusionCore(
            vocab_size=self.vocab_size,
            dim=self.dim,
            transformer_cfg=self.transformer_cfg,
            modalities=self.modalities,
            pre_post_enc_dec=self.pre_post,
            model_output_clean=model_output_clean,
            eps=eps,
            dtype=dtype,
        )

        self.params = None  # optional stateful convenience
        self._seq_shape_cache: dict = {}
        self._jit_cache: dict = {}

    # ------------------------------------------------------------------
    # accessors (reference get_modality_info :1512-1558)
    # ------------------------------------------------------------------

    def get_modality_info(self, modality_type: Optional[int] = None) -> dict:
        i = default(modality_type, 0)
        mc = self.modalities[i]
        return dict(
            modality_type=i,
            dim_latent=mc.dim_latent,
            channel_first_latent=mc.channel_first_latent,
            add_pos_emb=mc.add_pos_emb,
            num_dim=mc.num_dim,
            default_shape=mc.default_shape,
            to_shape_fn=mc.to_shape_fn,
            som_id=self.som_ids[i],
            eom_id=self.eom_ids[i],
            encoder=self.encoders[i],
            decoder=self.decoders[i],
        )

    def get_all_modality_info(self) -> list[dict]:
        return [self.get_modality_info(i) for i in range(self.num_modalities)]

    def get_modality_shape(self, modality, modality_type: Optional[int] = None):
        mc = self.modalities[default(modality_type, 0)]
        arr = np.asarray(modality)
        return tuple(to_channel_last(arr, mc.channel_first_latent).shape[:-1])

    # ------------------------------------------------------------------
    # parameters
    # ------------------------------------------------------------------

    def init_params(self, rng):
        params = self.core.init(rng, method="init_all")
        self.params = params
        return params

    # ------------------------------------------------------------------
    # packing plumbing
    # ------------------------------------------------------------------

    def seq_shape_for(self, modality_type: int, spatial: tuple) -> tuple:
        """Sequence (post latent_to_model) spatial shape for a latent shape.

        Derived automatically via jax.eval_shape so downsampling pre/post
        projections need no extra configuration."""
        key = (modality_type, tuple(spatial))
        if key in self._seq_shape_cache:
            return self._seq_shape_cache[key]
        if self.pre_post[modality_type] is None:
            self._seq_shape_cache[key] = tuple(spatial)
            return tuple(spatial)
        assert self.params is not None, "call init_params before packing"
        mc = self.modalities[modality_type]
        dummy = jax.ShapeDtypeStruct((1, *spatial, mc.dim_latent), jnp.float32)
        out = jax.eval_shape(
            lambda p, x: self.core.apply(
                p, x, modality_type, method=TransfusionCore.project_latent
            ),
            self.params,
            dummy,
        )
        seq_shape = tuple(out.shape[1:-1])
        self._seq_shape_cache[key] = seq_shape
        return seq_shape

    @property
    def pack_spec(self) -> PackSpec:
        mods = tuple(
            ModalityPackSpec(
                dim_latent=mc.dim_latent,
                channel_first=mc.channel_first_latent,
                num_dim=mc.num_dim,
                som_id=self.som_ids[i],
                eom_id=self.eom_ids[i],
                seq_shape_fn=functools.partial(self.seq_shape_for, i),
            )
            for i, mc in enumerate(self.modalities)
        )
        return PackSpec(
            num_text_tokens=self.num_text_tokens,
            sos_id=self.sos_id,
            eos_id=self.eos_id,
            null_text_id=self.null_text_id,
            meta_id=self.meta_id,
            char_offset=self.char_offset,
            modalities=mods,
        )

    def pack(self, samples, **kw) -> PackedBatch:
        kw.setdefault("pad_multiple", self.pad_multiple)
        return pack_samples(samples, self.pack_spec, **kw)

    # ------------------------------------------------------------------
    # encoders / decoders (frozen aux modules, reference :2438-2444, 1939-1948)
    # ------------------------------------------------------------------

    def _aux_apply(self, slot, modality_type: int, batch):
        entry = slot[modality_type]
        if entry is None:
            return batch
        module, params = entry
        batch = jnp.asarray(batch)
        if params is None:
            params = module.init(jax.random.PRNGKey(0), batch)
            entry[1] = params
        return jax.lax.stop_gradient(module.apply(params, batch))

    def encode_modalities(self, samples):
        """Batch-encode every modality in ragged samples (grouped by shape)."""
        from transfusion_tpu.data.packing import apply_modality_fn

        for i in range(self.num_modalities):
            if self.encoders[i] is None:
                continue
            samples = apply_modality_fn(
                lambda b: np.asarray(self._aux_apply(self.encoders, i, b)),
                samples,
                modality_type=i,
            )
        return samples

    def decode_modalities(self, samples):
        from transfusion_tpu.data.packing import apply_modality_fn

        for i in range(self.num_modalities):
            if self.decoders[i] is None:
                continue
            samples = apply_modality_fn(
                lambda b: np.asarray(self._aux_apply(self.decoders, i, b)),
                samples,
                modality_type=i,
            )
        return samples

    # ------------------------------------------------------------------
    # joint loss
    # ------------------------------------------------------------------

    def _joint_core(self, params, packed, times, rngs_noise, deterministic=True,
                    return_logits=True, pipeline=None):
        """Noise the packed groups and run the core. Returns
        (logits, embed, pred_flows, noises, flows, noised_groups).

        pipeline: None | (mesh, microbatches) — route the transformer trunk
        through GPipe pipeline parallelism (parallel/pipeline.py) over the
        mesh's 'pipe' axis; embeddings/projections/losses stay local."""
        noised_groups, noises, flows = [], [], []
        for gi, g in enumerate(packed.groups):
            noise = jax.random.normal(rngs_noise[gi], g.latents.shape)
            t_inst = times[g.batch_idx, g.span_rows]
            noised, flow = noise_data(g.latents, noise, t_inst)
            noised_groups.append(g.replace(latents=noised))
            noises.append(noise)
            flows.append(flow)

        packed_n = packed.replace(groups=tuple(noised_groups))
        if pipeline is None:
            logits, embed, pred_flows, _, _ = self.core.apply(
                params,
                packed_n,
                times,
                return_logits=return_logits,
                deterministic=deterministic,
                method="joint",
            )
        else:
            # pipeline-parallel trunk: embed-in and out-projections run in
            # the flax core; the transformer stack itself runs through the
            # GPipe schedule OUTSIDE the flax scope (it builds canonical
            # block modules, which flax forbids inside another module's
            # method). Gradients flow through all three applies.
            mesh, microbatches = pipeline
            from transfusion_tpu.parallel.pipeline import (
                pipeline_transformer_forward,
            )

            x, rotary_pos, group_rows = self.core.apply(
                params, packed_n, method="joint_embed_in"
            )
            t_module = Transformer(
                dim=self.dim, dtype=self.dtype, **self.transformer_cfg
            )
            embed = pipeline_transformer_forward(
                params["params"]["transformer"],
                t_module,
                mesh,
                microbatches,
                x,
                times_inst=times,
                spans=packed_n.spans,
                rotary_pos=rotary_pos,
            )
            logits, pred_flows = self.core.apply(
                params, embed, packed_n, times, group_rows,
                return_logits=return_logits, method="joint_out",
            )
        return logits, embed, pred_flows, noises, flows, noised_groups

    def _chunked_ce(self, params, embed, labels, valid):
        """Sum of -log p(label) over valid positions, computed in sequence
        chunks so the [b, n, vocab] logits tensor is never materialized
        (the dominant HBM temp with production vocabularies)."""
        W = params["params"]["to_text_logits"]["kernel"]
        C = self.ce_chunk_size
        b, n, d = embed.shape
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
            lg = (e.astype(self.dtype) @ W.astype(self.dtype)).astype(
                jnp.float32
            )
            lse = jax.nn.logsumexp(lg, axis=-1)
            ll = jnp.take_along_axis(lg, lab[..., None], axis=-1)[..., 0]
            return acc + (-(ll - lse) * va).sum(), None

        ce_sum, _ = jax.lax.scan(step, jnp.zeros(()), (emb_c, lab_c, val_c))
        return ce_sum

    def _loss_impl(
        self,
        params,
        packed: PackedBatch,
        rng,
        times,  # None | Float[b, m]
        ema_params,  # None | params
        prob_uncond: float,
        velocity_delta: float,
        train: bool,
        pipeline=None,  # None | (mesh, microbatches): pipeline-parallel
        # trunk (see _joint_core / Trainer(pipeline_microbatches=))
        loss_scales=None,  # None | dict from `loss_denominators` (summed
        # over microbatches): every mean in the joint loss is computed with
        # these GLOBAL denominators instead of this batch's own, so that
        # summing (total, breakdown) over the microbatches of a split batch
        # reproduces the full-batch loss exactly — the basis for exact
        # gradient accumulation (Trainer(grad_accumulation=M)). Same
        # sum-times-global-denominator rewrite as the 1F1B pipeline head
        # (models/pipeline_loss.py); denominators depend only on batch
        # data/masks + the CFG-dropout draw, never on params.
    ):
        T = self.num_modalities
        b, n_full = packed.text.shape
        m = packed.spans.shape[1]

        rng_times, rng_cfg, rng_noise, rng_noise_ema = jax.random.split(rng, 4)

        num_mods = (packed.spans[..., 2] > 0).sum(-1)

        if times is None:
            times = default_modality_times(rng_times, num_mods, m)
        orig_times = times

        has_velocity = ema_params is not None
        if has_velocity:
            times = times * (1.0 - velocity_delta)

        # CFG dropout (reference :2351-2377): whole-sample text -> null id
        text = packed.text
        if train and prob_uncond > 0:
            drop = jax.random.uniform(rng_cfg, (b,)) < prob_uncond
            text = jnp.where(
                drop[:, None] & packed.cfg_mask, self.null_text_id, text
            )

        # next-token shift (reference :2700-2709)
        text_in, labels = text[:, :-1], text[:, 1:]
        n = n_full - 1
        packed_in = packed.replace(text=text_in)

        chunked = self.ce_chunk_size is not None
        noise_keys = jax.random.split(rng_noise, max(len(packed.groups), 1))

        if loss_scales is not None:
            assert pipeline is None, (
                "loss_scales (gradient accumulation) cannot combine with "
                "pipeline parallelism — pick one batch-splitting axis"
            )

        if pipeline is not None and len(pipeline) == 3:
            mesh_pp, mb_pp, schedule = pipeline
            if schedule == "1f1b":
                # in-schedule loss + O(pipe) activation memory
                # (models/pipeline_loss.py + parallel/pipeline_1f1b.py)
                from transfusion_tpu.models.pipeline_loss import (
                    joint_loss_1f1b,
                )

                return joint_loss_1f1b(
                    self, params, packed, packed_in, labels,
                    times, orig_times, noise_keys, rng_noise_ema,
                    ema_params, velocity_delta,
                    mesh=mesh_pp, microbatches=mb_pp,
                )
            assert schedule == "gpipe", f"unknown pipeline schedule {schedule}"
            pipeline = (mesh_pp, mb_pp)

        logits, embed, pred_flows, noises, flows, noised_groups = self._joint_core(
            params, packed_in, times, noise_keys, deterministic=not train,
            return_logits=not chunked, pipeline=pipeline,
        )

        total_tokens = packed.total_tokens.astype(jnp.float32)

        # ---- text CE ----
        is_any_mod = spans_to_is_any_modality(n, packed.spans)
        valid = (
            (labels != self.ignore_index)
            & (labels != self.null_text_id)
            & ~is_any_mod
        )
        kept = valid.sum().astype(jnp.float32)
        safe_labels = jnp.where(valid, labels, 0)
        if chunked:
            ce_sum = self._chunked_ce(params, embed, safe_labels, valid)
        else:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            label_logp = jnp.take_along_axis(
                logp, safe_labels[..., None], axis=-1
            )[..., 0]
            ce_sum = -(label_logp * valid).sum()
        if loss_scales is not None:
            kept_g = loss_scales["kept"]
            total_tokens = loss_scales["total_tokens"]
        else:
            kept_g = kept
        text_loss = ce_sum / jnp.maximum(kept_g, 1.0)
        text_frac = kept_g / total_tokens

        # ---- per-type flow losses ----
        if loss_scales is not None:
            type_token_counts = loss_scales["type_token_counts"]
        else:
            mod_mask = spans_to_modality_mask(n, packed.spans, T)  # [b,t,m,n]
            type_token_counts = mod_mask.any(axis=2).sum(axis=(0, 2))  # [t]
        fracs = type_token_counts.astype(jnp.float32) / total_tokens

        flow_losses, velocity_losses, recon_losses = [], [], []

        if has_velocity:
            ema_keys = jax.random.split(rng_noise_ema, max(len(packed.groups), 1))
            # the EMA velocity target is conditioned on the REAL text: the
            # reference copies the sample before its CFG dropout block
            # (ref :2334-2337), so CFG-dropped samples still get a
            # clean-text velocity target
            packed_ema = packed.replace(text=packed.text[:, :-1])
            _, _, ema_pred_flows, _, _, _ = self._joint_core(
                ema_params,
                packed_ema,
                orig_times + velocity_delta,
                ema_keys,
                deterministic=True,
                return_logits=False,  # EMA pass only needs the flows
                pipeline=pipeline,
            )
            ema_pred_flows = jax.lax.stop_gradient(ema_pred_flows)

        for t in range(T):
            sse = jnp.zeros(())
            cnt = 0
            v_sse = jnp.zeros(())
            r_parts = []
            for gi, g in enumerate(packed.groups):
                if g.modality_type != t:
                    continue
                diff = pred_flows[gi] - flows[gi]
                sse = sse + jnp.sum(diff.astype(jnp.float32) ** 2)
                cnt += int(np.prod(diff.shape))
                if has_velocity:
                    vd = pred_flows[gi] - ema_pred_flows[gi]
                    v_sse = v_sse + jnp.sum(vd.astype(jnp.float32) ** 2)
                if self.has_recon_loss:
                    t_inst = times[g.batch_idx, g.span_rows]
                    t_b = t_inst.reshape(t_inst.shape + (1,) * (pred_flows[gi].ndim - 1))
                    recon = noises[gi] + pred_flows[gi] * (1.0 - t_b)
                    per_inst = jnp.mean(
                        (recon - noised_groups[gi].latents) ** 2,
                        axis=tuple(range(1, recon.ndim)),
                    )
                    r_parts.append(per_inst)

            if loss_scales is not None:
                # dynamic f32 scalar (not jit-static): a shape change in one
                # microbatch must not retrace the others' accum_grad traces
                denom = jnp.maximum(loss_scales["elem_counts"][t], 1.0)
            else:
                denom = float(max(cnt, 1))
            flow_losses.append(sse / denom)
            if has_velocity:
                velocity_losses.append(v_sse / denom)
            if self.has_recon_loss:
                if r_parts:
                    per_inst_all = jnp.concatenate(r_parts)
                    if loss_scales is not None:
                        inst_g = jnp.maximum(
                            loss_scales["inst_counts"][t], 1.0
                        )
                        recon_losses.append(per_inst_all.sum() / inst_g)
                    else:
                        recon_losses.append(per_inst_all.mean())
                else:
                    recon_losses.append(jnp.zeros(()))

        flow_total = sum(
            fl * fr for fl, fr in zip(flow_losses, fracs)
        ) if flow_losses else jnp.zeros(())

        total = (
            text_loss * text_frac * self.text_loss_weight
            + flow_total * self.flow_loss_weight
        )
        if has_velocity:
            total = total + sum(
                vl * fr for vl, fr in zip(velocity_losses, fracs)
            ) * self.velocity_consistency_loss_weight
        if self.has_recon_loss:
            total = total + sum(
                rl * fr for rl, fr in zip(recon_losses, fracs)
            ) * self.reconstruction_loss_weight

        return total, LossBreakdown(
            total=total,
            text=text_loss,
            flow=flow_losses,
            velocity=velocity_losses if has_velocity else None,
            recon=recon_losses if self.has_recon_loss else None,
        )

    def loss_denominators(self, packed: PackedBatch, rng, train: bool = True):
        """The joint loss's normalization constants for one (micro)batch —
        none depend on params, so gradient accumulation can compute them
        up front, sum them across microbatches (`sum_loss_denominators`),
        and inject the totals into each microbatch's `_loss_impl` via
        `loss_scales`. Mirrors `_loss_impl`'s preamble exactly: the same
        rng split and CFG-dropout draw (`kept` counts post-dropout text
        labels), the same shift, the same span masks.

        The array-valued pieces run in ONE jitted dispatch (on a tunneled
        TPU each eager op pays RTT); elem/inst counts are pure Python from
        group shapes and stay host-side, returned as f32 arrays so the
        accumulation traces treat them as dynamic (no per-shape retrace).
        """
        T = self.num_modalities
        ignore_index, null_text_id = self.ignore_index, self.null_text_id
        prob_uncond = self.prob_uncond

        def denoms_arrays(text, cfg_mask, spans, total_tokens, rng):
            b = text.shape[0]
            _, rng_cfg, _, _ = jax.random.split(rng, 4)
            if train and prob_uncond > 0:
                drop = jax.random.uniform(rng_cfg, (b,)) < prob_uncond
                text = jnp.where(
                    drop[:, None] & cfg_mask, null_text_id, text
                )
            labels = text[:, 1:]
            n = labels.shape[1]
            is_any_mod = spans_to_is_any_modality(n, spans)
            valid = (
                (labels != ignore_index)
                & (labels != null_text_id)
                & ~is_any_mod
            )
            mod_mask = spans_to_modality_mask(n, spans, T)
            return (
                valid.sum().astype(jnp.float32),
                total_tokens.astype(jnp.float32),
                mod_mask.any(axis=2).sum(axis=(0, 2)).astype(jnp.float32),
            )

        fn = self._get_jit(
            f"loss_denoms_t{int(train)}_T{T}", denoms_arrays
        )
        kept, total_tokens, type_token_counts = fn(
            packed.text, packed.cfg_mask, packed.spans,
            packed.total_tokens, rng,
        )
        elem_counts = [0] * T
        inst_counts = [0] * T
        for g in packed.groups:
            elem_counts[g.modality_type] += int(np.prod(g.latents.shape))
            inst_counts[g.modality_type] += int(g.latents.shape[0])
        return {
            "kept": kept,
            "total_tokens": total_tokens,
            "type_token_counts": type_token_counts,
            "elem_counts": jnp.asarray(elem_counts, jnp.float32),
            "inst_counts": jnp.asarray(inst_counts, jnp.float32),
        }

    @staticmethod
    def sum_loss_denominators(denoms):
        """Combine per-microbatch `loss_denominators` dicts into the global
        scales to inject into every microbatch's loss."""
        out = dict(denoms[0])
        for d in denoms[1:]:
            out["kept"] = out["kept"] + d["kept"]
            out["total_tokens"] = out["total_tokens"] + d["total_tokens"]
            out["type_token_counts"] = (
                out["type_token_counts"] + d["type_token_counts"]
            )
            out["elem_counts"] = out["elem_counts"] + d["elem_counts"]
            out["inst_counts"] = out["inst_counts"] + d["inst_counts"]
        return out

    def _get_jit(self, name, fn, **jit_kw):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn, **jit_kw)
        return self._jit_cache[name]

    def loss(
        self,
        params,
        batch,
        rng,
        *,
        times=None,
        num_modalities_to_times_fn=None,
        velocity_consistency_ema_params=None,
        velocity_consistency_delta_time: float = 1e-3,
        prob_uncond: Optional[float] = None,
        return_breakdown: bool = False,
        train: bool = True,
        packed: Optional[PackedBatch] = None,
        pipeline=None,  # None | (mesh, microbatches) | (mesh, microbatches,
        # 'gpipe'|'1f1b'): run the joint loss pipeline-parallel over the
        # mesh's 'pipe' axis — GPipe trunk (parallel/pipeline.py) or the
        # 1F1B in-schedule loss (models/pipeline_loss.py). Requires
        # unet_skips=False, num_residual_streams=1, dropout=0;
        # Trainer(pipeline_microbatches=, pipeline_schedule=) is the
        # managed entry point.
    ):
        """Joint multimodal training loss on a ragged batch (or PackedBatch).

        Equivalent surface of reference `forward(list[ModalitySample])`
        (transfusion.py:2257-2949)."""
        if packed is None:
            batch = self.encode_modalities(batch)
            packed = self.pack(
                batch, wrap_sos_eos=True, add_meta=True, shift_friendly=True
            )

        if num_modalities_to_times_fn is not None and times is None:
            num_mods = np.asarray((packed.spans[..., 2] > 0).sum(-1))
            times = jnp.asarray(num_modalities_to_times_fn(num_mods))
            if times.shape[1] < packed.spans.shape[1]:
                times = jnp.pad(
                    times, ((0, 0), (0, packed.spans.shape[1] - times.shape[1]))
                )

        fn = self._get_jit(
            "loss",
            functools.partial(self._loss_impl),
            static_argnames=(
                "prob_uncond", "velocity_delta", "train", "pipeline"
            ),
        )
        total, breakdown = fn(
            params,
            jax.tree.map(jnp.asarray, packed),
            rng,
            times,
            velocity_consistency_ema_params,
            prob_uncond=float(default(prob_uncond, self.prob_uncond)),
            velocity_delta=float(velocity_consistency_delta_time),
            train=train,
            pipeline=pipeline,
        )
        if return_breakdown:
            return total, breakdown
        return total

    # ------------------------------------------------------------------
    # text-only path (reference forward_text :1951-2010)
    # ------------------------------------------------------------------

    def _text_loss_impl(self, params, text):
        inp, labels = text[:, :-1], text[:, 1:]
        logits, _ = self.core.apply(params, inp, method="text_forward")
        logits = logits.astype(jnp.float32)
        text_only = jnp.arange(self.vocab_size) < self.num_text_tokens
        logits = jnp.where(text_only[None, None], logits, max_neg_value())
        logp = jax.nn.log_softmax(logits, axis=-1)
        valid = labels != self.ignore_index
        label_logp = jnp.take_along_axis(
            logp, jnp.where(valid, labels, 0)[..., None], axis=-1
        )[..., 0]
        return -(label_logp * valid).sum() / jnp.maximum(valid.sum(), 1)

    def forward_text(self, params, text, return_loss: bool = True):
        text = jnp.asarray(text)
        if return_loss:
            fn = self._get_jit("text_loss", self._text_loss_impl)
            return fn(params, text)
        fn = self._get_jit(
            "text_logits",
            lambda p, t: self.core.apply(p, t, method="text_forward")[0],
        )
        return fn(params, text)

    # ------------------------------------------------------------------
    # modality-only path (reference forward_modality :2041-2197)
    # ------------------------------------------------------------------

    def _modality_flow(self, params, noised, times, modality_type: int):
        """Predicted flow in latent space from the current (noised) state."""
        out = self.core.apply(
            params, noised, times, modality_type, method="modality_forward"
        )
        if self.model_output_clean:
            out = model_output_to_flow(out, noised, times, self.eps)
        return out

    def _modality_loss_impl(
        self,
        params,
        latents,  # clean, channel-last [b, *shape, d]
        orig_input,  # user-layout original input (pre-encode) for recon
        rng,
        times,  # None | [b]
        ema_params,
        modality_type: int,
        velocity_delta: float,
        decoder,  # None | (module, params)
        channel_first: bool,
    ):
        b = latents.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        if times is None:
            times = jax.random.uniform(rng_t, (b,))

        has_velocity = ema_params is not None
        orig_times = times
        if has_velocity:
            times = times * (1.0 - velocity_delta)

        noise = jax.random.normal(rng_n, latents.shape)
        noised, flow = noise_data(latents, noise, times)

        pred_flow = self._modality_flow(params, noised, times, modality_type)
        flow_loss = jnp.mean((pred_flow - flow) ** 2)

        velocity_loss = jnp.zeros(())
        if has_velocity:
            # reference :2152-2165: EMA flow predicted from the *clean*
            # latents at t + delta, compared against the true flow
            ema_flow = self._modality_flow(
                ema_params, latents, orig_times + velocity_delta, modality_type
            )
            velocity_loss = jnp.mean(
                (flow - jax.lax.stop_gradient(ema_flow)) ** 2
            )

        recon_loss = jnp.zeros(())
        if self.has_recon_loss:
            t_b = times.reshape(times.shape + (1,) * (latents.ndim - 1))
            recon = noise + pred_flow * (1.0 - t_b)
            if decoder is not None:
                dec_module, dec_params = decoder
                if channel_first:
                    recon = jnp.moveaxis(recon, -1, 1)
                recon = jax.lax.stop_gradient(dec_module.apply(dec_params, recon))
            recon_loss = jnp.mean((recon - orig_input) ** 2)

        total = (
            flow_loss
            + velocity_loss * self.velocity_consistency_loss_weight
            + recon_loss * self.reconstruction_loss_weight
        )
        return total, (flow_loss, velocity_loss, recon_loss)

    def forward_modality(
        self,
        params,
        modalities,
        rng=None,
        times=None,
        modality_type: Optional[int] = None,
        encode_modality: bool = True,
        velocity_consistency_ema_params=None,
        velocity_consistency_delta_time: float = 1e-5,
        return_loss: bool = True,
        return_loss_breakdown: bool = False,
    ):
        if self.num_modalities > 1:
            assert modality_type is not None, (
                "modality_type required with more than one modality"
            )
        modality_type = default(modality_type, 0)
        mc = self.modalities[modality_type]

        orig = jnp.asarray(modalities, jnp.float32)
        x = orig
        if encode_modality and self.encoders[modality_type] is not None:
            x = self._aux_apply(self.encoders, modality_type, x)

        if mc.channel_first_latent and x.ndim > 2:
            x = jnp.moveaxis(x, 1, -1)  # -> channel-last internal layout

        if not return_loss:
            assert times is not None
            fn = self._get_jit(
                f"mod_flow_{modality_type}",
                functools.partial(self._modality_flow, modality_type=modality_type),
            )
            out = fn(params, x, jnp.asarray(times))
            if mc.channel_first_latent and out.ndim > 2:
                out = jnp.moveaxis(out, -1, 1)
            return out

        rng = default(rng, jax.random.PRNGKey(0))
        decoder = None
        if self.has_recon_loss and self.decoders[modality_type] is not None:
            dmod, dparams = self.decoders[modality_type]
            if dparams is None:
                probe = x if not mc.channel_first_latent else jnp.moveaxis(x, -1, 1)
                dparams = dmod.init(jax.random.PRNGKey(0), probe)
                self.decoders[modality_type][1] = dparams
            decoder = (dmod, dparams)

        fn = self._get_jit(
            f"mod_loss_{modality_type}_{decoder is not None}",
            functools.partial(
                self._modality_loss_impl,
                modality_type=modality_type,
                decoder=decoder,
                channel_first=mc.channel_first_latent,
            ),
            static_argnames=("velocity_delta",),
        )
        total, parts = fn(
            params,
            x,
            orig,
            rng,
            None if times is None else jnp.asarray(times),
            velocity_consistency_ema_params,
            velocity_delta=float(velocity_consistency_delta_time),
        )
        if return_loss_breakdown:
            return total, parts
        return total

    # ------------------------------------------------------------------
    # reference-style dispatching entry (forward :2257-2325)
    # ------------------------------------------------------------------

    def forward(self, params, batch, rng=None, **kwargs):
        if hasattr(batch, "dtype"):
            arr = jnp.asarray(batch)
            if jnp.issubdtype(arr.dtype, jnp.integer):
                return self.forward_text(
                    params, arr, return_loss=kwargs.pop("return_loss", True)
                )
            return self.forward_modality(params, arr, rng=rng, **kwargs)
        return self.loss(params, batch, default(rng, jax.random.PRNGKey(0)), **kwargs)

    def __call__(self, batch, rng=None, **kwargs):
        assert self.params is not None, "init_params first (stateful call)"
        return self.forward(self.params, batch, rng=rng, **kwargs)

    # ------------------------------------------------------------------
    # text-only generation (reference generate_text_only :2015-2038)
    # TPU-native: KV ring-buffer cache + lax.scan (the reference re-forwards
    # the full prefix every step)
    # ------------------------------------------------------------------

    def _make_decode_cache(
        self, batch, n0, steps, quantize, track_mask=False, transposed=None
    ):
        """Cache for the scanned text-decode paths: capacity rounded to a
        128 multiple so the Pallas decode kernel's block sizes divide it
        (slots past idx are masked invalid); flash models store it
        transposed ([.., d, cap]) — the layout the decode kernel streams —
        unless the serving policy picked the dense path (transposed=False).
        Returns (cache, cap)."""
        cap = -(-(n0 + steps) // 128) * 128
        if transposed is None:
            transposed = self.transformer_cfg.get("attn_impl") == "flash"
        cache = make_kv_cache(
            self.transformer_cfg["depth"], batch,
            self.transformer_cfg.get("heads", 8), cap,
            self.transformer_cfg.get("dim_head", 64), dtype=self.dtype,
            track_mask=track_mask,
            quantize="int8" if quantize else None,
            transposed=transposed,
        )
        return cache, cap

    def _resolve_serving_plan(self, cap, batch, kv_quantize):
        """Resolve a user kv_quantize flag (None = auto) into
        (quantize, transposed) via the measured serving policy
        (models/serving.py). Explicit flags keep the legacy layout rule
        (transposed iff flash) so hand-tuned setups are untouched."""
        flash = self.transformer_cfg.get("attn_impl") == "flash"
        if kv_quantize is not None:
            return bool(kv_quantize), flash
        from transfusion_tpu.models.serving import plan_serving

        plan = plan_serving(
            cap, batch,
            laser=bool(self.transformer_cfg.get("attn_laser", False)),
            flash=flash,
        )
        logger.debug("serving auto-policy: %s", "; ".join(plan.reasons))
        return plan.kv_quantize, plan.use_decode_kernel and flash

    def _sample_text_tok(self, key, logits_last, temperature, min_p):
        """Sample next text token from [b, vocab] logits. Masks to text-only
        ids BEFORE min-p (reference forward_text masks logits first,
        :1994-2010): min-p over the full vocab can -inf every text id when
        special ids dominate, making argmax land on a masked (finite
        max_neg) non-text id."""
        from transfusion_tpu.ops.flow import gumbel_sample

        text_only = jnp.arange(self.vocab_size) < self.num_text_tokens
        masked = jnp.where(
            text_only[None], logits_last.astype(jnp.float32), -jnp.inf
        )
        return gumbel_sample(key, min_p_filter(masked, min_p), temperature)

    def _gen_text_impl(
        self, params, prompt, rng, *, steps, temperature, min_p,
        quantize=False, transposed=None,
    ):
        b, n0 = prompt.shape
        cache, _ = self._make_decode_cache(
            b, n0, steps, quantize, transposed=transposed
        )
        logits, cache = self.core.apply(
            params, prompt, cache, method="text_forward", prefill=True
        )

        def sample_tok(key, logits_last):
            return self._sample_text_tok(key, logits_last, temperature, min_p)

        def step(carry, _):
            cache, logits_last, rng = carry
            rng, key = jax.random.split(rng)
            tok = sample_tok(key, logits_last)  # [b]
            pos = cache["idx"] + jnp.arange(1)
            logits, cache = self.core.apply(
                params, tok[:, None], cache, pos, method="text_forward"
            )
            return (cache, logits[:, -1], rng), tok

        (_, _, _), toks = jax.lax.scan(
            step, (cache, logits[:, -1], rng), None, length=steps
        )
        return toks.T  # [b, steps]

    def _gen_text_ragged_impl(
        self, params, prompt, lengths, rng, *, steps, temperature, min_p,
        quantize=False, transposed=None,
    ):
        """Ragged batched decode: prompt rows padded to a rectangle, row i's
        real history is lengths[i] tokens. Prefill attends chunk-causally
        (padding is at the tail, so real rows never see it); decode then
        runs with PER-ROW cache write offsets (cache idx as Int[b]) so every
        request continues from its own history end — continuous-batching
        style serving, which the rectangular path cannot express."""
        from transfusion_tpu.models.transformer import cache_mark_valid

        b, n0 = prompt.shape
        cache, cap = self._make_decode_cache(
            b, n0, steps, quantize, track_mask=True, transposed=transposed
        )
        cache["mask"] = jnp.arange(cap)[None, :] < lengths[:, None]
        logits, cache = self.core.apply(
            params, prompt, cache, method="text_forward", prefill=True
        )
        last = logits[jnp.arange(b), lengths - 1]  # per-row last real token
        cache = {**cache, "idx": lengths.astype(jnp.int32)}  # go per-row

        def sample_tok(key, logits_last):
            return self._sample_text_tok(key, logits_last, temperature, min_p)

        def step(carry, _):
            cache, logits_last, rng = carry
            rng, key = jax.random.split(rng)
            tok = sample_tok(key, logits_last)  # [b]
            pos = cache["idx"][:, None]  # Int[b, 1] absolute positions
            cache = cache_mark_valid(cache, jnp.ones((b, 1), bool))
            logits, cache = self.core.apply(
                params, tok[:, None], cache, pos, method="text_forward"
            )
            return (cache, logits[:, -1], rng), tok

        (_, _, _), toks = jax.lax.scan(
            step, (cache, last, rng), None, length=steps
        )
        return toks.T  # [b, steps]

    def generate_text_only(
        self,
        params,
        prompt,
        seq_len: int,
        rng=None,
        temperature: float = 1.5,
        min_p: float = 0.1,
        kv_quantize: Optional[bool] = None,  # int8 KV cache (serving:
        # halves decode-time cache bandwidth vs bf16; see make_kv_cache).
        # None (default) = auto: the measured serving policy
        # (models/serving.py) picks int8 AND the decode-kernel cache layout
        # from (capacity, batch); an explicit bool forces the dtype and
        # keeps the legacy layout rule
        prompt_lengths=None,  # Int[b] — ragged serving: row i's real
        # history is prompt[i, :prompt_lengths[i]] (rows padded to the
        # rectangle); every row decodes seq_len - prompt.shape[-1] tokens
        # from its own history end
    ):
        prompt = jnp.asarray(prompt)
        steps = max(0, seq_len - prompt.shape[-1])
        if steps == 0:
            return prompt[..., 0:0]
        rng = default(rng, jax.random.PRNGKey(0))
        b = prompt.shape[0] if prompt.ndim == 2 else 1
        cap = -(-seq_len // 128) * 128
        quantize, transposed = self._resolve_serving_plan(cap, b, kv_quantize)
        if prompt_lengths is not None:
            fn = self._get_jit(
                "gen_text_ragged",
                functools.partial(self._gen_text_ragged_impl),
                static_argnames=(
                    "steps", "temperature", "min_p", "quantize", "transposed"
                ),
            )
            return fn(
                params, prompt, jnp.asarray(prompt_lengths, jnp.int32), rng,
                steps=steps, temperature=float(temperature),
                min_p=float(min_p), quantize=quantize, transposed=transposed,
            )
        fn = self._get_jit(
            "gen_text",
            functools.partial(self._gen_text_impl),
            static_argnames=(
                "steps", "temperature", "min_p", "quantize", "transposed"
            ),
        )
        return fn(
            params, prompt, rng,
            steps=steps, temperature=float(temperature), min_p=float(min_p),
            quantize=quantize, transposed=transposed,
        )

    def generate_text_batch(
        self,
        params,
        prompts,  # list of 1-D int arrays (ragged histories)
        max_new_tokens: int,
        **kwargs,
    ):
        """Serving convenience: batch ragged requests, decode max_new_tokens
        each. Returns Int[b, max_new_tokens].

        The rectangle width is bucketed to the next power-of-two multiple
        of 128 so a serving loop with drifting max-history lengths compiles
        O(log max_len) decode traces, not one per width (same policy as the
        uncached sample() loop)."""
        lengths = [int(np.asarray(p).size) for p in prompts]
        assert min(lengths) >= 1, (
            "generate_text_batch: every prompt needs >= 1 token (an empty "
            "row has no position to continue from — seed it with a BOS/sos "
            f"token); got lengths {lengths}"
        )
        L0 = max(lengths)
        chunks = -(-L0 // 128)
        L0 = 128 * (1 << (chunks - 1).bit_length())  # width bucket
        arr = np.zeros((len(prompts), L0), np.int32)
        for i, p in enumerate(prompts):
            arr[i, : lengths[i]] = np.asarray(p, np.int32).reshape(-1)
        return self.generate_text_only(
            params, arr, seq_len=L0 + max_new_tokens,
            prompt_lengths=np.asarray(lengths, np.int32), **kwargs,
        )

    # ------------------------------------------------------------------
    # modality-only generation (reference generate_modality_only :2202-2254)
    # ------------------------------------------------------------------

    def _gen_modality_impl(self, params, noise, *, modality_type, steps):
        bs = noise.shape[0]

        def flow(t, y):
            times = jnp.full((bs,), t)
            return self._modality_flow(params, y, times, modality_type)

        times = jnp.linspace(0.0, 1.0, steps)
        return odeint(flow, noise, times, method=self.odeint_method)

    def generate_modality_only(
        self,
        params=None,
        batch_size: int = 1,
        modality_type: Optional[int] = None,
        fixed_modality_shape: Optional[tuple] = None,
        modality_steps: int = 16,
        rng=None,
        return_unprocessed_modalities: bool = False,
    ):
        params = default(params, self.params)
        if self.num_modalities > 1:
            assert modality_type is not None
        modality_type = default(modality_type, 0)
        mc = self.modalities[modality_type]

        shape = default(fixed_modality_shape, mc.default_shape)
        assert shape is not None, "set modality_default_shape or pass fixed_modality_shape"

        rng = default(rng, jax.random.PRNGKey(0))
        noise = jax.random.normal(rng, (batch_size, *shape, mc.dim_latent))

        fn = self._get_jit(
            f"gen_mod_{modality_type}",
            functools.partial(self._gen_modality_impl),
            static_argnames=("modality_type", "steps"),
        )
        sampled = fn(params, noise, modality_type=modality_type, steps=modality_steps)

        if not return_unprocessed_modalities and self.decoders[modality_type] is not None:
            if mc.channel_first_latent and sampled.ndim > 2:
                sampled = jnp.moveaxis(sampled, -1, 1)
            return self._aux_apply(self.decoders, modality_type, sampled)

        if mc.channel_first_latent and sampled.ndim > 2:
            sampled = jnp.moveaxis(sampled, -1, 1)
        return sampled

    # ------------------------------------------------------------------
    # full multimodal sampling (reference sample :1622-1948)
    # ------------------------------------------------------------------

    def _parse_modality_shape(self, text_seq, modality_type: int):
        """Parse the shape meta string preceding the last [som]."""
        mc = self.modalities[modality_type]
        default_shape = mc.default_shape

        meta = tokens_since_rightmost_id(text_seq, self.meta_id)
        shape = None
        if meta.size > 0:
            meta_str = decode_chars(meta[:-1], offset=self.char_offset)
            # the comma/digit pre-gate only applies to the DEFAULT codec;
            # a custom to_modality_shape_fn defines its own format and must
            # get the raw string (its exceptions still mean fallback)
            parts = meta_str.split(",")
            gate_ok = mc.to_shape_fn is not default_to_modality_shape_fn or (
                bool(meta_str) and all(p.isdigit() and int(p) > 0 for p in parts)
            )
            if gate_ok and meta_str:
                try:
                    shape = tuple(mc.to_shape_fn(meta_str))
                except Exception:
                    shape = None
            if shape is None:
                assert default_shape is not None, (
                    "invalid modality meta information — set "
                    "modality_default_shape for a fallback"
                )
                shape = default_shape

        shape = default(shape, default_shape)

        if self.fallback_to_default_shape_if_invalid:
            if mc.num_dim is not None and shape is not None and len(shape) != mc.num_dim:
                logger.warning(
                    "invalid modality shape %s for modality %s; falling back "
                    "to default %s", shape, modality_type, default_shape,
                )
                shape = default_shape

        assert shape is not None, (
            f"no valid shape for modality {modality_type}; set "
            "modality_default_shape"
        )
        assert mc.num_dim is None or mc.num_dim == len(shape), (
            f"modality {modality_type} expects {mc.num_dim} dims, got {shape}"
        )
        return shape

    def _sample_text_step_impl(self, params, packed, rng, *, temperature, min_p):
        b, n = packed.text.shape
        m = packed.spans.shape[1]
        times = jnp.ones((b, m))  # past modalities conditioned as clean
        logits, _, _, _, _ = self.core.apply(
            params, packed, times, method="joint"
        )
        last = logits[0, packed.lengths[0] - 1].astype(jnp.float32)
        filtered = min_p_filter(last, min_p)
        if temperature == 0.0:
            return jnp.argmax(filtered)
        return jax.random.categorical(rng, filtered / temperature)

    def _sample_ode_impl(
        self,
        params,
        packed,
        noise,
        cfg_scale,
        *,
        gi,
        row_cond,
        row_uncond,
        span_row,
        steps,
        use_cfg,
    ):
        b = packed.text.shape[0]
        m = packed.spans.shape[1]

        def flow(t, y):
            g = packed.groups[gi]
            lat = g.latents.at[row_cond].set(y)
            if use_cfg:
                lat = lat.at[row_uncond].set(y)
            groups = tuple(
                g.replace(latents=lat) if i == gi else og
                for i, og in enumerate(packed.groups)
            )
            times = jnp.where(
                jnp.arange(m)[None, :] == span_row, t, 1.0
            ) * jnp.ones((b, 1))
            _, _, pred_flows, _, _ = self.core.apply(
                params,
                packed.replace(groups=groups),
                times,
                return_logits=False,
                method="joint",
            )
            pf = pred_flows[gi]
            cond = pf[row_cond]
            if not use_cfg:
                return cond
            uncond = pf[row_uncond]
            return uncond + cfg_scale * (cond - uncond)

        times_grid = jnp.linspace(0.0, 1.0, steps)
        return odeint(flow, noise, times_grid, method=self.odeint_method)

    def _prompt_to_items(self, prompt) -> list:
        """Normalize a sample() prompt into the canonical item list
        ([sos] + text arrays / (type, latents) tuples, contiguous text
        concatenated) — reference :1648-1693."""
        items: list = []
        if prompt is not None:
            p = prompt
            if hasattr(p, "dtype") and not isinstance(p, tuple):
                arr = np.asarray(p)
                if np.issubdtype(arr.dtype, np.floating):
                    p = (0, arr)
                else:
                    p = [arr.reshape(-1).astype(np.int32)]
            if isinstance(p, tuple):
                mtype, modality = p
                mc = self.modalities[mtype]
                modality = np.asarray(modality, np.float32)
                if self.encoders[mtype] is not None:
                    modality = np.asarray(
                        self._aux_apply(
                            self.encoders, mtype, modality[None]
                        )
                    )[0]
                cl = to_channel_last(modality, mc.channel_first_latent)
                shape_str = ",".join(map(str, cl.shape[:-1]))
                meta_ids = [self.meta_id] + [
                    self.char_offset + ord(c) for c in shape_str
                ] + [self.som_ids[mtype]]
                items = [
                    np.asarray(meta_ids, np.int32),
                    (mtype, to_user_layout(cl, mc.channel_first_latent)),
                    np.asarray([self.eom_ids[mtype]], np.int32),
                ]
            else:
                items = list(p)

        sample_items = [np.asarray([self.sos_id], np.int32)] + [
            it if isinstance(it, tuple)
            else np.asarray(it).reshape(-1).astype(np.int32)
            for it in normalize_sample(items)
        ]
        from transfusion_tpu.utils.helpers import concat_contiguous_text

        return concat_contiguous_text(sample_items)

    def sample_batch(
        self,
        params=None,
        prompts=None,  # list of sample()-style prompts (one per request)
        **kwargs,
    ):
        """Batched multimodal sampling: run R sample() state machines with
        shared batched dispatches (models/sample_batch.py). The reference's
        sample() is strictly batch-1 (transfusion.py:1625-1948)."""
        from transfusion_tpu.models.sample_batch import sample_batch

        return sample_batch(
            self, default(params, self.params), prompts, **kwargs
        )

    def sample(
        self,
        params=None,
        prompt=None,
        rng=None,
        max_length: int = 2048,
        text_temperature: float = 1.5,
        text_min_p: float = 0.1,
        cache_kv: bool = False,  # KV-cached fast path: prefill once, then
        # per-token text decode + tail-only ODE steps (_sample_cached)
        kv_quantize: Optional[bool] = None,  # with cache_kv: int8 KV cache
        # (serving — halves cache HBM traffic vs bf16; see make_kv_cache).
        # None (default) = auto via the measured serving policy
        # (models/serving.py); an explicit bool forces it
        fixed_modality_shape: Optional[tuple] = None,
        init_modality_noise=None,
        modality_steps: int = 16,
        return_unprocessed_modalities: bool = False,
        cfg_scale: float = 3.0,
        incremental_cfg_cache: bool = True,  # with cache_kv + CFG: maintain
        # the uncond stream in the same batch-2 cache (no per-modality
        # O(history) uncond prefill). False = rebuild per segment (the
        # reference's cost profile; results identical)
    ):
        params = default(params, self.params)
        rng = default(rng, jax.random.PRNGKey(0))

        if self.num_text_tokens == 0:
            logger.warning(
                "num_text_tokens == 0 — forwarding to generate_modality_only"
            )
            return self.generate_modality_only(params, batch_size=1, rng=rng)

        sample_items = self._prompt_to_items(prompt)

        if cache_kv:
            sample_items = self._sample_cached(
                params, sample_items, rng, max_length, text_temperature,
                text_min_p, fixed_modality_shape, init_modality_noise,
                modality_steps, cfg_scale, kv_quantize=kv_quantize,
                incremental_cfg=incremental_cfg_cache,
            )
            if return_unprocessed_modalities:
                return sample_items
            return self.decode_modalities(sample_items)

        # length-bucketed packing: the jitted step functions retrace per
        # padded length, and text grows across the loop — pad to the next
        # power-of-two multiple of pad_multiple so the number of traces is
        # O(log max_length) instead of O(max_length / pad_multiple), each a
        # 0.5-1 s remote compile on the axon backend
        def bucket_pack(samples):
            packed = self.pack(samples, wrap_sos_eos=False, add_meta=False)
            L = packed.text.shape[1]
            mult = self.pad_multiple
            chunks = max(1, -(-L // mult))
            bucket = mult * (1 << (chunks - 1).bit_length())
            if bucket != L:
                packed = self.pack(
                    samples, wrap_sos_eos=False, add_meta=False,
                    pad_multiple=bucket,
                )
            return packed

        curr_length = 0
        curr_modality_id = None
        modality_shape = None
        is_decoding_text = True

        def maybe_transition():
            nonlocal curr_modality_id, modality_shape, is_decoding_text
            last = sample_items[-1]
            if isinstance(last, tuple) or len(last) == 0:
                return
            tok = int(last[-1])
            if tok not in self.som_ids:
                return
            curr_modality_id = self.som_ids.index(tok)
            if fixed_modality_shape is not None:
                modality_shape = fixed_modality_shape
            else:
                modality_shape = self._parse_modality_shape(last, curr_modality_id)
            is_decoding_text = False

        maybe_transition()

        use_cfg = cfg_scale != 1.0

        while curr_length <= max_length:
            if is_decoding_text:
                packed = bucket_pack([sample_items])
                rng, key = jax.random.split(rng)
                fn = self._get_jit(
                    "sample_text_step",
                    self._sample_text_step_impl,
                    static_argnames=("temperature", "min_p"),
                )
                tok = int(fn(
                    params,
                    jax.tree.map(jnp.asarray, packed),
                    key,
                    temperature=float(text_temperature),
                    min_p=float(text_min_p),
                ))

                last = sample_items[-1]
                if isinstance(last, tuple):
                    sample_items.append(np.asarray([tok], np.int32))
                else:
                    sample_items[-1] = np.concatenate(
                        [last, np.asarray([tok], np.int32)]
                    )
                curr_length += 1

                if tok == self.eos_id:
                    logger.info("eos sampled — stopping")
                    break
                maybe_transition()
            else:
                mid = curr_modality_id
                mc = self.modalities[mid]
                spatial = tuple(modality_shape)
                seq_shape = self.seq_shape_for(mid, spatial)
                L = int(math.prod(seq_shape))

                if init_modality_noise is not None:
                    flat = np.asarray(init_modality_noise)[
                        : int(math.prod(spatial)), : mc.dim_latent
                    ]
                    noise = jnp.asarray(flat).reshape(*spatial, mc.dim_latent)
                else:
                    rng, key = jax.random.split(rng)
                    noise = jax.random.normal(key, (*spatial, mc.dim_latent))

                placeholder = to_user_layout(
                    np.zeros((*spatial, mc.dim_latent), np.float32),
                    mc.channel_first_latent,
                )
                ode_samples = [
                    [*sample_items, (mid, placeholder)],
                ]
                if use_cfg:
                    ode_samples.append([*sample_items, (mid, placeholder)])

                packed = bucket_pack(ode_samples)
                if use_cfg:
                    # uncond row: every text id -> null (reference :1833-1845)
                    text = np.asarray(packed.text).copy()
                    text[1] = np.where(text[1] >= 0, self.null_text_id, text[1])
                    packed = packed.replace(text=text)

                # locate the current instance's rows in its group
                span_row = int(
                    (np.asarray(packed.spans[0, :, 2]) > 0).sum() - 1
                )
                gi = next(
                    i for i, g in enumerate(packed.groups)
                    if g.modality_type == mid
                    and g.latent_shape == spatial
                    and (np.asarray(g.span_rows) == span_row).any()
                )
                g = packed.groups[gi]
                rows = np.nonzero(np.asarray(g.span_rows) == span_row)[0]
                row_cond = int(rows[np.asarray(g.batch_idx)[rows] == 0][0])
                row_uncond = (
                    int(rows[np.asarray(g.batch_idx)[rows] == 1][0])
                    if use_cfg else 0
                )

                fn = self._get_jit(
                    "sample_ode",
                    self._sample_ode_impl,
                    static_argnames=(
                        "gi", "row_cond", "row_uncond", "span_row",
                        "steps", "use_cfg",
                    ),
                )
                sampled = fn(
                    params,
                    jax.tree.map(jnp.asarray, packed),
                    noise,
                    jnp.float32(cfg_scale),
                    gi=gi,
                    row_cond=row_cond,
                    row_uncond=row_uncond,
                    span_row=span_row,
                    steps=int(modality_steps),
                    use_cfg=use_cfg,
                )

                sample_items.append(
                    (mid, to_user_layout(np.asarray(sampled), mc.channel_first_latent))
                )
                sample_items.append(np.asarray([self.eom_ids[mid]], np.int32))

                curr_length += L
                curr_modality_id = None
                modality_shape = None
                is_decoding_text = True

        logger.info("sampling stopped at length %s / %s", curr_length, max_length)

        if return_unprocessed_modalities:
            return sample_items

        return self.decode_modalities(sample_items)

    # ------------------------------------------------------------------
    # cached sampling fast path (cache_kv=True)
    # ------------------------------------------------------------------

    def _prefill_impl(self, params, packed, *, cap, quantize=False, transposed=None):
        from transfusion_tpu.models.transformer import make_kv_cache

        b = packed.text.shape[0]
        depth = self.transformer_cfg["depth"]
        heads = self.transformer_cfg.get("heads", 8)
        dim_head = self.transformer_cfg.get("dim_head", 64)
        if transposed is None:
            transposed = self.transformer_cfg.get("attn_impl") == "flash"
        cache = make_kv_cache(
            depth, b, heads, cap, dim_head, dtype=self.dtype, track_mask=True,
            quantize="int8" if quantize else None,
            transposed=transposed,
        )
        cache["mask"] = jnp.arange(cap)[None, :] < packed.lengths[:, None]
        m = packed.spans.shape[1]
        times = jnp.ones((b, m))
        logits, _, _, _, new_cache = self.core.apply(
            params, packed, times, cache=cache, method="joint"
        )
        last = logits[jnp.arange(b), packed.lengths - 1]
        return last, new_cache

    def _decode_text_impl(self, params, cache, tok, pos, rng, *, temperature, min_p):
        from transfusion_tpu.models.transformer import cache_mark_valid

        cache = cache_mark_valid(cache, jnp.ones((tok.shape[0], 1), bool))
        logits, cache = self.core.apply(
            params, tok, pos, cache, method="decode_text_step"
        )
        last = logits[0, -1].astype(jnp.float32)
        filtered = min_p_filter(last, min_p)
        if temperature == 0.0:
            tok_next = jnp.argmax(filtered)
        else:
            tok_next = jax.random.categorical(rng, filtered / temperature)
        return tok_next, last, cache

    def _ode_cached_impl(
        self, params, cond_cache, uncond_cache, noise, p0, cfg_scale,
        *, modality_type, L, steps, use_cfg, rows=1,
    ):
        """Tail-only CFG ODE over cached history. rows=1: cond (and, with
        use_cfg, a separate uncond cache) — the rebuild-per-segment mode.
        rows=2: ONE batch-2 cache carrying [cond, uncond]; the guidance pair
        is a single batched forward (uncond_cache must be None)."""
        from transfusion_tpu.models.transformer import cache_mark_valid

        rotary = jnp.full((rows, L), p0)
        valid = jnp.ones((rows, L), bool)

        def flow(t, y):
            cc = cache_mark_valid(cond_cache, valid)
            y_in = jnp.broadcast_to(y[None], (rows, *y.shape))
            f, _ = self.core.apply(
                params, y_in, t, rotary, cc, modality_type,
                method="decode_modality_rows",
            )
            if not use_cfg:
                return f[0]
            if rows == 2:
                f_c, f_u = f[0], f[1]
            else:
                uc = cache_mark_valid(uncond_cache, valid)
                f_u, _ = self.core.apply(
                    params, y[None], t, rotary, uc, modality_type,
                    method="decode_modality_rows",
                )
                f_c, f_u = f[0], f_u[0]
            return f_u + cfg_scale * (f_c - f_u)

        grid = jnp.linspace(0.0, 1.0, steps)
        return odeint(flow, noise, grid, method=self.odeint_method)

    def _append_modality_impl(
        self, params, cache, y, p0, *, modality_type, L, rows=1
    ):
        from transfusion_tpu.models.transformer import cache_mark_valid

        cache = cache_mark_valid(cache, jnp.ones((rows, L), bool))
        rotary = jnp.full((rows, L), p0)
        y_in = jnp.broadcast_to(y[None], (rows, *y.shape))
        _, cache = self.core.apply(
            params, y_in, 1.0, rotary, cache, modality_type,
            method="decode_modality_rows",
        )
        return cache

    def _sample_cached(
        self, params, sample_items, rng, max_length, text_temperature,
        text_min_p, fixed_modality_shape, init_modality_noise, modality_steps,
        cfg_scale, kv_quantize=None, incremental_cfg=True,
    ):
        """KV-cached sampling loop: prefill once, then per-token text decode
        and tail-only ODE steps. Functionally equivalent to the uncached
        path; the CONDITIONAL stream's O(history) work is paid once instead
        of per step/token.

        CFG uncond cache: with incremental_cfg (default) the cond and
        uncond streams share ONE batch-2 cache — text decode streams
        [token, null_text_id] rows together and the guidance pair is a
        single batched forward — so the uncond history is maintained
        incrementally and no per-modality O(history) prefill ever happens.
        The per-token decode step is dispatch-floor-bound at these sizes, so
        the second row is nearly free, while the reference re-prefills the
        uncond stream at every modality segment (ref :1847-1854).
        incremental_cfg=False keeps that rebuild-per-segment profile (used
        by the equality test)."""
        use_cfg = cfg_scale != 1.0
        rows = 2 if (use_cfg and incremental_cfg) else 1

        def uncond_of(items):
            # uncond stream: every text id (incl. specials/meta) nulled,
            # modalities kept — exactly the uncond context of training's
            # prob_uncond dropout (cfg_mask)
            return [
                np.where(np.asarray(it) >= 0, self.null_text_id, it)
                if not isinstance(it, tuple)
                else it
                for it in items
            ]

        def seq_stats(items):
            tok_count, collapse = 0, 0
            for it in items:
                if isinstance(it, tuple):
                    mc = self.modalities[it[0]]
                    lat = to_channel_last(
                        np.asarray(it[1]), mc.channel_first_latent
                    )
                    L = int(math.prod(self.seq_shape_for(it[0], lat.shape[:-1])))
                    tok_count += L
                    collapse += L - 1
                else:
                    tok_count += len(it)
            return tok_count, collapse

        tok_count, collapse = seq_stats(sample_items)
        cap = int(
            round_up_to_multiple(tok_count + max_length + 256 + 2, 128)
        )
        kv_quantize, transposed = self._resolve_serving_plan(
            cap, 1, kv_quantize
        )

        def prefill(items, this_cap):
            batch_items = [items]
            if rows == 2:
                batch_items.append(uncond_of(items))
            packed = self.pack(batch_items, wrap_sos_eos=False, add_meta=False)
            fn = self._get_jit(
                "sample_prefill", self._prefill_impl,
                static_argnames=("cap", "quantize", "transposed"),
            )
            return fn(
                params, jax.tree.map(jnp.asarray, packed), cap=this_cap,
                quantize=bool(kv_quantize), transposed=transposed,
            )

        last_logits, cache = prefill(sample_items, cap)
        slots_used = self.pack(
            [sample_items], wrap_sos_eos=False, add_meta=False
        ).seq_len  # device cache idx after prefill

        curr_length = 0
        pending_tok: Optional[int] = None  # sampled but not yet in the cache
        is_decoding_text = [True]
        curr = {"mid": None, "shape": None}

        def transition():
            last = sample_items[-1]
            if isinstance(last, tuple) or len(last) == 0:
                return
            tok = int(last[-1])
            if tok not in self.som_ids:
                return
            curr["mid"] = self.som_ids.index(tok)
            if fixed_modality_shape is not None:
                curr["shape"] = fixed_modality_shape
            else:
                curr["shape"] = self._parse_modality_shape(last, curr["mid"])
            is_decoding_text[0] = False

        def stream_pending(tok_to_stream, key):
            """Write the pending token into the cache; returns next-token
            sample + logits."""
            nonlocal cache, tok_count, slots_used
            pos = tok_count - collapse
            fn = self._get_jit(
                "sample_decode_text", self._decode_text_impl,
                static_argnames=("temperature", "min_p"),
            )
            toks = [[tok_to_stream]]
            if rows == 2:
                toks.append([self.null_text_id])  # uncond row streams null
            tok_arr, logits, cache = fn(
                params, cache,
                jnp.asarray(toks, jnp.int32),
                jnp.asarray([[pos]] * rows, jnp.int32),
                key,
                temperature=float(text_temperature),
                min_p=float(text_min_p),
            )
            tok_count += 1
            slots_used += 1
            return int(tok_arr), logits

        transition()

        while curr_length <= max_length:
            if is_decoding_text[0]:
                rng, key = jax.random.split(rng)
                if pending_tok is None:
                    filtered = min_p_filter(
                        jnp.asarray(last_logits)[0].astype(jnp.float32),
                        text_min_p,
                    )
                    if text_temperature == 0.0:
                        tok = int(jnp.argmax(filtered))
                    else:
                        tok = int(
                            jax.random.categorical(
                                key, filtered / text_temperature
                            )
                        )
                else:
                    tok, _ = stream_pending(pending_tok, key)
                pending_tok = tok

                last = sample_items[-1]
                if isinstance(last, tuple):
                    sample_items.append(np.asarray([tok], np.int32))
                else:
                    sample_items[-1] = np.concatenate(
                        [last, np.asarray([tok], np.int32)]
                    )
                curr_length += 1
                if tok == self.eos_id:
                    break
                transition()
            else:
                mid, spatial = curr["mid"], tuple(curr["shape"])
                mc = self.modalities[mid]
                seq_shape = self.seq_shape_for(mid, spatial)
                L = int(math.prod(seq_shape))

                if pending_tok is not None:
                    rng, key = jax.random.split(rng)
                    stream_pending(pending_tok, key)
                    pending_tok = None

                if slots_used + L + 2 > cap:
                    # capacity exhausted: rebuild the cache at a larger size
                    cap = int(round_up_to_multiple(slots_used + L + 256, 128))
                    last_logits, cache = prefill(sample_items, cap)
                    slots_used = self.pack(
                        [sample_items], wrap_sos_eos=False, add_meta=False
                    ).seq_len

                p0 = tok_count - collapse

                if init_modality_noise is not None:
                    flat = np.asarray(init_modality_noise)[
                        : int(math.prod(spatial)), : mc.dim_latent
                    ]
                    noise = jnp.asarray(flat).reshape(*spatial, mc.dim_latent)
                else:
                    rng, key = jax.random.split(rng)
                    noise = jax.random.normal(key, (*spatial, mc.dim_latent))

                uncond_cache = None
                if use_cfg and rows == 1:
                    # rebuild-per-segment mode: fresh O(history) uncond
                    # prefill (the reference's cost profile, ref :1847-1854)
                    uncond_items = uncond_of(sample_items)
                    u_tok, _ = seq_stats(uncond_items)
                    cap_u = int(round_up_to_multiple(u_tok + L + 2, 128))
                    _, uncond_cache = prefill(uncond_items, cap_u)

                fn = self._get_jit(
                    "sample_ode_cached", self._ode_cached_impl,
                    static_argnames=(
                        "modality_type", "L", "steps", "use_cfg", "rows"
                    ),
                )
                sampled = fn(
                    params, cache, uncond_cache, noise,
                    jnp.int32(p0), jnp.float32(cfg_scale),
                    modality_type=mid, L=L, steps=int(modality_steps),
                    use_cfg=use_cfg, rows=rows,
                )

                fn = self._get_jit(
                    "sample_append_mod", self._append_modality_impl,
                    static_argnames=("modality_type", "L", "rows"),
                )
                cache = fn(
                    params, cache, sampled, jnp.int32(p0),
                    modality_type=mid, L=L, rows=rows,
                )

                sample_items.append(
                    (mid, to_user_layout(
                        np.asarray(sampled), mc.channel_first_latent
                    ))
                )
                sample_items.append(
                    np.asarray([self.eom_ids[mid]], np.int32)
                )
                tok_count += L
                collapse += L - 1
                slots_used += L
                curr_length += L
                pending_tok = self.eom_ids[mid]  # streamed by the next text step
                curr["mid"] = None
                curr["shape"] = None
                is_decoding_text[0] = True

        return sample_items

    # ------------------------------------------------------------------
    # EMA (reference create_ema :1604-1620)
    # ------------------------------------------------------------------

    def create_ema(self, params=None, beta: float = 0.99, **kwargs):
        from transfusion_tpu.training.ema import EMA

        return EMA(self, default(params, self.params), beta=beta, **kwargs)

    def create_dataloader(self, dataset, **kwargs):
        """List-collate dataloader (reference create_dataloader :1597-1602)."""
        from transfusion_tpu.data.dataloader import create_dataloader

        return create_dataloader(dataset, **kwargs)

    def parameters_without_encoder_decoder(self, params=None):
        """API parity with reference :1573-1578. Modality encoders/decoders
        hold their own param trees here (outside the core), so the core
        params ARE the trainable set — returned unchanged."""
        return default(params, self.params)

    def muon_parameters(self, params=None):
        """Boolean mask of the Muon-eligible matrices (reference
        muon_parameters :1580-1595); feed to optax.multi_transform or use
        training.optim.muon_adam_atan2 directly."""
        from transfusion_tpu.training.optim import muon_param_mask

        return muon_param_mask(default(params, self.params))

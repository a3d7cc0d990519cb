"""Weight-porting bridge: reference (torch) checkpoints <-> this framework.

The reference (/root/reference/transfusion_pytorch/transfusion.py) is a torch
nn.Module whose state_dict layout follows its module tree:

  text_embed.weight                                   (ref :1473)
  to_text_logits.weight                               (ref :1475)
  latent_to_model_projs.{t}[.1].weight/.bias          (ref :1443-1461; '.1'
                                                       when channel_first)
  model_to_latent_projs.{t}[.0].weight                (ref :1444, bias=False)
  rotary_emb.freqs                                    (ref :1465; default
                                                       schedule, validated)
  transformer.to_time_cond.0.weights                  (fourier buffer, :1060)
  transformer.to_time_cond.1.weight/.bias             (Linear(d+1, 4d), :1062)
  transformer.layers.{i}.0.weight                     (unet skip proj, :1079)
  transformer.layers.{i}.1.*                          (attn AdaptiveWrapper)
    .layernorm_gamma .layerscale                      (ref :712-715)
    .to_film.weight/.bias .to_ada_ln_zero.weight/.bias(ref :717-722)
    .fn.to_qk.0.weight                                (fused q;k, :886-889)
    .fn.to_v.0.weight                                 (ref :891-894)
    .fn.to_learned_value_residual.0.weight/.bias      (i>0 only, :896-900)
    .fn.to_gates.0.weight                             (ref :902-905)
    .fn.to_out.1.weight                               (ref :913-916)
  transformer.layers.{i}.3.*                          (ff AdaptiveWrapper)
    .fn.net.0.weight/.bias  .fn.net.3.weight/.bias    (GEGLU MLP, :846-861)
  transformer.norm.gamma                              (RMSNorm, :1097)

torch Linear weights are [out, in]; flax kernels are [in, out] — 2-D weights
transpose. Orderings that line up without permutation (verified against the
reference code): fused to_qk rows are [q; k] with '(h d)' head-major packing
(ref Rearrange :888), GEGLU halves are (value, gates) (ref :842-844), rotary
is interleaved-pair with the default theta-10000 schedule.

Scope: num_residual_streams == 1 (the reference default — hyper-connection
modules are parameter-free in that case on both sides), no custom
pre_post_transformer_enc_dec, no axial positional embeddings. Reference
modality encoders/decoders (frozen VAEs etc.) are external auxiliaries in
this framework and are skipped with a notice.
"""

from __future__ import annotations

import numpy as np


_IGNORED_PREFIXES = (
    "rotary_emb.",  # validated separately; derived, not stored, here
    "modality_encoder",  # frozen auxiliaries, managed outside the core tree
    "modality_decoder",
    "zero",
    "text_only_logits_mask",
)


def _to_np(v):
    if hasattr(v, "detach"):  # torch tensor
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def reference_key_map(model):
    """[(ref_key, flax_path, transpose?)] for `model`'s configuration.

    flax_path is a tuple of keys into params['params'].
    """
    cfg = model.transformer_cfg
    depth = cfg["depth"]
    unet_skips = cfg.get("unet_skips", True)
    gate_values = cfg.get("attn_gate_values", True)
    streams = cfg.get("num_residual_streams", 1)
    assert streams == 1, (
        "porting is only defined for num_residual_streams=1 (the reference "
        "default; multi-stream hyper-connection parameterizations differ)"
    )
    assert all(p is None for p in model.pre_post), (
        "cannot port models with custom pre_post_transformer_enc_dec — the "
        "reference stores arbitrary user modules there"
    )
    assert not any(mc.add_pos_emb for mc in model.modalities), (
        "porting axial positional embedding MLPs is not supported"
    )

    T = lambda ref, path: (ref, path, True)  # torch [out,in] -> flax [in,out]
    C = lambda ref, path: (ref, path, False)  # copy

    mapping = [
        C("text_embed.weight", ("text_embed", "embedding")),
        T("to_text_logits.weight", ("to_text_logits", "kernel")),
        C("transformer.to_time_cond.0.weights", ("transformer", "fourier_weights")),
        T("transformer.to_time_cond.1.weight", ("transformer", "to_time_cond", "kernel")),
        C("transformer.to_time_cond.1.bias", ("transformer", "to_time_cond", "bias")),
        C("transformer.norm.gamma", ("transformer", "final_norm", "gamma")),
    ]

    for t, mc in enumerate(model.modalities):
        l_infix = ".1" if mc.channel_first_latent else ""
        m_infix = ".0" if mc.channel_first_latent else ""
        if mc.dim_latent != model.dim:  # else Identity on both sides
            mapping += [
                T(
                    f"latent_to_model_projs.{t}{l_infix}.weight",
                    (f"latent_to_model_{t}", "proj", "kernel"),
                ),
                C(
                    f"latent_to_model_projs.{t}{l_infix}.bias",
                    (f"latent_to_model_{t}", "proj", "bias"),
                ),
            ]
        mapping.append(
            T(
                f"model_to_latent_projs.{t}{m_infix}.weight",
                (f"model_to_latent_{t}", "proj", "kernel"),
            )
        )

    for i in range(depth):
        ref = f"transformer.layers.{i}"
        blk = ("transformer", f"block_{i}")
        if unet_skips and i >= depth / 2:
            mapping.append(
                T(f"{ref}.0.weight", (*blk, f"skip_proj_{i}", "kernel"))
            )
        for ref_slot, ada_name, fn_name in (
            ("1", f"attn_ada_{i}", f"attn_{i}"),
            ("3", f"ff_ada_{i}", f"ff_{i}"),
        ):
            a = f"{ref}.{ref_slot}"
            mapping += [
                C(f"{a}.layernorm_gamma", (*blk, ada_name, "layernorm_gamma")),
                C(f"{a}.layerscale", (*blk, ada_name, "layerscale")),
                T(f"{a}.to_film.weight", (*blk, ada_name, "to_film", "kernel")),
                C(f"{a}.to_film.bias", (*blk, ada_name, "to_film", "bias")),
                T(f"{a}.to_ada_ln_zero.weight", (*blk, ada_name, "to_ada_ln_zero", "kernel")),
                C(f"{a}.to_ada_ln_zero.bias", (*blk, ada_name, "to_ada_ln_zero", "bias")),
            ]
            if ref_slot == "1":  # attention
                mapping += [
                    T(f"{a}.fn.to_qk.0.weight", (*blk, fn_name, "to_qk", "kernel")),
                    T(f"{a}.fn.to_v.0.weight", (*blk, fn_name, "to_v", "kernel")),
                    T(f"{a}.fn.to_out.1.weight", (*blk, fn_name, "to_out", "kernel")),
                ]
                if gate_values:
                    # to_gates exists only when gate_values=True on both
                    # sides (ref :902-905 / layers.py Attention)
                    mapping.append(
                        T(
                            f"{a}.fn.to_gates.0.weight",
                            (*blk, fn_name, "to_gates", "kernel"),
                        )
                    )
                if i > 0:  # learned value-residual mix (ref :896-900)
                    mapping += [
                        T(
                            f"{a}.fn.to_learned_value_residual.0.weight",
                            (*blk, fn_name, "to_value_residual_mix", "kernel"),
                        ),
                        C(
                            f"{a}.fn.to_learned_value_residual.0.bias",
                            (*blk, fn_name, "to_value_residual_mix", "bias"),
                        ),
                    ]
            else:  # feedforward
                mapping += [
                    T(f"{a}.fn.net.0.weight", (*blk, fn_name, "proj_in", "kernel")),
                    C(f"{a}.fn.net.0.bias", (*blk, fn_name, "proj_in", "bias")),
                    T(f"{a}.fn.net.3.weight", (*blk, fn_name, "proj_out", "kernel")),
                    C(f"{a}.fn.net.3.bias", (*blk, fn_name, "proj_out", "bias")),
                ]
    return mapping


def _validate_rotary(state_dict, model):
    key = "rotary_emb.freqs"
    if key not in state_dict:
        return
    freqs = _to_np(state_dict[key])
    dh = model.transformer_cfg.get("dim_head", 64)
    theta = model.transformer_cfg.get("rope_theta", 10000.0)
    want = 1.0 / theta ** (np.arange(0, dh, 2, dtype=np.float32) / dh)
    if freqs.shape != want.shape or not np.allclose(freqs, want, rtol=1e-4):
        raise ValueError(
            "reference checkpoint uses a non-default (learned or custom-theta)"
            " rotary frequency schedule; set transformer rope_theta to match "
            "or retrain — this framework derives rotary frequencies instead "
            "of storing them"
        )


def port_from_reference(state_dict, model, params=None, strict=True):
    """Map a reference state_dict into this framework's param tree.

    state_dict: dict of torch tensors / numpy arrays with reference keys.
    model: a `Transfusion` whose config matches the checkpoint.
    params: optional existing tree (e.g. `model.init_params(rng)`) to update —
        required so non-ported leaves (none today for supported configs) and
        tree structure come from a real init. If None, a fresh init is used.
    strict: raise on missing mapped keys or unconsumed non-auxiliary keys.
    """
    import flax.core
    import jax
    import jax.numpy as jnp

    if params is None:
        params = model.init_params(jax.random.PRNGKey(0))

    sd = dict(state_dict)
    _validate_rotary(sd, model)

    # tree_map rebuilds the dict containers (fresh, mutable); unfreeze in
    # case the caller hands in a FrozenDict tree
    tree = flax.core.unfreeze(jax.tree_util.tree_map(lambda x: x, params))
    root = tree["params"]

    def set_path(root, path, value):
        node = root
        for k in path[:-1]:
            node = node[k]
        leaf = node[path[-1]]
        if value.shape != tuple(leaf.shape):
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: checkpoint "
                f"{value.shape} vs model {tuple(leaf.shape)}"
            )
        node[path[-1]] = jnp.asarray(value, dtype=leaf.dtype)

    consumed = set()
    for ref_key, path, transpose in reference_key_map(model):
        if ref_key not in sd:
            if strict:
                raise KeyError(f"reference checkpoint is missing '{ref_key}'")
            continue
        v = _to_np(sd[ref_key])
        if transpose:
            assert v.ndim == 2, ref_key
            v = v.T
        set_path(root, path, v)
        consumed.add(ref_key)

    leftovers = [
        k
        for k in sd
        if k not in consumed and not k.startswith(_IGNORED_PREFIXES)
    ]
    if leftovers and strict:
        raise ValueError(
            f"unrecognized reference keys (config mismatch?): {leftovers[:8]}"
        )
    return tree


def export_to_reference(params, model):
    """Inverse of `port_from_reference`: flax tree -> reference state_dict."""
    root = params["params"]

    def get_path(path):
        node = root
        for k in path:
            node = node[k]
        return np.asarray(node, dtype=np.float32)

    out = {}
    for ref_key, path, transpose in reference_key_map(model):
        v = get_path(path)
        out[ref_key] = v.T if transpose else v
    # derived rotary schedule, stored by the reference package
    dh = model.transformer_cfg.get("dim_head", 64)
    theta = model.transformer_cfg.get("rope_theta", 10000.0)
    out["rotary_emb.freqs"] = 1.0 / theta ** (
        np.arange(0, dh, 2, dtype=np.float32) / dh
    )
    return out

"""Cross-framework numerical parity: flax model vs a torch twin, same weights.

BASELINE.md's parity target is "match the PyTorch reference on identical
weights". The actual reference cannot run in this container (its
dependencies are not installed, no network), so this harness builds a
*torch twin of this framework's text-only path* — same math, independently
implemented in torch — transplants the flax weights into it, and asserts
logits/loss parity to ~1e-4. Covers: embedding, interleaved RoPE, fused-QK
attention with softcap + per-head output gates + learned value-residual
mixing, GEGLU FF, AdaptiveWrapper text path (LN*(g+1) in, *(ls+1) out),
U-Net skip projections, unit-offset RMSNorm, logits head.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from transfusion_tpu.models.transfusion import Transfusion  # noqa: E402

DIM, DEPTH, HEADS, DH = 32, 2, 4, 8
VOCAB_TEXT = 16


def build_model():
    model = Transfusion(
        num_text_tokens=VOCAB_TEXT,
        dim_latent=8,
        modality_default_shape=(2,),
        transformer=dict(dim=DIM, depth=DEPTH, dim_head=DH, heads=HEADS),
        pad_multiple=16,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    # break the zero-init symmetry so the parity test exercises every branch
    key = jax.random.PRNGKey(42)

    def jitter(path, p):
        nonlocal key
        key, k = jax.random.split(key)
        return p + jax.random.normal(k, p.shape) * 0.02

    params = jax.tree_util.tree_map_with_path(jitter, params)
    return model, params


def torch_rope(t, pos, dh):
    # interleaved convention (ops/rope.py)
    freqs = 1.0 / (10000.0 ** (np.arange(0, dh, 2) / dh))
    ang = pos[:, None] * freqs  # [n, dh/2]
    ang = np.repeat(ang, 2, axis=-1)  # interleaved duplicate
    ang = torch.tensor(ang, dtype=torch.float32)
    cos, sin = torch.cos(ang), torch.sin(ang)
    x = t.reshape(*t.shape[:-1], dh // 2, 2)
    rot = torch.stack([-x[..., 1], x[..., 0]], dim=-1).reshape(t.shape)
    return t * cos + rot * sin


def torch_forward(params, ids, t=None):
    """Torch twin of core.text_forward for the default config (streams=1).

    `t` converts a stored weight to a torch tensor; pass a live converter
    (identity on torch Parameters) to make the twin differentiable for the
    optimizer-trajectory tests (test_trajectory_parity.py)."""
    p = params["params"]
    core = p

    if t is None:
        def t(x):
            return torch.tensor(np.asarray(x), dtype=torch.float32)

    x = t(core["text_embed"]["embedding"])[torch.tensor(np.asarray(ids))]
    b, n, _ = x.shape
    pos = np.arange(n)

    value_residual = None
    skips = []

    for ind in range(DEPTH):
        blk = core["transformer"][f"block_{ind}"]

        if ind + 1 <= DEPTH // 2:
            skips.append(x)
        if ind >= DEPTH / 2:
            skip = skips.pop()
            w = t(blk[f"skip_proj_{ind}"]["kernel"])
            x = torch.cat([x, skip], dim=-1) @ w + x

        # --- attention with AdaptiveWrapper text path ---
        ada = blk[f"attn_ada_{ind}"]
        h = F.layer_norm(x, (DIM,), eps=1e-5)
        h = h * (t(ada["layernorm_gamma"]) + 1.0)

        attn = blk[f"attn_{ind}"]
        qk = h @ t(attn["to_qk"]["kernel"])
        q, k = qk.chunk(2, dim=-1)
        v = h @ t(attn["to_v"]["kernel"])
        q, k, v = (
            y.reshape(b, n, HEADS, DH).transpose(1, 2) for y in (q, k, v)
        )
        orig_v = v
        if value_residual is not None:
            mixer = attn["to_value_residual_mix"]
            mix = torch.sigmoid(
                h @ t(mixer["kernel"]) + t(mixer["bias"])
            ).transpose(1, 2)[..., None]
            v = v * mix + value_residual * (1 - mix)

        q = torch_rope(q, pos, DH)
        k = torch_rope(k, pos, DH)

        sim = (q * DH**-0.5) @ k.transpose(-1, -2)
        sim = torch.tanh(sim / 50.0) * 50.0
        causal = torch.tril(torch.ones(n, n, dtype=torch.bool))
        sim = sim.masked_fill(~causal, -torch.finfo(torch.float32).max)
        o = sim.softmax(dim=-1) @ v

        gate = torch.sigmoid(h @ t(attn["to_gates"]["kernel"])).transpose(1, 2)[..., None]
        o = (o * gate).transpose(1, 2).reshape(b, n, -1)
        o = o @ t(attn["to_out"]["kernel"])
        o = o * (t(ada["layerscale"]) + 1.0)
        x = x + o
        if value_residual is None:
            value_residual = orig_v

        # --- feedforward with AdaptiveWrapper text path ---
        ada = blk[f"ff_ada_{ind}"]
        h = F.layer_norm(x, (DIM,), eps=1e-5)
        h = h * (t(ada["layernorm_gamma"]) + 1.0)
        ff = blk[f"ff_{ind}"]
        hh = h @ t(ff["proj_in"]["kernel"]) + t(ff["proj_in"]["bias"])
        a, g = hh.chunk(2, dim=-1)
        hh = F.gelu(g, approximate="none") * a
        hh = hh @ t(ff["proj_out"]["kernel"]) + t(ff["proj_out"]["bias"])
        hh = hh * (t(ada["layerscale"]) + 1.0)
        x = x + hh

    gamma = t(core["transformer"]["final_norm"]["gamma"])
    x = x / x.norm(dim=-1, keepdim=True).clamp_min(1e-12)
    x = x * math.sqrt(DIM) * (gamma + 1.0)

    return x @ t(core["to_text_logits"]["kernel"])


def _ada_mixed(ada_p, x, cond_gb, is_mod, t):
    """AdaptiveWrapper mixed text/modality input transform (torch)."""
    h = F.layer_norm(x, (DIM,), eps=1e-5)
    text_in = h * (t(ada_p["layernorm_gamma"]) + 1.0)
    film = cond_gb @ t(ada_p["to_film"]["kernel"]) + t(ada_p["to_film"]["bias"])
    gamma_f, beta_f = film.chunk(2, dim=-1)
    mod_in = h * (gamma_f + 1.0) + beta_f
    sel = is_mod[..., None]
    return torch.where(sel, mod_in, text_in)


def _ada_out(ada_p, out, cond_gb, is_mod, t):
    gate = torch.sigmoid(
        cond_gb @ t(ada_p["to_ada_ln_zero"]["kernel"])
        + t(ada_p["to_ada_ln_zero"]["bias"])
    )
    sel = is_mod[..., None]
    return torch.where(sel, out * gate, out * (t(ada_p["layerscale"]) + 1.0))


def torch_joint_forward(model, params, packed, noised, times_scalar, t=None):
    """Torch twin of core.joint for one single-group packed batch."""
    from transfusion_tpu.ops.spans import (
        spans_to_attn_mask,
        spans_to_is_any_modality,
        spans_to_rotary_positions,
        spans_to_token_times,
    )

    core = params["params"]

    if t is None:
        def t(x):
            return torch.tensor(np.asarray(x), dtype=torch.float32)

    text = np.asarray(packed.text)
    spans = np.asarray(packed.spans)
    b, n = text.shape
    g = packed.groups[0]
    L = g.seq_len

    x = t(core["text_embed"]["embedding"])[
        torch.tensor(np.where(text < 0, 0, text).astype(np.int64))
    ]

    # latent -> model rows (LatentToModel: Dense when dims differ)
    l2m = core["latent_to_model_0"]["proj"]
    rows = t(noised).reshape(g.k, L, -1) @ t(l2m["kernel"]) + t(l2m["bias"])
    noised_rows = rows.clone()
    for r in range(g.k):
        bi, off = int(g.batch_idx[r]), int(g.offsets[r])
        x[bi, off : off + L] = rows[r]

    m = spans.shape[1]
    times = jnp.full((b, m), times_scalar)
    pos = np.asarray(spans_to_rotary_positions(n, jnp.asarray(spans)))
    times_tok = np.asarray(spans_to_token_times(n, jnp.asarray(spans), times))
    is_mod = torch.tensor(
        np.asarray(spans_to_is_any_modality(n, jnp.asarray(spans)))
    )
    attn_mask = torch.tensor(
        np.asarray(spans_to_attn_mask(n, jnp.asarray(spans)))
    )

    # time conditioning: fourier (fixed-seed buffer) -> dense -> silu
    fw = np.asarray(core["transformer"]["fourier_weights"])
    tt = torch.tensor(times_tok, dtype=torch.float32)
    fr = tt[..., None] * torch.tensor(fw) * 2 * math.pi
    rfe = torch.cat([tt[..., None], fr.sin(), fr.cos()], dim=-1)
    tc = core["transformer"]["to_time_cond"]
    cond = F.silu(rfe @ t(tc["kernel"]) + t(tc["bias"]))

    value_residual = None
    skips = []
    for ind in range(DEPTH):
        blk = core["transformer"][f"block_{ind}"]
        if ind + 1 <= DEPTH // 2:
            skips.append(x)
        if ind >= DEPTH / 2:
            skip = skips.pop()
            w = t(blk[f"skip_proj_{ind}"]["kernel"])
            x = torch.cat([x, skip], dim=-1) @ w + x

        ada = blk[f"attn_ada_{ind}"]
        h = _ada_mixed(ada, x, cond, is_mod, t)

        attn = blk[f"attn_{ind}"]
        qk = h @ t(attn["to_qk"]["kernel"])
        q, k = qk.chunk(2, dim=-1)
        v = h @ t(attn["to_v"]["kernel"])
        q, k, v = (
            y.reshape(b, n, HEADS, DH).transpose(1, 2) for y in (q, k, v)
        )
        orig_v = v
        if value_residual is not None:
            mixer = attn["to_value_residual_mix"]
            mix = torch.sigmoid(
                h @ t(mixer["kernel"]) + t(mixer["bias"])
            ).transpose(1, 2)[..., None]
            v = v * mix + value_residual * (1 - mix)

        q = torch.stack([torch_rope(q[i], pos[i], DH) for i in range(b)])
        k = torch.stack([torch_rope(k[i], pos[i], DH) for i in range(b)])

        sim = (q * DH**-0.5) @ k.transpose(-1, -2)
        sim = torch.tanh(sim / 50.0) * 50.0
        sim = sim.masked_fill(
            ~attn_mask[:, None], -torch.finfo(torch.float32).max
        )
        o = sim.softmax(dim=-1) @ v
        gate = torch.sigmoid(h @ t(attn["to_gates"]["kernel"])).transpose(1, 2)[..., None]
        o = (o * gate).transpose(1, 2).reshape(b, n, -1)
        o = o @ t(attn["to_out"]["kernel"])
        x = x + _ada_out(ada, o, cond, is_mod, t)
        if value_residual is None:
            value_residual = orig_v

        ada = blk[f"ff_ada_{ind}"]
        h = _ada_mixed(ada, x, cond, is_mod, t)
        ff = blk[f"ff_{ind}"]
        hh = h @ t(ff["proj_in"]["kernel"]) + t(ff["proj_in"]["bias"])
        a_, g_ = hh.chunk(2, dim=-1)
        hh = F.gelu(g_, approximate="none") * a_
        hh = hh @ t(ff["proj_out"]["kernel"]) + t(ff["proj_out"]["bias"])
        x = x + _ada_out(ada, hh, cond, is_mod, t)

    gamma = t(core["transformer"]["final_norm"]["gamma"])
    x = x / x.norm(dim=-1, keepdim=True).clamp_min(1e-12)
    x = x * math.sqrt(DIM) * (gamma + 1.0)

    logits = x @ t(core["to_text_logits"]["kernel"])

    # pred flow: gather rows, x-pred conversion in model space, project back
    out_rows = torch.stack(
        [
            x[int(g.batch_idx[r]), int(g.offsets[r]) : int(g.offsets[r]) + L]
            for r in range(g.k)
        ]
    )
    flow_rows = (out_rows - noised_rows) / max(1.0 - times_scalar, 1e-2)
    m2l = core["model_to_latent_0"]["proj"]
    pred_flow = flow_rows @ t(m2l["kernel"])
    return logits, pred_flow


def test_joint_forward_matches_torch_twin():
    model, params = build_model()
    rng = np.random.default_rng(0)
    batch = [
        [
            rng.integers(0, VOCAB_TEXT, 5).astype(np.int32),
            rng.standard_normal((3, 8)).astype(np.float32),
            rng.integers(0, VOCAB_TEXT, 2).astype(np.int32),
        ]
    ]
    packed = model.pack(batch)
    (g,) = packed.groups
    noised = rng.standard_normal(g.latents.shape).astype(np.float32)
    times_scalar = 0.37

    packed_n = packed.replace(
        groups=(g.replace(latents=jnp.asarray(noised)),)
    )
    m = packed.spans.shape[1]
    logits, _, pred_flows, _, _ = model.core.apply(
        params,
        jax.tree.map(jnp.asarray, packed_n),
        jnp.full((1, m), times_scalar),
        method="joint",
    )

    t_logits, t_flow = torch_joint_forward(
        model, params, packed, noised, times_scalar
    )

    np.testing.assert_allclose(
        np.asarray(logits), t_logits.detach().numpy(), atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(pred_flows[0]),
        t_flow.detach().numpy().reshape(np.asarray(pred_flows[0]).shape),
        atol=3e-4,
    )


def test_text_forward_matches_torch_twin():
    model, params = build_model()
    ids = np.random.default_rng(0).integers(0, VOCAB_TEXT, (2, 12)).astype(np.int32)

    flax_logits = np.asarray(model.forward_text(params, ids, return_loss=False))
    torch_logits = torch_forward(params, ids).detach().numpy()

    np.testing.assert_allclose(flax_logits, torch_logits, atol=2e-4)

    # loss parity: CE over text-only vocab with the same shift
    flax_loss = float(model.forward_text(params, ids, return_loss=True))
    lg = torch.tensor(torch_logits)[:, :-1][..., :VOCAB_TEXT]
    labels = torch.tensor(ids[:, 1:].astype(np.int64))
    torch_loss = F.cross_entropy(
        lg.reshape(-1, VOCAB_TEXT), labels.reshape(-1)
    )
    np.testing.assert_allclose(flax_loss, float(torch_loss), atol=2e-4)

"""Weight-porting bridge: reference state_dict -> flax tree, golden parity.

The actual reference package cannot run offline (its deps are absent), so
this builds a torch module tree that MECHANICALLY reproduces the reference's
state_dict key layout (same attribute names, same nn.Sequential slot indices
— Rearrange slots stood in by nn.Identity) and implements the reference
forward math independently (from reading /root/reference/transfusion_pytorch/
transfusion.py — text path :1951-2010, modality path :2041-2141, Attention
:865-1033, AdaptiveWrapper :693-828, Transformer :1035-1252). Porting that
state_dict into the flax model must then reproduce its logits to ~1e-4.

Unlike tests/test_torch_parity.py (which transplants flax weights into a
flax-named twin), the twin here consumes the REFERENCE key names directly —
a wrong transpose, swapped GEGLU halves, or misrouted key in
models/port.py's mapping fails this test.
"""

import math

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from transfusion_tpu.models.port import (  # noqa: E402
    export_to_reference,
    port_from_reference,
)
from transfusion_tpu.models.transfusion import Transfusion  # noqa: E402

DIM, DEPTH, HEADS, DH = 32, 2, 4, 8
DIM_LATENT = 8
VOCAB_TEXT = 16
VOCAB = VOCAB_TEXT + 3 + 2 * 1 + 129


# ---------------------------------------------------------------------------
# reference-shaped torch modules (state_dict keys match the reference)
# ---------------------------------------------------------------------------


class RefFourier(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.register_buffer("weights", torch.randn(dim // 2))

    def forward(self, times):
        if times.ndim == 1:
            times = times[:, None]
        freqs = times[..., None] * self.weights * 2 * math.pi
        return torch.cat([times[..., None], freqs.sin(), freqs.cos()], dim=-1)


class RefGEGLU(nn.Module):
    def forward(self, x):
        x, gates = x.chunk(2, dim=-1)
        return F.gelu(gates) * x


class RefAttention(nn.Module):
    def __init__(self, dim, mix):
        super().__init__()
        inner = HEADS * DH
        # Sequential slot indices mirror the reference (Rearrange -> Identity)
        self.to_qk = nn.Sequential(nn.Linear(dim, inner * 2, bias=False))
        self.to_v = nn.Sequential(nn.Linear(dim, inner, bias=False))
        self.to_learned_value_residual = (
            nn.Sequential(nn.Linear(dim, HEADS)) if mix else None
        )
        self.to_gates = nn.Sequential(nn.Linear(dim, HEADS, bias=False))
        self.to_out = nn.Sequential(nn.Identity(), nn.Linear(inner, dim, bias=False))

    def forward(self, x, rope_pos=None, causal=False, value_residual=None):
        b, n, _ = x.shape
        qk = self.to_qk[0](x)
        q, k = qk.chunk(2, dim=-1)
        v = self.to_v[0](x)
        q, k, v = (
            y.reshape(b, n, HEADS, DH).transpose(1, 2) for y in (q, k, v)
        )
        orig_v = v
        if value_residual is not None:
            mix = torch.sigmoid(self.to_learned_value_residual[0](x))
            mix = mix.transpose(1, 2)[..., None]
            v = v * mix + value_residual * (1.0 - mix)

        if rope_pos is not None:
            q = _rope(q, rope_pos)
            k = _rope(k, rope_pos)

        sim = (q * DH**-0.5) @ k.transpose(-1, -2)
        sim = torch.tanh(sim / 50.0) * 50.0
        if causal:
            cm = torch.tril(torch.ones(n, n, dtype=torch.bool))
            sim = sim.masked_fill(~cm, -torch.finfo(torch.float32).max)
        o = sim.softmax(dim=-1) @ v
        gate = torch.sigmoid(self.to_gates[0](x)).transpose(1, 2)[..., None]
        o = (o * gate).transpose(1, 2).reshape(b, n, -1)
        return self.to_out[1](o), orig_v


class RefFeedForward(nn.Module):
    def __init__(self, dim):
        super().__init__()
        inner = int(dim * 4 * 2 / 3)
        self.net = nn.Sequential(
            nn.Linear(dim, inner * 2),
            RefGEGLU(),
            nn.Dropout(0.0),
            nn.Linear(inner, dim),
        )

    def forward(self, x):
        return self.net(x)


class RefAdaptiveWrapper(nn.Module):
    def __init__(self, fn, dim):
        super().__init__()
        self.fn = fn
        self.layernorm = nn.LayerNorm(dim, elementwise_affine=False)
        self.layernorm_gamma = nn.Parameter(torch.zeros(dim))
        self.layerscale = nn.Parameter(torch.zeros(dim))
        self.to_film = nn.Linear(dim * 4, dim * 2)
        self.to_ada_ln_zero = nn.Linear(dim * 4, dim)

    def pre(self, x, cond, is_mod):
        h = self.layernorm(x)
        text_in = h * (self.layernorm_gamma + 1.0)
        if cond is None:
            return text_in
        gamma, beta = self.to_film(cond).chunk(2, dim=-1)
        mod_in = h * (gamma + 1.0) + beta
        if is_mod is None:  # modality_only
            return mod_in
        return torch.where(is_mod[..., None], mod_in, text_in)

    def post(self, out, cond, is_mod):
        text_out = out * (self.layerscale + 1.0)
        if cond is None:
            return text_out
        mod_out = out * torch.sigmoid(self.to_ada_ln_zero(cond))
        if is_mod is None:
            return mod_out
        return torch.where(is_mod[..., None], mod_out, text_out)


class RefRMSNorm(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = nn.Parameter(torch.zeros(dim))

    def forward(self, x):
        x = x / x.norm(dim=-1, keepdim=True).clamp_min(1e-12)
        return x * math.sqrt(x.shape[-1]) * (self.gamma + 1.0)


class RefTransformer(nn.Module):
    def __init__(self, dim, depth):
        super().__init__()
        self.to_time_cond = nn.Sequential(
            RefFourier(dim), nn.Linear(dim + 1, dim * 4), nn.SiLU()
        )
        layers = nn.ModuleList([])
        for ind in range(depth):
            skip_proj = (
                nn.Linear(dim * 2, dim, bias=False) if ind >= depth / 2 else None
            )
            attn = RefAdaptiveWrapper(RefAttention(dim, mix=ind > 0), dim)
            ff = RefAdaptiveWrapper(RefFeedForward(dim), dim)
            # slots 2/4 (hyper-connection residuals) are param-free at
            # num_residual_streams=1 on both sides
            layers.append(nn.ModuleList([skip_proj, attn, nn.Identity(), ff, nn.Identity()]))
        self.layers = layers
        self.norm = RefRMSNorm(dim)

    def forward(self, x, cond=None, is_mod=None, rope_pos=None, causal=False):
        value_residual = None
        skips = []
        depth = len(self.layers)
        for ind, (skip_proj, attn, _, ff, _) in enumerate(self.layers):
            if ind + 1 <= depth // 2:
                skips.append(x)
            if skip_proj is not None:
                skip = skips.pop()
                x = skip_proj(torch.cat([x, skip], dim=-1)) + x

            h = attn.pre(x, cond, is_mod)
            o, orig_v = attn.fn(
                h, rope_pos=rope_pos, causal=causal, value_residual=value_residual
            )
            x = x + attn.post(o, cond, is_mod)
            if value_residual is None:
                value_residual = orig_v

            h = ff.pre(x, cond, is_mod)
            x = x + ff.post(ff.fn(h), cond, is_mod)
        return self.norm(x)


class RefTransfusion(nn.Module):
    """state_dict layout twin of reference Transfusion (1 modality)."""

    def __init__(self):
        super().__init__()
        self.text_embed = nn.Embedding(VOCAB, DIM)
        self.to_text_logits = nn.Linear(DIM, VOCAB, bias=False)
        self.latent_to_model_projs = nn.ModuleList([nn.Linear(DIM_LATENT, DIM)])
        self.model_to_latent_projs = nn.ModuleList(
            [nn.Linear(DIM, DIM_LATENT, bias=False)]
        )
        freqs = 1.0 / 10000.0 ** (np.arange(0, DH, 2, dtype=np.float32) / DH)
        self.rotary_emb = nn.Module()
        self.rotary_emb.freqs = nn.Parameter(
            torch.tensor(freqs), requires_grad=False
        )
        self.transformer = RefTransformer(DIM, DEPTH)

    def forward_text_logits(self, ids):
        x = self.text_embed(ids)
        pos = torch.arange(ids.shape[1], dtype=torch.float32)
        x = self.transformer(x, causal=True, rope_pos=pos)
        return self.to_text_logits(x)

    def forward_modality_out(self, rows, times):
        x = self.latent_to_model_projs[0](rows)
        cond = self.transformer.to_time_cond(times)  # [b, 1, 4*dim]
        x = self.transformer(x, cond=cond, is_mod=None)
        return self.model_to_latent_projs[0](x)


def _rope(t, pos):
    freqs = 1.0 / (10000.0 ** (np.arange(0, DH, 2) / DH))
    ang = np.asarray(pos)[:, None] * freqs
    ang = torch.tensor(np.repeat(ang, 2, axis=-1), dtype=torch.float32)
    cos, sin = torch.cos(ang), torch.sin(ang)
    x = t.reshape(*t.shape[:-1], DH // 2, 2)
    rot = torch.stack([-x[..., 1], x[..., 0]], dim=-1).reshape(t.shape)
    return t * cos + rot * sin


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def _randomized_ref():
    torch.manual_seed(0)
    ref = RefTransfusion()
    with torch.no_grad():
        for p in ref.parameters():
            if p is ref.rotary_emb.freqs:
                continue  # port validates the default schedule
            p.copy_(torch.randn_like(p) * 0.05)
        ref.transformer.to_time_cond[0].weights.copy_(
            torch.randn(DIM // 2)
        )
    return ref


def _flax_model():
    return Transfusion(
        num_text_tokens=VOCAB_TEXT,
        dim_latent=DIM_LATENT,
        modality_default_shape=(2,),
        transformer=dict(dim=DIM, depth=DEPTH, dim_head=DH, heads=HEADS),
        pad_multiple=16,
    )


def test_port_text_logits_match_reference_twin():
    ref = _randomized_ref()
    model = _flax_model()
    params = port_from_reference(ref.state_dict(), model)

    ids = np.random.default_rng(0).integers(0, VOCAB_TEXT, (2, 12)).astype(np.int32)
    got = np.asarray(model.forward_text(params, ids, return_loss=False))
    want = ref.forward_text_logits(torch.tensor(ids.astype(np.int64)))
    np.testing.assert_allclose(got, want.detach().numpy(), atol=1e-4)


def test_port_modality_forward_matches_reference_twin():
    ref = _randomized_ref()
    model = _flax_model()
    params = port_from_reference(ref.state_dict(), model)

    rng = np.random.default_rng(1)
    rows = rng.standard_normal((2, 3, DIM_LATENT)).astype(np.float32)
    times = np.array([0.25, 0.8], np.float32)

    got = model.core.apply(
        params, jax.numpy.asarray(rows), jax.numpy.asarray(times), 0,
        method="modality_forward",
    )
    want = ref.forward_modality_out(
        torch.tensor(rows), torch.tensor(times)
    )
    np.testing.assert_allclose(
        np.asarray(got), want.detach().numpy(), atol=1e-4
    )


def test_port_export_roundtrip():
    ref = _randomized_ref()
    model = _flax_model()
    sd = {k: v for k, v in ref.state_dict().items()}
    params = port_from_reference(sd, model)
    back = export_to_reference(params, model)
    for k, v in back.items():
        np.testing.assert_allclose(
            v, sd[k].detach().numpy(), atol=1e-6, err_msg=k
        )


def test_port_rejects_mismatched_checkpoint():
    ref = _randomized_ref()
    model = Transfusion(
        num_text_tokens=VOCAB_TEXT,
        dim_latent=DIM_LATENT,
        modality_default_shape=(2,),
        transformer=dict(dim=DIM, depth=DEPTH + 1, dim_head=DH, heads=HEADS),
        pad_multiple=16,
    )
    with pytest.raises((KeyError, ValueError)):
        port_from_reference(ref.state_dict(), model)


def test_key_map_honors_gate_values_flag():
    """attn_gate_values=False models have no to_gates on either side —
    the key map must omit it (r2 review finding: port/export KeyError)."""
    from transfusion_tpu.models.port import reference_key_map
    from transfusion_tpu.models.transfusion import Transfusion

    def build(gate_values):
        return Transfusion(
            num_text_tokens=8,
            dim_latent=8,
            modality_default_shape=(2,),
            transformer=dict(
                dim=16, depth=2, dim_head=8, heads=2,
                attn_gate_values=gate_values,
            ),
            pad_multiple=8,
        )

    keys_on = [k for k, *_ in reference_key_map(build(True))]
    keys_off = [k for k, *_ in reference_key_map(build(False))]
    assert any("to_gates" in k for k in keys_on)
    assert not any("to_gates" in k for k in keys_off)

"""Torch-CPU baseline for the bench denominator.

The reference (lucidrains/transfusion-pytorch) cannot run in this container —
its dependencies (torchdiffeq, einx, rotary-embedding-torch, hyper-connections,
ema-pytorch, beartype...) are not installed and there is no network. This
script is a minimal *pure-torch* replica of the reference's training hot path
(naive-mask path, the one its CI exercises — SURVEY.md §4): same transformer
shape (dim 384, depth 8, heads 8/64), per-step ragged assembly into padded
buffers, transfusion attention mask, adaLN time conditioning, joint CE + flow
MSE loss, backward, Adam step. Throughput is packed tokens/sec on CPU.

Run:  python bench_baseline_torch.py   -> writes BASELINE_MEASURED.json
"""

import json
import math
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

DIM, DEPTH, HEADS, DIM_HEAD = 384, 8, 8, 64
DIM_LATENT = 32
TEXT_VOCAB = 256 + 3 + 2 + 129
BATCH = 16
TEXT_A, IMG_HW, TEXT_B = 32, 14, 8


class Block(nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = nn.LayerNorm(DIM, elementwise_affine=False)
        self.norm2 = nn.LayerNorm(DIM, elementwise_affine=False)
        self.qkv = nn.Linear(DIM, 3 * HEADS * DIM_HEAD, bias=False)
        self.proj = nn.Linear(HEADS * DIM_HEAD, DIM, bias=False)
        self.gates = nn.Linear(DIM, HEADS, bias=False)
        inner = int(DIM * 4 * 2 / 3)
        self.ff_in = nn.Linear(DIM, inner * 2)
        self.ff_out = nn.Linear(inner, DIM)
        self.film = nn.Linear(4 * DIM, 2 * DIM)
        self.ada_gate = nn.Linear(4 * DIM, DIM)

    def forward(self, x, mask, cond, is_mod):
        h = self.norm1(x)
        gamma, beta = self.film(cond).chunk(2, dim=-1)
        h = torch.where(is_mod[..., None], h * (gamma + 1) + beta, h)
        q, k, v = self.qkv(h).chunk(3, dim=-1)
        q, k, v = (
            t.view(*t.shape[:2], HEADS, DIM_HEAD).transpose(1, 2) for t in (q, k, v)
        )
        sim = q @ k.transpose(-1, -2) * DIM_HEAD**-0.5
        sim = torch.tanh(sim / 50.0) * 50.0
        sim = sim.masked_fill(~mask[:, None], -torch.finfo(sim.dtype).max)
        attn = sim.softmax(dim=-1)
        o = attn @ v  # [b, H, n, dh]
        gate = torch.sigmoid(self.gates(h)).transpose(1, 2)[..., None]  # [b,H,n,1]
        o = (o * gate).transpose(1, 2).reshape(*x.shape[:2], -1)
        o = self.proj(o)
        o = torch.where(
            is_mod[..., None], o * torch.sigmoid(self.ada_gate(cond)), o
        )
        x = x + o
        h = self.norm2(x)
        h = torch.where(is_mod[..., None], h * (gamma + 1) + beta, h)
        a, g = self.ff_in(h).chunk(2, dim=-1)
        x = x + self.ff_out(F.gelu(g) * a)
        return x


class RefLike(nn.Module):
    def __init__(self):
        super().__init__()
        self.embed = nn.Embedding(TEXT_VOCAB, DIM)
        self.lat2mod = nn.Linear(DIM_LATENT, DIM)
        self.mod2lat = nn.Linear(DIM, DIM_LATENT, bias=False)
        self.time_mlp = nn.Linear(DIM + 1, 4 * DIM)
        self.blocks = nn.ModuleList([Block() for _ in range(DEPTH)])
        self.logits = nn.Linear(DIM, TEXT_VOCAB, bias=False)
        self.register_buffer("fourier", torch.randn(DIM // 2))

    def forward(self, samples):
        # per-step ragged assembly on host (reference transfusion.py:2486-2656)
        texts, latents, spans = [], [], []
        L = IMG_HW * IMG_HW
        for text_a, img, text_b in samples:
            ids = torch.cat(
                [
                    torch.tensor([256]), text_a,
                    torch.tensor([256 + 2]),  # meta
                    torch.full((L,), -1), torch.tensor([256 + 1]),
                    text_b, torch.tensor([256 + 1]),
                ]
            )
            texts.append(ids)
            latents.append(img.reshape(L, DIM_LATENT))
            spans.append((TEXT_A + 3, L))

        n = max(len(t) for t in texts)
        n = (n + 63) // 64 * 64
        text = torch.full((len(texts), n), -1, dtype=torch.long)
        for i, t in enumerate(texts):
            text[i, : len(t)] = t

        times = torch.rand(len(samples))
        lat = torch.stack(latents)
        noise = torch.randn_like(lat)
        t_ = times[:, None, None]
        noised = lat * t_ + noise * (1 - t_)
        flow = lat - noise

        x = self.embed(text.clamp(min=0))
        is_mod = torch.zeros(len(texts), n, dtype=torch.bool)
        seq = torch.arange(n)
        mask = seq[:, None] >= seq[None, :]
        mask = mask[None].repeat(len(texts), 1, 1)
        for i, (off, ln) in enumerate(spans):
            x[i, off : off + ln] = self.lat2mod(noised[i])
            is_mod[i, off : off + ln] = True
            mask[i] |= (seq[:, None] >= off) & (seq[None, :] < off + ln)

        tt = times[:, None] * is_mod.float()
        f = tt[..., None] * self.fourier * 2 * math.pi
        cond = F.silu(self.time_mlp(torch.cat([tt[..., None], f.sin(), f.cos()], -1)))

        inp, labels = x[:, :-1], text[:, 1:]
        mask = mask[:, :-1, :-1]
        is_mod_in = is_mod[:, :-1]
        cond = cond[:, :-1]
        for blk in self.blocks:
            inp = blk(inp, mask, cond, is_mod_in)

        logits = self.logits(inp)
        valid = (labels != -1) & ~is_mod_in
        ce = F.cross_entropy(
            logits.reshape(-1, TEXT_VOCAB),
            labels.masked_fill(~valid, -100).reshape(-1),
            ignore_index=-100,
        )
        pred_rows = []
        for i, (off, ln) in enumerate(spans):
            pred_rows.append(inp[i, off : off + ln])
        pred_flow = self.mod2lat(torch.stack(pred_rows))
        mse = F.mse_loss(pred_flow, flow)
        return ce * 0.2 + mse * 0.8


def main():
    torch.manual_seed(0)
    model = RefLike()
    opt = torch.optim.Adam(model.parameters(), lr=3e-4)

    def make_batch():
        return [
            (
                torch.randint(0, 256, (TEXT_A,)),
                torch.randn(IMG_HW, IMG_HW, DIM_LATENT),
                torch.randint(0, 256, (TEXT_B,)),
            )
            for _ in range(BATCH)
        ]

    tokens_per_step = BATCH * (1 + TEXT_A + 1 + IMG_HW * IMG_HW + 1 + TEXT_B + 1)

    # warmup
    for _ in range(2):
        loss = model(make_batch())
        opt.zero_grad(); loss.backward(); opt.step()

    steps = 8
    t0 = time.perf_counter()
    for _ in range(steps):
        loss = model(make_batch())
        opt.zero_grad(); loss.backward(); opt.step()
    dt = time.perf_counter() - t0

    tps = tokens_per_step * steps / dt
    out = {
        "baseline": "torch-cpu reference-equivalent train step",
        "tokens_per_step": tokens_per_step,
        "steps": steps,
        "seconds": dt,
        "tokens_per_sec": tps,
        "torch_version": torch.__version__,
        "threads": torch.get_num_threads(),
    }
    print(json.dumps(out))
    with open("BASELINE_MEASURED.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()

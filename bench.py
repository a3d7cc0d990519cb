"""Benchmark: packed tokens/sec/chip on the joint text+latents train step.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (matches bench_baseline_torch.py shape-for-shape): batch 32 samples,
each [32 text][14x14x32 latent modality][8 text]; transformer dim 384 /
depth 8 / heads 8x64 — the enwik8-scale config of the reference
(train_text_only.py) with an MNIST-scale modality interleaved. Full training
step: joint CE + flow loss, backward, global-norm clip, Adam, EMA.

vs_baseline divides by the torch-CPU reference-equivalent measured by
bench_baseline_torch.py (BASELINE_MEASURED.json). NOTE: this container
exposes a single CPU core, so the baseline is single-threaded torch — see
BASELINE.md.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from transfusion_tpu.models.transfusion import Transfusion
    from transfusion_tpu.training.trainer import Trainer

    dtype = (
        jnp.bfloat16
        if os.environ.get("BENCH_DTYPE", "bf16") == "bf16"
        else jnp.float32
    )
    model = Transfusion(
        num_text_tokens=256,
        dim_latent=32,
        modality_default_shape=(14, 14),
        transformer=dict(dim=384, depth=8, dim_head=64, heads=8, attn_impl="flash"),
        pad_multiple=64,
        dtype=dtype,
    )
    trainer = Trainer(model, learning_rate=3e-4)
    state = trainer.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    batch = [
        [
            rng.integers(0, 256, 32).astype(np.int32),
            (0, rng.standard_normal((14, 14, 32)).astype(np.float32)),
            rng.integers(0, 256, 8).astype(np.int32),
        ]
        for _ in range(32)
    ]
    packed = model.pack(batch, shift_friendly=True)
    tokens_per_step = int(packed.total_tokens)
    # device-resident batch: re-converting the host arrays every step costs
    # a host->device upload per step (~25% of the whole step through the
    # remote tunnel, measured r3 — scripts/probe_r3_bench.py); a production
    # input pipeline keeps batches on device, so the bench does too
    packed = jax.tree.map(jnp.asarray, packed)

    key = jax.random.PRNGKey(1)
    # warmup / compile; float() forces real completion (on some remote
    # backends block_until_ready returns at enqueue-ack, not execution)
    for i in range(2):
        key, k = jax.random.split(key)
        state, metrics = trainer.train_step(state, packed, k)
    float(metrics["loss"])

    # steady-state loop: `steps` optimizer steps fused into ONE lax.scan
    # dispatch (Trainer.train_steps — the production loop API; identical
    # update semantics to per-step dispatch, +3-4% measured through the
    # remote tunnel, scripts/probe_r3_bench.py)
    steps = 20
    key, k = jax.random.split(key)
    state, metrics = trainer.train_steps(state, packed, k, steps)  # compile
    float(metrics["loss"])

    # best-of-5 repeats: the remote tunnel has multi-second degraded windows
    # (observed 120k-233k tok/s spread on identical code) that a single
    # window conflates with device time; median-of-5 reported alongside so
    # the capture is robust to one lucky/unlucky window
    dts = []
    for _ in range(5):
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        state, metrics = trainer.train_steps(state, packed, k, steps)
        float(metrics["loss"])  # materialize: depends on every step
        dts.append(time.perf_counter() - t0)

    best_dt = min(dts)
    median_dt = float(np.median(dts))
    tps = tokens_per_step * steps / best_dt
    tps_median = tokens_per_step * steps / median_dt

    baseline = None
    path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            baseline = json.load(f).get("tokens_per_sec")

    # efficiency: XLA's own HLO FLOP count for ONE train step, turned into
    # achieved TFLOP/s and MFU against the chip's bf16 peak. On the axon
    # (remote TPU) backend the pre-compile `lowered.cost_analysis()` returns
    # None — only the COMPILED executable carries the analysis (measured
    # r5), so fall back to .compile(); done after the timed windows, the
    # one-off AOT compile cannot perturb them.
    tflops = mfu = None
    try:
        lowered = trainer._step_fn.lower(state, packed, key)
        ca = lowered.cost_analysis()
        if not ca:
            ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_step = float(ca["flops"])
        tflops = flops_step * steps / best_dt / 1e12
        peak = _peak_bf16_tflops(jax.devices()[0])
        if peak:
            mfu = tflops / peak
    except Exception:
        pass  # cost analysis unavailable on this backend/version

    out = {
        "metric": "packed tokens/sec/chip (text+latents joint train step)",
        "value": round(tps, 1),
        "unit": "tokens/sec",
        "vs_baseline": round(tps / baseline, 2) if baseline else None,
        "median_of_5": round(tps_median, 1),
        "median_vs_baseline": (
            round(tps_median / baseline, 2) if baseline else None
        ),
        "tflops": round(tflops, 2) if tflops is not None else None,
        "mfu": round(mfu, 4) if mfu is not None else None,
    }
    print(json.dumps(out))


def _peak_bf16_tflops(device) -> float:
    """Dense bf16 peak for the chip driving the bench (public specs)."""
    kind = getattr(device, "device_kind", "").lower()
    table = {
        "v5 lite": 197.0,  # v5e: 394 int8 TOPS / 197 bf16 TFLOP/s
        "v5litepod": 197.0,
        "v5e": 197.0,
        "v4": 275.0,
        "v5p": 459.0,
        "v5": 459.0,  # plain "v5" reported by some runtimes = v5p
        "v6 lite": 918.0,
        "v6e": 918.0,
    }
    for k, v in sorted(table.items(), key=lambda kv: -len(kv[0])):
        if k in kind:
            return v
    return 0.0


if __name__ == "__main__":
    main()

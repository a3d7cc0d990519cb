"""Flagship-example convergence curves on the real TPU (VERDICT r4 #1).

Trains the two headline workloads (SURVEY.md §2.6 acceptance configs) for
2,000 optimizer steps each and records a FIXED-POINT eval loss every 50
steps to committed artifacts:

    results/curves_enwik8.jsonl  — byte-LM, dim 384 / depth 8 / LASER,
                                   seq 256 (reference train_text_only.py
                                   workload); eval = CE on a fixed held-out
                                   batch (deterministic).
    results/curves_mnist.jsonl   — label->image on 2x2-patchified pixels,
                                   dim 64 / depth 4 (reference
                                   train_mnist.py workload); eval = joint
                                   loss on a fixed (batch, rng) point
                                   (per-step losses vary ~100x between rng
                                   seeds — the times draw hits the
                                   x-pred->flow 1/(1-t) amplification — so
                                   only a pinned eval point is comparable).

Training advances in fused 50-step windows (Trainer.train_steps / a scanned
text step) so the tunneled TPU pays one dispatch per window, not per step.

Run: python scripts/record_convergence_curves.py [--steps 2000]
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

RESULTS = pathlib.Path(__file__).resolve().parent.parent / "results"
EVAL_EVERY = 50


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {path} ({len(rows)} rows)")


def run_enwik8(steps: int):
    from transfusion_tpu.data.datasets import load_enwik8
    from transfusion_tpu.models.transfusion import Transfusion

    SEQ, BATCH = 256, 16
    model = Transfusion(
        num_text_tokens=256,
        dim_latent=384,
        modality_default_shape=(),
        transformer=dict(
            dim=384, depth=8, dim_head=64, heads=8, attn_laser=True
        ),
    )
    params = model.init_params(jax.random.PRNGKey(0))
    tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(3e-4))
    opt_state = tx.init(params)

    data = load_enwik8()
    split = int(len(data) * 0.9)
    train_data, valid_data = data[:split], data[split:]
    rng_np = np.random.default_rng(0)

    def batch_from(source, rng):
        idx = rng.integers(0, len(source) - SEQ - 1, BATCH)
        return np.stack([source[i : i + SEQ + 1] for i in idx]).astype(
            np.int32
        )

    # FIXED eval batch: deterministic CE, same bytes every eval
    eval_batch = jnp.asarray(
        batch_from(valid_data, np.random.default_rng(12345))
    )
    eval_fn = jax.jit(model._text_loss_impl)

    @jax.jit
    def window(params, opt_state, batches):
        def body(carry, b):
            p, o = carry
            loss, grads = jax.value_and_grad(model._text_loss_impl)(p, b)
            updates, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), batches
        )
        return params, opt_state, losses[-1]

    rows = []
    t0 = time.perf_counter()
    rows.append(
        {"step": 0, "eval_loss": round(float(eval_fn(params, eval_batch)), 6)}
    )
    for w in range(steps // EVAL_EVERY):
        batches = jnp.asarray(
            np.stack(
                [batch_from(train_data, rng_np) for _ in range(EVAL_EVERY)]
            )
        )
        params, opt_state, last = window(params, opt_state, batches)
        step = (w + 1) * EVAL_EVERY
        ev = float(eval_fn(params, eval_batch))
        rows.append(
            {
                "step": step,
                "eval_loss": round(ev, 6),
                "train_loss": round(float(last), 6),
            }
        )
        print(f"enwik8 step {step}: eval {ev:.4f}")
    rows.append(
        {
            "meta": "enwik8 byte-LM dim384/depth8/LASER seq256 batch16, "
            "Adam 3e-4 clip 0.5; eval = CE on a fixed held-out batch",
            "wall_s": round(time.perf_counter() - t0, 1),
            "device": str(jax.devices()[0]),
        }
    )
    _write(RESULTS / "curves_enwik8.jsonl", rows)


def run_mnist(steps: int):
    sys.path.insert(
        0, str(pathlib.Path(__file__).resolve().parent.parent / "examples")
    )
    from train_mnist import PatchDecoder, PatchEncoder

    from transfusion_tpu.data.datasets import load_mnist
    from transfusion_tpu.models.transfusion import Transfusion
    from transfusion_tpu.training.trainer import Trainer

    BATCH = 16
    model = Transfusion(
        num_text_tokens=10,
        dim_latent=4,
        modality_default_shape=(14, 14),
        modality_encoder=PatchEncoder(),
        modality_decoder=PatchDecoder(),
        prob_uncond=0.1,
        transformer=dict(dim=64, depth=4, dim_head=32, heads=8),
        pad_multiple=256,
    )
    trainer = Trainer(model, learning_rate=8e-4, grad_clip_norm=0.5)
    state = trainer.init_state(jax.random.PRNGKey(0))

    images, labels = load_mnist()
    rng_np = np.random.default_rng(0)

    def make_packed(idx):
        batch = [
            [np.array([labels[i]], np.int32), images[i]] for i in idx
        ]
        return model.pack(
            model.encode_modalities(batch), shift_friendly=True
        )

    # a rotating set of pre-packed batches for the fused windows (identical
    # packed structure: every mnist sample is label + 14x14x4 patches)
    n_pool = 8
    pool = [
        make_packed(rng_np.integers(0, len(images), BATCH))
        for _ in range(n_pool)
    ]
    # FIXED eval point: pinned batch AND pinned rng (times/noise draws)
    eval_packed = make_packed(np.arange(BATCH))
    eval_rng = jax.random.PRNGKey(0)

    def eval_loss(params):
        return float(
            model.loss(params, None, eval_rng, packed=eval_packed,
                       train=False)
        )

    rows = []
    t0 = time.perf_counter()
    rows.append({"step": 0, "eval_loss": round(eval_loss(state.params), 6)})
    rng = jax.random.PRNGKey(1)
    for w in range(steps // EVAL_EVERY):
        rng, k = jax.random.split(rng)
        state, metrics = trainer.train_steps(state, pool, k, EVAL_EVERY)
        step = (w + 1) * EVAL_EVERY
        ev = eval_loss(state.params)
        rows.append(
            {
                "step": step,
                "eval_loss": round(ev, 6),
                "train_loss": round(float(metrics["loss"]), 6),
            }
        )
        print(f"mnist step {step}: eval {ev:.4f}")
    rows.append(
        {
            "meta": "mnist label->image dim64/depth4 batch16, Adam 8e-4 "
            "clip 0.5, prob_uncond 0.1; eval = joint loss at a pinned "
            "(batch, rng) point, train=False",
            "wall_s": round(time.perf_counter() - t0, 1),
            "device": str(jax.devices()[0]),
        }
    )
    _write(RESULTS / "curves_mnist.jsonl", rows)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument(
        "--only", choices=["enwik8", "mnist"], default=None
    )
    args = ap.parse_args()
    RESULTS.mkdir(exist_ok=True)
    if args.only in (None, "enwik8"):
        run_enwik8(args.steps)
    if args.only in (None, "mnist"):
        run_mnist(args.steps)

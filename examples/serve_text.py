"""Serving-style decode demo: batch text generation + multimodal sampling
through the KV-cache fast path.

No analog exists in the reference (its generate_text_only re-forwards the
full prefix per token, reference transfusion.py:2015-2038). This script
exercises the TPU serving stack end-to-end:

  * flash-kernel prefill into a preallocated ring-buffer cache
  * scanned per-token decode through the Pallas decode-attention kernel
  * optional int8-quantized KV cache (--kv-quantize): 2x smaller cache,
    faster at long histories (docs_evidence.md)

Run: python examples/serve_text.py --history 2048 --tokens 64 --batch 4
     python examples/serve_text.py --kv-quantize --checkpoint runs/ckpt
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--history", type=int, default=512,
                   help="prompt length to prefill")
    p.add_argument("--tokens", type=int, default=64,
                   help="tokens to decode per request")
    p.add_argument("--batch", type=int, default=4,
                   help="concurrent requests (batched decode)")
    p.add_argument("--kv-quantize", action="store_true",
                   help="int8 KV cache (2x smaller, wins at long history)")
    p.add_argument("--attn", default="flash", choices=["flash", "dense"])
    p.add_argument("--dim", type=int, default=384)
    p.add_argument("--depth", type=int, default=8)
    p.add_argument("--checkpoint", default=None,
                   help="orbax checkpoint dir to restore params from")
    p.add_argument("--multimodal", action="store_true",
                   help="also run one cached multimodal sample()")
    p.add_argument("--engine", action="store_true",
                   help="demo the continuous-batching ServingEngine: more "
                        "requests than slots, admission + early retirement")
    p.add_argument("--ragged", action="store_true",
                   help="demo ragged batching: requests with different "
                        "history lengths decode together")
    p.add_argument("--mm-engine", action="store_true",
                   help="demo the continuous-batching MULTIMODAL engine: "
                        "full sample()-style requests (text + image "
                        "segments + CFG) over a slot pool")
    args = p.parse_args()

    from transfusion_tpu.models.transfusion import Transfusion

    model = Transfusion(
        num_text_tokens=256,
        dim_latent=32,
        modality_default_shape=(14, 14),
        transformer=dict(
            dim=args.dim, depth=args.depth, dim_head=64,
            heads=args.dim // 48 if args.dim % 48 == 0 else 8,
            attn_impl=args.attn,
        ),
        pad_multiple=64,
        dtype=jnp.bfloat16,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    if args.checkpoint:
        from transfusion_tpu.training.trainer import Trainer

        trainer = Trainer(model, checkpoint_dir=args.checkpoint)
        state = trainer.restore(trainer.init_state(jax.random.PRNGKey(0)))
        if state is not None:
            params = state.params
            print(f"restored step {int(state.step)} from {args.checkpoint}")

    rng = np.random.default_rng(0)
    prompt = jnp.asarray(
        rng.integers(0, 256, (args.batch, args.history)), jnp.int32
    )

    # warm (compile); then measure steady-state
    toks = model.generate_text_only(
        params, prompt, seq_len=args.history + args.tokens,
        rng=jax.random.PRNGKey(1), kv_quantize=args.kv_quantize,
    )
    _ = int(np.asarray(toks)[0, -1])
    t0 = time.perf_counter()
    toks = model.generate_text_only(
        params, prompt, seq_len=args.history + args.tokens,
        rng=jax.random.PRNGKey(2), kv_quantize=args.kv_quantize,
    )
    _ = int(np.asarray(toks)[0, -1])
    dt = time.perf_counter() - t0

    total = args.batch * args.tokens
    cache = "int8" if args.kv_quantize else "bf16"
    print(
        f"decode: {args.batch} req x {args.tokens} tok @ history "
        f"{args.history} ({cache} cache): {dt:.2f} s = "
        f"{total / dt:.0f} tok/s ({dt / args.tokens * 1e3:.2f} ms/step)"
    )
    print("sampled tail:", np.asarray(toks)[0, -8:].tolist())

    if args.ragged:
        # continuous-batching style: each request has its own history
        # length; per-row cache offsets let them decode in one batch
        lens = [
            max(1, args.history // (i + 1)) for i in range(args.batch)
        ]
        ragged_prompts = [
            rng.integers(0, 256, l).astype(np.int32) for l in lens
        ]
        t0 = time.perf_counter()
        out = model.generate_text_batch(
            params, ragged_prompts, max_new_tokens=args.tokens,
            rng=jax.random.PRNGKey(4), kv_quantize=args.kv_quantize,
        )
        _ = int(np.asarray(out)[0, -1])
        dt = time.perf_counter() - t0
        print(
            f"ragged batch (histories {lens}): {args.tokens} tok/request "
            f"in {dt:.2f} s (cold incl. compile)"
        )

    if args.engine:
        # continuous batching: a slot pool with admission/retirement — short
        # requests retire early and queued ones take their slots
        # (models/engine.py; --batch slots, 2x --batch requests)
        from transfusion_tpu.models.engine import ServingEngine

        n_req = args.batch * 2
        lens = [max(1, args.history // (i % args.batch + 1))
                for i in range(n_req)]
        budgets = [args.tokens // (2 if i % 2 else 1) for i in range(n_req)]
        eng = ServingEngine(
            model, params, max_batch=args.batch,
            max_seq_len=args.history + args.tokens, decode_chunk=16,
            kv_quantize=args.kv_quantize or None,
        )
        for l, b in zip(lens, budgets):
            eng.submit(rng.integers(0, 256, l).astype(np.int32), b)
        t0 = time.perf_counter()
        done = eng.run()
        dt = time.perf_counter() - t0
        got = sum(len(r.tokens) for r in done)
        print(
            f"engine ({n_req} req over {args.batch} slots, histories "
            f"{lens}, budgets {budgets}): {got} tok in {dt:.2f} s "
            f"(cold incl. compile; {eng.stats['decode_chunks']} chunks)"
        )

    if args.mm_engine:
        # continuous batching of FULL sample() requests: AR text, som-
        # triggered flow-ODE image segments, CFG — admitted into pool slots
        # and retired as they finish (models/engine_mm.py). The reference's
        # sample() is strictly batch-1 (ref transfusion.py:1625-1948).
        from transfusion_tpu.models.engine_mm import MultimodalServingEngine

        n_req = args.batch * 2
        som = model.som_ids[0]
        mm_prompts, mm_budgets = [], []
        for i in range(n_req):
            hist = rng.integers(0, 256, 24 + 8 * (i % 3)).astype(np.int32)
            if i % 4 == 0:  # minority: forced image segment + text tail
                mm_prompts.append([np.concatenate(
                    [hist, np.asarray([som], np.int32)]
                )])
                mm_budgets.append(220)  # 14x14=196 latent rows + text tail
            else:
                mm_prompts.append([hist])
                mm_budgets.append(16)
        eng = MultimodalServingEngine.for_workload(
            model, params, mm_prompts, max(mm_budgets),
            max_requests=args.batch, modality_steps=8, cfg_scale=3.0,
            return_unprocessed_modalities=True,
        )
        for mp, mb in zip(mm_prompts, mm_budgets):
            eng.submit(mp, max_length=mb)
        t0 = time.perf_counter()
        done = eng.run()
        dt = time.perf_counter() - t0
        print(
            f"mm-engine ({n_req} sample()-requests over {args.batch} "
            f"slots): {eng.stats['text_tokens']} text + "
            f"{eng.stats['modality_tokens']} latent tokens in {dt:.2f} s "
            f"(cold incl. compile; {eng.stats['text_chunks']} text chunks, "
            f"{eng.stats['ode_dispatches']} ODE dispatches)"
        )

    if args.multimodal:
        t0 = time.perf_counter()
        out = model.sample(
            params,
            prompt=[np.asarray([model.som_ids[0]], np.int32)],
            rng=jax.random.PRNGKey(3),
            max_length=8,
            modality_steps=16,
            cache_kv=True,
            kv_quantize=args.kv_quantize,
            return_unprocessed_modalities=True,
        )
        dt = time.perf_counter() - t0
        kinds = ["mod" if isinstance(o, tuple) else "text" for o in out]
        print(f"multimodal sample() ({cache} cache): {dt:.2f} s, {kinds}")


if __name__ == "__main__":
    main()

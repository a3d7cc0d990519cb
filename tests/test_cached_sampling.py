"""KV-cached sampling fast path: numerical parity with the uncached path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transfusion_tpu.models.transfusion import Transfusion


def make_model(attn_impl="dense", **kw):
    # dim_head 32 so the Pallas decode/flash kernels are eligible when
    # attn_impl='flash' (they support head dims 32/64/128/256)
    return Transfusion(
        num_text_tokens=8,
        dim_latent=16,
        modality_default_shape=(4,),
        transformer=dict(dim=32, depth=2, dim_head=32, heads=2,
                         attn_impl=attn_impl),
        pad_multiple=16,
        **kw,
    )


@pytest.mark.parametrize("attn_impl", ["dense", "flash"])
def test_prefill_and_stream_match_full_forward(attn_impl):
    """Prefill logits + streamed decode logits == full joint forward logits.

    attn_impl='flash' routes the prefill through the flash kernel and the
    decode steps through the Pallas decode kernel (interpret mode on CPU)."""
    model = make_model(attn_impl)
    params = model.init_params(jax.random.PRNGKey(0))

    items_full = [np.asarray([model.sos_id, 1, 2, 3, 4, 5], np.int32)]
    items_prefix = [np.asarray([model.sos_id, 1, 2, 3], np.int32)]

    packed_full = model.pack([items_full], wrap_sos_eos=False, add_meta=False)
    m = packed_full.spans.shape[1]
    logits_full, _, _, _, _ = model.core.apply(
        params,
        jax.tree.map(jnp.asarray, packed_full),
        jnp.ones((1, m)),
        method="joint",
    )

    # cached: prefill the prefix, then stream tokens 4 and 5
    last, cache = model._get_jit(
        "sample_prefill", model._prefill_impl, static_argnames=("cap",)
    )(params, jax.tree.map(jnp.asarray,
                           model.pack([items_prefix], wrap_sos_eos=False,
                                      add_meta=False)), cap=128)
    np.testing.assert_allclose(
        np.asarray(last[0]), np.asarray(logits_full[0, 3]), atol=1e-4
    )

    fn = model._get_jit(
        "sample_decode_text", model._decode_text_impl,
        static_argnames=("temperature", "min_p"),
    )
    for i, tok in enumerate([4, 5]):
        pos = 4 + i
        _, logits, cache = fn(
            params, cache,
            jnp.asarray([[tok]], jnp.int32),
            jnp.asarray([[pos]], jnp.int32),
            jax.random.PRNGKey(0),
            temperature=1.0, min_p=0.1,
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(logits_full[0, pos]), atol=1e-4
        )


@pytest.mark.parametrize("attn_impl", ["dense", "flash"])
def test_cached_sample_matches_uncached_modality(attn_impl):
    """With a som prime and fixed init noise, the first sampled modality must
    match between cached and uncached paths (deterministic ODE). flash also
    exercises the Pallas decode kernel on the ODE tail rows."""
    model = make_model(attn_impl)
    params = model.init_params(jax.random.PRNGKey(0))

    noise = np.random.default_rng(0).standard_normal((64, 16)).astype(np.float32)
    kw = dict(
        prompt=[np.asarray(model.som_ids[0])],
        max_length=2,
        modality_steps=4,
        init_modality_noise=noise,
        cfg_scale=3.0,
        return_unprocessed_modalities=True,
    )
    out_a = model.sample(params, rng=jax.random.PRNGKey(1), cache_kv=False, **kw)
    out_b = model.sample(params, rng=jax.random.PRNGKey(1), cache_kv=True, **kw)

    lat_a = next(o[1] for o in out_a if isinstance(o, tuple))
    lat_b = next(o[1] for o in out_b if isinstance(o, tuple))
    assert lat_a.shape == lat_b.shape == (4, 16)
    np.testing.assert_allclose(lat_a, lat_b, atol=2e-3)


def test_cached_sample_runs_multi_segment():
    """Full cached loop across text + modality + text segments."""
    model = make_model()
    params = model.init_params(jax.random.PRNGKey(0))
    out = model.sample(
        params, prompt=[np.asarray(model.som_ids[0])],
        rng=jax.random.PRNGKey(3), max_length=10, modality_steps=2,
        cache_kv=True,
    )
    kinds = ["mod" if isinstance(o, tuple) else "text" for o in out]
    assert "mod" in kinds
    # text continues after the modality (eom + sampled tokens)
    assert kinds[-1] == "text" or kinds[-2] == "text"


@pytest.mark.parametrize("attn_impl", ["dense", "flash"])
def test_incremental_cfg_cache_matches_rebuild(attn_impl):
    """The batch-2 incremental CFG cache (default) must produce the same
    generation as the rebuild-per-segment mode (the reference's cost
    profile) — same rng, same tokens, same latents."""
    model = make_model(attn_impl)
    params = model.init_params(jax.random.PRNGKey(0))

    noise = np.random.default_rng(0).standard_normal((64, 16)).astype(np.float32)
    kw = dict(
        prompt=[np.asarray(model.som_ids[0])],
        max_length=12,
        modality_steps=4,
        init_modality_noise=noise,
        cfg_scale=3.0,
        text_temperature=0.0,  # greedy: token-exact comparison
        return_unprocessed_modalities=True,
        cache_kv=True,
    )
    out_inc = model.sample(
        params, rng=jax.random.PRNGKey(1), incremental_cfg_cache=True, **kw
    )
    out_reb = model.sample(
        params, rng=jax.random.PRNGKey(1), incremental_cfg_cache=False, **kw
    )

    assert len(out_inc) == len(out_reb)
    for a, b in zip(out_inc, out_reb):
        if isinstance(a, tuple):
            assert isinstance(b, tuple) and a[0] == b[0]
            np.testing.assert_allclose(a[1], b[1], atol=2e-3)
        else:
            np.testing.assert_array_equal(a, b)


def test_incremental_cfg_multi_modality():
    """A generation emitting several modalities never re-prefills the
    uncond stream: count prefill invocations."""
    model = make_model()
    params = model.init_params(jax.random.PRNGKey(0))

    calls = {"n": 0}
    orig_get_jit = model._get_jit

    def patched_get_jit(name, fn, **kw):
        f = orig_get_jit(name, fn, **kw)
        if name != "sample_prefill":
            return f

        def wrapper(*a, **k):
            calls["n"] += 1
            return f(*a, **k)

        return wrapper

    model._get_jit = patched_get_jit
    out = model.sample(
        params, prompt=[np.asarray(model.som_ids[0])],
        rng=jax.random.PRNGKey(3), max_length=16, modality_steps=2,
        cache_kv=True, cfg_scale=3.0, return_unprocessed_modalities=True,
    )
    n_mods = sum(isinstance(o, tuple) for o in out)
    assert n_mods >= 1
    # one initial prefill only (re-prefill happens only on capacity
    # exhaustion, impossible at this size); rebuild mode would add one per
    # modality segment
    assert calls["n"] == 1, calls["n"]


def test_cached_sample_no_cfg():
    model = make_model()
    params = model.init_params(jax.random.PRNGKey(0))
    out = model.sample(
        params, prompt=[np.asarray(model.som_ids[0])],
        rng=jax.random.PRNGKey(3), max_length=4, modality_steps=2,
        cache_kv=True, cfg_scale=1.0,
    )
    assert any(isinstance(o, tuple) for o in out)


def test_cached_sample_bf16():
    model = make_model(dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    out = model.sample(
        params, prompt=[np.asarray(model.som_ids[0])],
        rng=jax.random.PRNGKey(3), max_length=4, modality_steps=2,
        cache_kv=True,
    )
    lat = next(o[1] for o in out if isinstance(o, tuple))
    assert np.isfinite(np.asarray(lat, np.float32)).all()


def test_sample_trace_count_bounded_by_buckets(monkeypatch):
    """Uncached sample() must trace O(log n) step functions, not O(n):
    the packed length is bucketed to the next power-of-two multiple of
    pad_multiple (VERDICT r1 weak #6)."""
    import jax
    import numpy as np
    from transfusion_tpu.models.transfusion import Transfusion

    model = Transfusion(
        num_text_tokens=16,
        dim_latent=4,
        modality_default_shape=(2,),
        transformer=dict(dim=16, depth=1, dim_head=8, heads=2),
        pad_multiple=16,
    )
    params = model.init_params(jax.random.PRNGKey(0))

    traces = []
    orig = model._sample_text_step_impl

    def counting(params, packed, rng, **kw):
        traces.append(packed.text.shape[1])
        return orig(params, packed, rng, **kw)

    monkeypatch.setattr(model, "_sample_text_step_impl", counting)
    # text-only run to max_length: never stop on eos, never enter a modality
    monkeypatch.setattr(model, "eos_id", -999)
    # som id outside the vocab: can never be sampled, so no modality segment
    monkeypatch.setattr(model, "som_ids", [model.vocab_size + 999])

    out = model.sample(
        params,
        prompt=np.arange(4, dtype=np.int32),
        rng=jax.random.PRNGKey(1),
        max_length=100,
        return_unprocessed_modalities=True,
    )
    total = sum(len(np.asarray(x).reshape(-1)) for x in out)
    assert total >= 100, f"sampled only {total} tokens"
    # lengths seen: 16, 32, 64, 128 -> at most 4 traces (and all power-of-2
    # multiples of pad_multiple)
    assert len(traces) <= 4, f"{len(traces)} traces at lengths {traces}"
    for L in traces:
        assert L % 16 == 0 and (L // 16) & ((L // 16) - 1) == 0, traces


# ---------------------------------------------------------------------------
# int8-quantized KV cache (serving path; make_kv_cache(quantize='int8'))
# ---------------------------------------------------------------------------


def test_quantize_rows_roundtrip_bound():
    from transfusion_tpu.models.layers import _quantize_rows

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 16))
    q, s = _quantize_rows(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 4, 8, 1)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(x))
    # symmetric absmax: |err| <= scale/2 per row
    assert (err <= np.asarray(s) * 0.5 + 1e-6).all()
    # all-zero rows stay zero
    q0, s0 = _quantize_rows(jnp.zeros((1, 3)))
    assert np.asarray(q0).max() == 0 and np.isfinite(np.asarray(s0)).all()


@pytest.mark.parametrize("attn_impl", ["dense", "flash"])
def test_int8_cache_decode_logits_close(attn_impl):
    """Teacher-forced cached decode: int8 cache logits track the fp cache.

    attn_impl='flash' reads the int8 buffers through the Pallas decode
    kernel (in-kernel dequantization)."""
    model = make_model(attn_impl)
    params = model.init_params(jax.random.PRNGKey(0))
    items = [np.asarray([model.sos_id, 1, 2, 3], np.int32)]
    packed = jax.tree.map(
        jnp.asarray, model.pack([items], wrap_sos_eos=False, add_meta=False)
    )

    outs = {}
    for quant in (False, True):
        last, cache = model._prefill_impl(params, packed, cap=128, quantize=quant)
        if quant:
            kbuf = cache["kT"] if "kT" in cache else cache["k"]
            assert kbuf.dtype == jnp.int8 and "k_scale" in cache
        logits_seq = [np.asarray(last[0])]
        for i, tok in enumerate([4, 5, 6]):
            _, logits, cache = model._decode_text_impl(
                params, cache,
                jnp.asarray([[tok]], jnp.int32),
                jnp.asarray([[4 + i]], jnp.int32),
                jax.random.PRNGKey(0),
                temperature=1.0, min_p=0.1,
            )
            logits_seq.append(np.asarray(logits))
        outs[quant] = np.stack(logits_seq)

    # prefill logits are identical (nothing read from the quantized slots
    # affects the last position beyond its own row's rounding); decode logits
    # accumulate per-row int8 rounding only
    np.testing.assert_allclose(outs[True], outs[False], atol=0.05)
    spread = np.abs(outs[False]).max()
    assert spread > 0.05, "degenerate logits make this test vacuous"


def test_int8_cache_memory_halves():
    from transfusion_tpu.models.transformer import make_kv_cache

    fp = make_kv_cache(2, 1, 4, 128, 8, dtype=jnp.bfloat16)
    q8 = make_kv_cache(2, 1, 4, 128, 8, quantize="int8")
    fp_bytes = fp["k"].nbytes + fp["v"].nbytes
    q8_bytes = (
        q8["k"].nbytes + q8["v"].nbytes
        + q8["k_scale"].nbytes + q8["v_scale"].nbytes
    )
    # int8 payload + f32/row scale: 8+4=12 bytes/row-of-8 vs bf16's 16.
    # at realistic dim_head 64: 68 vs 128 (~1.9x); assert the d=8 ratio here
    assert q8_bytes < fp_bytes, (q8_bytes, fp_bytes)
    big_fp = make_kv_cache(1, 1, 1, 16, 64, dtype=jnp.bfloat16)
    big_q8 = make_kv_cache(1, 1, 1, 16, 64, quantize="int8")
    ratio = (big_fp["k"].nbytes + big_fp["v"].nbytes) / (
        big_q8["k"].nbytes + big_q8["v"].nbytes
        + big_q8["k_scale"].nbytes + big_q8["v_scale"].nbytes
    )
    assert ratio > 1.8, ratio


def test_cached_sample_kv_quantize_end_to_end():
    """Full cached sampling loop with the int8 cache: text + modality + text."""
    model = make_model()
    params = model.init_params(jax.random.PRNGKey(0))
    out = model.sample(
        params, prompt=[np.asarray(model.som_ids[0])],
        rng=jax.random.PRNGKey(3), max_length=8, modality_steps=2,
        cache_kv=True, kv_quantize=True,
    )
    lat = next(o[1] for o in out if isinstance(o, tuple))
    assert np.isfinite(np.asarray(lat, np.float32)).all()


@pytest.mark.parametrize("attn_impl", ["dense", "flash"])
def test_generate_text_only_kv_quantize(attn_impl):
    model = make_model(attn_impl)
    params = model.init_params(jax.random.PRNGKey(0))
    prompt = jnp.asarray([[model.sos_id, 1, 2]], jnp.int32)
    toks = model.generate_text_only(
        params, prompt, seq_len=11, rng=jax.random.PRNGKey(1),
        kv_quantize=True,
    )
    assert toks.shape == (1, 8)
    assert (np.asarray(toks) >= 0).all()
    assert (np.asarray(toks) < model.num_text_tokens).all()


def test_generate_text_only_flash_matches_dense():
    """gen_text (prefill via flash kernel + scan decode via the Pallas
    decode kernel) must reproduce the dense path token-for-token on the
    same rng (both fp caches, identical numerics up to kernel rounding —
    greedy argmax over a trained-free model can tie-break differently, so
    compare with temperature 0 on logits that are well-separated via a
    fixed prompt repeated)."""
    dense = make_model("dense")
    flash = make_model("flash")
    params = dense.init_params(jax.random.PRNGKey(0))
    prompt = jnp.asarray([[dense.sos_id, 1, 2, 3, 4, 5, 6, 7]], jnp.int32)
    t_dense = dense.generate_text_only(
        params, prompt, seq_len=16, rng=jax.random.PRNGKey(7)
    )
    t_flash = flash.generate_text_only(
        params, prompt, seq_len=16, rng=jax.random.PRNGKey(7)
    )
    np.testing.assert_array_equal(np.asarray(t_dense), np.asarray(t_flash))


def test_decode_kernel_matches_dense_oracle():
    """decode_attention (fp and int8) vs a straight softmax reference."""
    from transfusion_tpu.models.layers import _quantize_rows
    from transfusion_tpu.ops.pallas_decode_kernel import (
        NEG_INF, decode_attention,
    )

    b, h, nq, d, cap = 2, 3, 5, 32, 256
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, nq, d))
    k = jax.random.normal(kk, (b, h, cap, d))
    v = jax.random.normal(kv, (b, h, cap, d))
    valid = jnp.arange(cap)[None, :] < jnp.asarray([[100], [163]])  # [b, cap]
    softcap = 50.0

    def oracle(kf, vf):
        s = jnp.einsum("bhid,bhjd->bhij", q * d**-0.5, kf)
        s = jnp.tanh(s / softcap) * softcap
        s = jnp.where(valid[:, None, None, :], s, -jnp.inf)
        return jnp.einsum("bhij,bhjd->bhid", jax.nn.softmax(s, -1), vf)

    bias = jnp.broadcast_to(
        jnp.where(valid, 0.0, NEG_INF)[:, None, :], (b, 8, cap)
    ).astype(jnp.float32)

    # the kernel streams the transposed cache layout [b, h, d, cap]
    out = decode_attention(
        q, k.swapaxes(-1, -2), v.swapaxes(-1, -2), bias, softcap=softcap
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(oracle(k, v)), atol=1e-5
    )

    # per-row early exit: passing the exact valid counts must not change
    # the result (the skipped tail is fully bias-masked anyway)
    out_lens = decode_attention(
        q, k.swapaxes(-1, -2), v.swapaxes(-1, -2), bias, softcap=softcap,
        lens=jnp.asarray([100, 163], jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(out_lens), np.asarray(out), atol=1e-6
    )

    k8, ks = _quantize_rows(k)
    v8, vs = _quantize_rows(v)
    out_q = decode_attention(
        q, k8.swapaxes(-1, -2), v8.swapaxes(-1, -2), bias,
        k_scale=ks.swapaxes(-1, -2), v_scale=vs.swapaxes(-1, -2),
        softcap=softcap,
    )
    ref_q = oracle(k8 * ks, v8 * vs)  # dequantized oracle: exact target
    np.testing.assert_allclose(
        np.asarray(out_q), np.asarray(ref_q), atol=1e-5
    )


# ---------------------------------------------------------------------------
# ragged batched serving (per-row cache offsets; generate_text_batch)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("attn_impl", ["dense", "flash"])
def test_ragged_degenerate_matches_rectangular(attn_impl):
    """All-equal lengths through the ragged path must reproduce the
    rectangular path token-for-token (same positions, masks, rng)."""
    model = make_model(attn_impl)
    params = model.init_params(jax.random.PRNGKey(0))
    prompt = jnp.asarray(
        [[model.sos_id, 1, 2, 3], [model.sos_id, 4, 5, 6]], jnp.int32
    )
    rect = model.generate_text_only(
        params, prompt, seq_len=12, rng=jax.random.PRNGKey(5)
    )
    ragged = model.generate_text_only(
        params, prompt, seq_len=12, rng=jax.random.PRNGKey(5),
        prompt_lengths=jnp.asarray([4, 4]),
    )
    np.testing.assert_array_equal(np.asarray(rect), np.asarray(ragged))


@pytest.mark.parametrize("attn_impl", ["dense", "flash"])
def test_ragged_rows_match_individual_greedy(attn_impl):
    """Each ragged row must decode the same greedy tokens as running its
    prompt alone through the rectangular path."""
    model = make_model(attn_impl)
    params = model.init_params(jax.random.PRNGKey(0))
    prompts = [
        np.asarray([model.sos_id, 1, 2], np.int32),
        np.asarray([model.sos_id, 3, 4, 5, 6, 7], np.int32),
    ]
    batched = model.generate_text_batch(
        params, prompts, max_new_tokens=6, rng=jax.random.PRNGKey(5),
        temperature=0.0,
    )
    for i, p in enumerate(prompts):
        solo = model.generate_text_only(
            params, jnp.asarray(p)[None], seq_len=len(p) + 6,
            rng=jax.random.PRNGKey(5), temperature=0.0,
        )
        np.testing.assert_array_equal(
            np.asarray(batched)[i], np.asarray(solo)[0],
            err_msg=f"row {i} (len {len(p)})",
        )


def test_ragged_int8_smoke():
    model = make_model("flash")
    params = model.init_params(jax.random.PRNGKey(0))
    prompts = [np.asarray([model.sos_id, 1], np.int32),
               np.asarray([model.sos_id, 2, 3, 4], np.int32)]
    toks = model.generate_text_batch(
        params, prompts, max_new_tokens=5, rng=jax.random.PRNGKey(1),
        kv_quantize=True,
    )
    assert toks.shape == (2, 5)
    assert (np.asarray(toks) >= 0).all()
    assert (np.asarray(toks) < model.num_text_tokens).all()


def test_decode_kernel_padded_prefill_slot_gap():
    """Regression (r2 review): after a padded prefill the cache write
    pointer sits at the padded width while the mask marks only the true
    prefix — the decode kernel's early exit must bound streaming by
    idx + n (the freshly written slot), not the valid-slot COUNT, or the
    new token's K/V silently falls out of its own attention."""
    kw = dict(num_text_tokens=8, dim_latent=16, modality_default_shape=(4,),
              pad_multiple=64)
    tcfg = dict(dim=32, depth=2, dim_head=32, heads=2)
    dense = Transfusion(transformer=dict(**tcfg, attn_impl="dense"), **kw)
    flash = Transfusion(transformer=dict(**tcfg, attn_impl="flash"), **kw)
    params = dense.init_params(jax.random.PRNGKey(0))

    # 100 real tokens pad to 128 -> prefill idx = 128; with cap 384 the
    # kernel's block size is 128, so slot 128 (the decode write) lives in
    # block 1 while only 101 slots are valid
    toks = np.r_[dense.sos_id, (np.arange(99) % 8)].astype(np.int32)
    packed = jax.tree.map(
        jnp.asarray,
        dense.pack([[toks]], wrap_sos_eos=False, add_meta=False),
    )
    assert packed.text.shape[1] == 128

    outs = {}
    for name, model in (("dense", dense), ("flash", flash)):
        last, cache = model._prefill_impl(params, packed, cap=384)
        _, logits, _ = model._decode_text_impl(
            params, cache,
            jnp.asarray([[5]], jnp.int32),
            jnp.asarray([[100]], jnp.int32),
            jax.random.PRNGKey(0),
            temperature=1.0, min_p=0.1,
        )
        outs[name] = np.asarray(logits)
    np.testing.assert_allclose(outs["flash"], outs["dense"], atol=1e-4)


def test_generate_text_batch_rejects_empty_prompt():
    model = make_model("flash")
    model.init_params(jax.random.PRNGKey(0))
    with pytest.raises(AssertionError, match="every prompt needs"):
        model.generate_text_batch(
            model.params, [np.asarray([], np.int32)], max_new_tokens=2
        )

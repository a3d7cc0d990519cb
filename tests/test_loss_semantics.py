"""Loss-semantics invariants pinned by the reference (transfusion.py:2842-2949).

These tests verify the *weighting math* and masking rules rather than just
finiteness: fraction weights, label ignore rules, CFG dropout behavior, and
time overrides.
"""

import jax
import jax.numpy as jnp
import numpy as np

from transfusion_tpu.models.transfusion import Transfusion
from transfusion_tpu.ops.spans import spans_to_is_any_modality


def tiny_model(**kw):
    return Transfusion(
        num_text_tokens=8,
        dim_latent=16,
        modality_default_shape=(4,),
        transformer=dict(dim=32, depth=1, dim_head=8, heads=4),
        pad_multiple=16,
        prob_uncond=0.0,
        **kw,
    )


def test_text_ce_weight_is_kept_fraction():
    """total = text_CE * kept/total_tokens when there are no modalities."""
    model = tiny_model()
    params = model.init_params(jax.random.PRNGKey(0))

    batch = [[np.arange(6, dtype=np.int32) % 8]]
    packed = model.pack(batch)
    total, breakdown = model.loss(
        params, batch, jax.random.PRNGKey(1), return_breakdown=True
    )

    # sample: [sos] t0..t5 [eos] -> 8 tokens; labels: 7 positions, all valid
    assert int(packed.total_tokens) == 8
    kept = 7
    np.testing.assert_allclose(
        float(total), float(breakdown.text) * kept / 8, rtol=1e-6
    )


def test_modality_fraction_weighting():
    model = tiny_model()
    params = model.init_params(jax.random.PRNGKey(0))

    batch = [[np.arange(4, dtype=np.int32), np.random.randn(4, 16).astype(np.float32)]]
    packed = model.pack(batch)
    total, bd = model.loss(
        params, batch, jax.random.PRNGKey(1), return_breakdown=True
    )

    # layout: [sos] 4 text [meta] '4' [som] 4 interior [eom] [eos] = 14 tokens
    assert int(packed.total_tokens) == 14
    # modality token fraction = 4/14; text kept labels:
    n = packed.text.shape[1] - 1
    labels = packed.text[:, 1:]
    is_mod = np.asarray(spans_to_is_any_modality(n, packed.spans))
    valid = (np.asarray(labels) != -1) & ~is_mod
    kept = valid.sum()
    want = float(bd.text) * kept / 14 + float(bd.flow[0]) * 4 / 14
    np.testing.assert_allclose(float(total), want, rtol=1e-5)


def test_cfg_dropout_prob_one_nulls_text_labels():
    """prob_uncond=1: every user-text label becomes null -> ignored; only
    meta/som/eom-adjacent labels remain learnable."""
    model = tiny_model()
    params = model.init_params(jax.random.PRNGKey(0))
    batch = [[np.arange(6, dtype=np.int32) % 8]]

    t_full, bd_full = model.loss(
        params, batch, jax.random.PRNGKey(1), return_breakdown=True,
        prob_uncond=0.0,
    )
    t_null, bd_null = model.loss(
        params, batch, jax.random.PRNGKey(1), return_breakdown=True,
        prob_uncond=1.0,
    )
    # pure-text sample fully nulled -> zero kept labels -> zero loss
    assert float(t_null) == 0.0
    assert float(t_full) > 0.0


def test_explicit_times_are_used():
    """times=1 noises nothing: noised == clean, so the flow target x - noise
    has a different relationship than times=0 (pure noise input)."""
    model = tiny_model(model_output_clean=False)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = [[np.random.randn(4, 16).astype(np.float32)]]

    m = model.pack(batch).spans.shape[1]
    t1 = model.loss(params, batch, jax.random.PRNGKey(1),
                    times=jnp.ones((1, m)))
    t0 = model.loss(params, batch, jax.random.PRNGKey(1),
                    times=jnp.zeros((1, m)))
    assert float(t1) != float(t0)


def test_loss_deterministic_given_rng():
    model = tiny_model()
    params = model.init_params(jax.random.PRNGKey(0))
    batch = [[np.arange(4, dtype=np.int32),
              np.random.randn(4, 16).astype(np.float32)]]
    a = model.loss(params, batch, jax.random.PRNGKey(7))
    b = model.loss(params, batch, jax.random.PRNGKey(7))
    c = model.loss(params, batch, jax.random.PRNGKey(8))
    assert float(a) == float(b)
    assert float(a) != float(c)


def test_eom_never_a_learned_label():
    """The last interior position's label is [eom], but it sits inside the
    modality span, so it is masked (the reference appends eom manually at
    sampling time, transfusion.py:1916)."""
    model = tiny_model()
    batch = [[np.arange(2, dtype=np.int32),
              np.random.randn(3, 16).astype(np.float32)]]
    packed = model.pack(batch)
    n = packed.text.shape[1] - 1
    labels = np.asarray(packed.text[:, 1:])
    is_mod = np.asarray(spans_to_is_any_modality(n, packed.spans))
    eom = model.eom_ids[0]
    eom_positions = np.nonzero(labels[0] == eom)[0]
    assert len(eom_positions) == 1
    assert is_mod[0, eom_positions[0]]  # masked by the span


def test_grad_excludes_padding():
    """Padding rows must not affect the loss: packing with extra pad length
    gives identical loss."""
    model = tiny_model()
    params = model.init_params(jax.random.PRNGKey(0))
    batch = [[np.arange(4, dtype=np.int32),
              np.random.randn(4, 16).astype(np.float32)]]
    p1 = model.pack(batch, pad_len=16)
    p2 = model.pack(batch, pad_len=32)
    l1 = model.loss(params, batch, jax.random.PRNGKey(1), packed=p1)
    l2 = model.loss(params, batch, jax.random.PRNGKey(1), packed=p2)
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)


def test_chunked_ce_matches_dense():
    kw = dict(
        num_text_tokens=8,
        dim_latent=16,
        modality_default_shape=(4,),
        transformer=dict(dim=32, depth=1, dim_head=8, heads=4),
        pad_multiple=16,
        prob_uncond=0.0,
    )
    import copy

    from transfusion_tpu.models.transfusion import Transfusion as T

    dense = T(**copy.deepcopy(kw))
    chunked = T(**copy.deepcopy(kw), ce_chunk_size=7)  # non-divisor on purpose
    params = dense.init_params(jax.random.PRNGKey(0))

    batch = [[np.arange(6, dtype=np.int32) % 8,
              np.random.randn(4, 16).astype(np.float32)]]
    a = dense.loss(params, batch, jax.random.PRNGKey(1))
    b = chunked.loss(params, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(a), float(b), rtol=1e-5)


def test_flash_training_loss_matches_dense():
    """attn_impl='flash' through the FULL jitted loss (fwd) equals dense."""
    import copy

    kw = dict(
        num_text_tokens=8,
        dim_latent=16,
        modality_default_shape=(40,),
        transformer=dict(dim=32, depth=2, dim_head=64, heads=2),
        pad_multiple=128,
        prob_uncond=0.0,
    )
    dense = Transfusion(**copy.deepcopy(kw))
    kw["transformer"]["attn_impl"] = "flash"
    flash = Transfusion(**copy.deepcopy(kw))
    params = dense.init_params(jax.random.PRNGKey(0))

    batch = [[np.random.randint(0, 8, 60).astype(np.int32),
              np.random.randn(40, 16).astype(np.float32),
              np.random.randint(0, 8, 20).astype(np.int32)]]
    packed = dense.pack(batch, shift_friendly=True)
    assert (packed.seq_len - 1) % 8 == 0  # flash-eligible after the shift

    a = dense.loss(params, batch, jax.random.PRNGKey(1), packed=packed)
    b = flash.loss(params, batch, jax.random.PRNGKey(1), packed=packed)
    np.testing.assert_allclose(float(a), float(b), rtol=2e-4)

    # gradients agree too (flash backward kernels)
    ga = jax.grad(lambda p: dense.loss(p, batch, jax.random.PRNGKey(1), packed=packed))(params)
    gb = jax.grad(lambda p: flash.loss(p, batch, jax.random.PRNGKey(1), packed=packed))(params)
    na = float(jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree.leaves(ga))))
    nb = float(jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree.leaves(gb))))
    np.testing.assert_allclose(na, nb, rtol=5e-3)

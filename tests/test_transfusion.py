"""End-to-end Transfusion model tests, mirroring the reference test matrix
(/root/reference/tests/test_transfusion.py) plus gradient checks.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transfusion_tpu.models.transfusion import Transfusion, LossBreakdown


def tiny_transformer(**kw):
    cfg = dict(dim=32, depth=2, dim_head=8, heads=4)
    cfg.update(kw)
    return cfg


def randint(shape, hi=8):
    return np.random.randint(0, hi, size=shape).astype(np.int32)


def make_two_modality_model(**kw):
    return Transfusion(
        num_text_tokens=8,
        dim_latent=(24, 12),
        modality_default_shape=((4,), (6,)),
        transformer=tiny_transformer(**kw.pop("transformer", {})),
        pad_multiple=16,
        **kw,
    )


def grad_norm(g):
    return jnp.sqrt(
        sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in jax.tree.leaves(g))
    )


# default tier keeps the two corner configs; the mixed middle of the
# cube runs in the full tier (VERDICT r4 #3 tiering)
@pytest.mark.parametrize(
    "num_residual_streams,reconstruction_loss_weight,model_output_clean",
    [
        (1, 0.0, False),
        (4, 0.1, True),
        pytest.param(4, 0.0, False, marks=pytest.mark.slow),
        pytest.param(1, 0.1, False, marks=pytest.mark.slow),
        pytest.param(1, 0.0, True, marks=pytest.mark.slow),
        pytest.param(4, 0.1, False, marks=pytest.mark.slow),
        pytest.param(1, 0.1, True, marks=pytest.mark.slow),
        pytest.param(4, 0.0, True, marks=pytest.mark.slow),
    ],
)
def test_transfusion_joint(
    num_residual_streams, reconstruction_loss_weight, model_output_clean
):
    model = make_two_modality_model(
        reconstruction_loss_weight=reconstruction_loss_weight,
        model_output_clean=model_output_clean,
        transformer=dict(num_residual_streams=num_residual_streams),
    )
    params = model.init_params(jax.random.PRNGKey(0))

    batch = [
        [randint(16), (0, np.random.randn(4, 24).astype(np.float32)),
         randint(8), (1, np.random.randn(6, 12).astype(np.float32))],
        [randint(16), np.random.randn(7, 24).astype(np.float32),
         randint(5), (1, np.random.randn(2, 12).astype(np.float32)), randint(9)],
    ]

    loss, breakdown = model.loss(
        params, batch, jax.random.PRNGKey(1), return_breakdown=True
    )
    assert np.isfinite(float(loss))
    assert isinstance(breakdown, LossBreakdown)
    assert len(breakdown.flow) == 2
    if reconstruction_loss_weight > 0:
        assert breakdown.recon is not None

    # gradients flow
    g = jax.grad(lambda p: model.loss(p, batch, jax.random.PRNGKey(1)))(params)
    assert np.isfinite(float(grad_norm(g)))
    assert float(grad_norm(g)) > 0


def test_transfusion_sample_from_som_prime():
    model = make_two_modality_model()
    params = model.init_params(jax.random.PRNGKey(0))

    prime = [np.asarray(model.som_ids[0], np.int64)]
    out = model.sample(
        params, prompt=prime, rng=jax.random.PRNGKey(2),
        max_length=12, modality_steps=3,
    )
    kinds = ["mod" if isinstance(o, tuple) else "text" for o in out]
    assert "mod" in kinds  # som prime forces an immediate modality
    (mtype, latent) = next(o for o in out if isinstance(o, tuple))
    assert mtype == 0 and latent.shape == (4, 24)  # default shape fallback


def test_auto_modality_transform_channel_first():
    model = Transfusion(
        num_text_tokens=8,
        dim_latent=24,
        channel_first_latent=True,
        modality_default_shape=(2, 2),
        transformer=tiny_transformer(),
        pad_multiple=16,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    batch = [
        [randint(16), np.random.randn(24, 2, 2).astype(np.float32)],
        [randint(5), np.random.randn(24, 2, 2).astype(np.float32), randint(9)],
    ]
    loss = model.loss(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    out = model.sample(
        params, prompt=[np.asarray(model.som_ids[0])],
        rng=jax.random.PRNGKey(3), max_length=8, modality_steps=3,
    )
    (mtype, latent) = next(o for o in out if isinstance(o, tuple))
    assert latent.shape == (24, 2, 2)  # user layout restored


@pytest.mark.parametrize("return_loss", [False, True])
def test_text_only(return_loss):
    model = Transfusion(
        num_text_tokens=32,
        dim_latent=24,
        modality_default_shape=(4,),
        transformer=tiny_transformer(),
    )
    params = model.init_params(jax.random.PRNGKey(0))
    text = randint((2, 64), hi=32)
    out = model.forward_text(params, text, return_loss=return_loss)
    if return_loss:
        assert np.isfinite(float(out))
    else:
        assert out.shape == (2, 64, model.vocab_size)


@pytest.mark.parametrize("channel_first", [False, True])
def test_modality_only(channel_first):
    model = Transfusion(
        num_text_tokens=16,
        dim_latent=(24, 12),
        channel_first_latent=channel_first,
        modality_default_shape=(8, 8),
        transformer=tiny_transformer(),
    )
    params = model.init_params(jax.random.PRNGKey(0))

    images = np.random.randn(2, 8, 8, 12).astype(np.float32)
    if channel_first:
        images = np.moveaxis(images, -1, 1)

    loss = model.forward_modality(
        params, images, rng=jax.random.PRNGKey(1), modality_type=1
    )
    assert np.isfinite(float(loss))

    sampled = model.generate_modality_only(
        params, modality_type=1, fixed_modality_shape=(8, 8),
        modality_steps=3, rng=jax.random.PRNGKey(2),
    )
    want = (1, 12, 8, 8) if channel_first else (1, 8, 8, 12)
    assert tuple(sampled.shape) == want


def test_text_image_end_to_end_with_encoder_decoder():
    enc = nn.Conv(24, (3, 3), padding="SAME")
    dec = nn.Conv(3, (3, 3), padding="SAME")

    model = Transfusion(
        num_text_tokens=4,
        dim_latent=24,
        modality_default_shape=(4, 4),
        modality_encoder=enc,
        modality_decoder=dec,
        transformer=tiny_transformer(),
        pad_multiple=16,
    )
    params = model.init_params(jax.random.PRNGKey(0))

    # ragged image sizes, channel-last raw inputs (flax convention)
    batch = [
        [randint(16, 4), np.random.randn(8, 8, 3).astype(np.float32),
         randint(8, 4), np.random.randn(7, 7, 3).astype(np.float32)],
        [randint(16, 4), np.random.randn(8, 5, 3).astype(np.float32),
         randint(5, 4), np.random.randn(2, 16, 3).astype(np.float32),
         randint(9, 4)],
    ]

    def times_fn(num_modalities):
        return np.ones((num_modalities.shape[0], int(num_modalities.max())))

    loss = model.loss(
        params, batch, jax.random.PRNGKey(1),
        num_modalities_to_times_fn=times_fn,
    )
    assert np.isfinite(float(loss))

    out = model.sample(
        params, rng=jax.random.PRNGKey(2), max_length=8, modality_steps=3,
    )
    assert len(out) >= 1


def test_velocity_consistency():
    model = make_two_modality_model()
    params = model.init_params(jax.random.PRNGKey(0))
    ema_params = jax.tree.map(lambda x: x, params)

    batch = [
        [randint(16), (0, np.random.randn(4, 24).astype(np.float32))],
        [randint(5), (1, np.random.randn(2, 12).astype(np.float32)), randint(3)],
    ]
    loss, breakdown = model.loss(
        params, batch, jax.random.PRNGKey(1),
        velocity_consistency_ema_params=ema_params,
        return_breakdown=True,
    )
    assert np.isfinite(float(loss))
    assert breakdown.velocity is not None and len(breakdown.velocity) == 2


def test_axial_pos_emb():
    model = Transfusion(
        num_text_tokens=16,
        dim_latent=(24, 12),
        modality_default_shape=((2, 2), (2,)),
        fallback_to_default_shape_if_invalid=True,
        add_pos_emb=True,
        modality_num_dim=(2, 1),
        transformer=tiny_transformer(depth=4),
        pad_multiple=16,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    batch = [
        [randint(16, 16), (0, np.random.randn(2, 3, 24).astype(np.float32)),
         randint(8, 16), (1, np.random.randn(6, 12).astype(np.float32))],
        [randint(5, 16), np.random.randn(1, 4, 24).astype(np.float32)],
    ]
    loss = model.loss(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    out = model.sample(
        params, rng=jax.random.PRNGKey(2), max_length=8, modality_steps=3,
    )
    assert len(out) >= 1


def test_modality_only_with_unet_downsample():
    class Down(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME")(x)

    class Up(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.ConvTranspose(4, (3, 3), strides=(2, 2), padding="SAME")(x)

    model = Transfusion(
        num_text_tokens=10,
        dim_latent=4,
        modality_default_shape=(14, 14),
        pre_post_transformer_enc_dec=(Down(), Up()),
        channel_first_latent=True,
        add_pos_emb=True,
        modality_num_dim=2,
        velocity_consistency_loss_weight=0.1,
        transformer=dict(dim=32, depth=1, dim_head=16, heads=2),
        pad_multiple=16,
    )
    params = model.init_params(jax.random.PRNGKey(0))

    x = np.random.randn(1, 4, 14, 14).astype(np.float32)
    loss = model.forward_modality(params, x, rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    sampled = model.generate_modality_only(
        params, modality_steps=3, rng=jax.random.PRNGKey(2)
    )
    assert tuple(sampled.shape) == (1, 4, 14, 14)

    # joint path: downsampled span length (7*7), latent-shape meta string
    packed = model.pack([[np.asarray([1, 2]), x[0]]])
    assert packed.spans[0, 0, 2] == 49
    loss = model.loss(params, [[np.asarray([1, 2]), x[0]]], jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))


def test_zero_dimensional_modality():
    model = Transfusion(
        num_text_tokens=32,
        dim_latent=24,
        modality_default_shape=(),
        transformer=tiny_transformer(),
        pad_multiple=16,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    batch = [
        [randint(16, 32), np.random.randn(24).astype(np.float32),
         randint(8, 32), np.random.randn(24).astype(np.float32)],
        [randint(5, 32), np.random.randn(24).astype(np.float32), randint(9, 32)],
    ]
    loss = model.loss(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    out = model.sample(
        params, prompt=np.random.randn(24).astype(np.float32),
        rng=jax.random.PRNGKey(2), max_length=8, modality_steps=3,
    )
    assert len(out) >= 1


def test_generate_text_only():
    model = Transfusion(
        num_text_tokens=32,
        dim_latent=24,
        modality_default_shape=(4,),
        transformer=tiny_transformer(),
    )
    params = model.init_params(jax.random.PRNGKey(0))
    prompt = randint((2, 4), hi=32)
    out = model.generate_text_only(
        params, prompt, seq_len=12, rng=jax.random.PRNGKey(1)
    )
    assert out.shape == (2, 8)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) < 32).all()


def test_bf16_compute_dtype():
    model = Transfusion(
        num_text_tokens=8,
        dim_latent=16,
        modality_default_shape=(4,),
        transformer=tiny_transformer(),
        pad_multiple=16,
        dtype=jnp.bfloat16,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    # params stay f32
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(params))
    batch = [[randint(6), np.random.randn(4, 16).astype(np.float32)]]
    l16 = model.loss(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(l16))

    model32 = Transfusion(
        num_text_tokens=8,
        dim_latent=16,
        modality_default_shape=(4,),
        transformer=tiny_transformer(),
        pad_multiple=16,
    )
    l32 = model32.loss(params, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(l16), float(l32), rtol=0.1)


def test_per_modality_encoder_list_with_none():
    """(module, None) with exactly two modalities means 'encoder for
    modality 0, none for modality 1' — not a (module, params) pair
    replicated to both (r2 review finding)."""
    import flax.linen as nn

    class Enc(nn.Module):
        @nn.compact
        def __call__(self, x):
            return x * 2.0

    model = Transfusion(
        num_text_tokens=8,
        dim_latent=(4, 8),
        modality_default_shape=((2,), (2,)),
        transformer=dict(dim=16, depth=1, dim_head=8, heads=2),
        pad_multiple=8,
        modality_encoder=(Enc(), None),
    )
    assert model.encoders[0] is not None
    assert model.encoders[1] is None


def test_custom_modality_shape_fn_reaches_parser():
    """A custom to_modality_shape_fn defines its own meta format — the
    default codec's digit/comma gate must not block it (r2 review)."""
    model = Transfusion(
        num_text_tokens=8,
        dim_latent=4,
        modality_default_shape=(9, 9),
        to_modality_shape_fn=lambda s: tuple(int(x) for x in s.split("x")),
        transformer=dict(dim=16, depth=1, dim_head=8, heads=2),
        pad_multiple=8,
    )
    meta = [model.meta_id] + [
        model.char_offset + ord(c) for c in "4x4"
    ] + [model.som_ids[0]]
    shape = model._parse_modality_shape(np.asarray(meta, np.int64), 0)
    assert shape == (4, 4), shape

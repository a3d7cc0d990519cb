"""Transformer stack tests: shapes, masking semantics, KV-cache parity.

SURVEY.md §7 build order step 2. The KV-cache tests assert the property the
reference relies on implicitly: cached decoding reproduces the uncached
causal forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transfusion_tpu.models import Transformer, make_kv_cache


def make_model(**kw):
    cfg = dict(dim=32, depth=2, dim_head=8, heads=4)
    cfg.update(kw)
    return Transformer(**cfg)


def init_and_run(model, x, rng=0, **kwargs):
    params = model.init(jax.random.PRNGKey(rng), x, **kwargs)
    out, cache = model.apply(params, x, **kwargs)
    return params, out, cache


def test_shapes_text_causal():
    model = make_model()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 32))
    params, out, cache = init_and_run(model, x, causal=True)
    assert out.shape == (2, 10, 32)
    assert cache is None
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("streams", [1, 4])
def test_residual_streams(streams):
    model = make_model(num_residual_streams=streams, depth=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 32))
    _, out, _ = init_and_run(model, x, causal=True)
    assert out.shape == (2, 6, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_modality_only_needs_no_mask():
    model = make_model()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 32))
    times = jnp.array([0.3, 0.8])
    _, out, _ = init_and_run(model, x, times=times, modality_only=True)
    assert out.shape == (2, 6, 32)


def test_causal_mask_blocks_future():
    """Perturbing a future token must not change earlier outputs (causal)."""
    model = make_model()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 32))
    params = model.init(jax.random.PRNGKey(1), x, causal=True)
    out1, _ = model.apply(params, x, causal=True)
    x2 = x.at[:, -1].add(10.0)
    out2, _ = model.apply(params, x2, causal=True)
    np.testing.assert_allclose(out1[:, :-1], out2[:, :-1], atol=1e-5)
    assert not np.allclose(out1[:, -1], out2[:, -1])


def test_span_mask_bidirectional_within_modality():
    """Inside a modality span, earlier tokens DO see later ones."""
    model = make_model()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 12, 32))
    spans = jnp.array([[[0, 4, 5]]])  # modality covers positions 4..8
    times = jnp.zeros((1, 12))
    kw = dict(spans=spans, times=times)
    params = model.init(jax.random.PRNGKey(1), x, **kw)
    out1, _ = model.apply(params, x, **kw)
    # perturb last modality token (pos 8): pos 4 output must change
    x2 = x.at[:, 8].add(10.0)
    out2, _ = model.apply(params, x2, **kw)
    assert not np.allclose(out1[:, 4], out2[:, 4])
    # but text token at pos 2 (before the span) must be unaffected
    np.testing.assert_allclose(out1[:, :3], out2[:, :3], atol=1e-5)


def test_kv_cache_matches_uncached_causal():
    """Prefill + step-by-step decode == full causal forward."""
    model = make_model(depth=3)
    b, n, dim = 2, 9, 32
    x = jax.random.normal(jax.random.PRNGKey(0), (b, n, dim))
    pos = jnp.arange(n)
    params = model.init(jax.random.PRNGKey(1), x, causal=True, rotary_pos=pos)

    full, _ = model.apply(params, x, causal=True, rotary_pos=pos)

    # prefill the first 5 tokens, then decode 4 one at a time
    cache = make_kv_cache(depth=3, batch=b, heads=4, max_len=16, dim_head=8)
    out_prefill, cache = model.apply(
        params, x[:, :5], causal=True, rotary_pos=pos[:5], cache=cache
    )
    np.testing.assert_allclose(out_prefill, full[:, :5], atol=1e-4)

    outs = []
    for i in range(5, n):
        out_i, cache = model.apply(
            params, x[:, i : i + 1], rotary_pos=pos[i : i + 1], cache=cache
        )
        outs.append(out_i)
    decoded = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(decoded, full[:, 5:], atol=1e-4)


def test_laser_and_gates_options():
    model = make_model(attn_laser=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 32))
    _, out, _ = init_and_run(model, x, causal=True)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_skips_odd_depth():
    model = make_model(depth=5)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 32))
    _, out, _ = init_and_run(model, x, causal=True)
    assert out.shape == (1, 4, 32)


def test_time_conditioning_changes_modality_tokens_only():
    """FiLM layers are zero-init (adaLN-zero), so perturb them first; then
    changing times must affect modality tokens but not text tokens."""
    model = make_model()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 32))
    spans = jnp.array([[[0, 2, 3]]])
    kw1 = dict(spans=spans, times=jnp.full((1, 8), 0.2))
    kw2 = dict(spans=spans, times=jnp.full((1, 8), 0.9))
    params = model.init(jax.random.PRNGKey(1), x, **kw1)

    params = jax.tree_util.tree_map_with_path(
        lambda path, p: (
            p + 0.05
            if any("to_film" in str(k) for k in path) and p.ndim == 2
            else p
        ),
        params,
    )

    out1, _ = model.apply(params, x, **kw1)
    out2, _ = model.apply(params, x, **kw2)
    # modality tokens (2..4) are FiLM-conditioned on time -> change
    assert not np.allclose(out1[:, 2:5], out2[:, 2:5])
    # text token before the span sees identical input and conditioning...
    np.testing.assert_allclose(out1[:, :2], out2[:, :2], atol=1e-5)


def test_remat_matches_no_remat():
    """Per-block gradient checkpointing must not change values or grads."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32))
    kw = dict(causal=True, times=jnp.full((2, 8), 0.3),
              spans=jnp.array([[[0, 2, 3]], [[0, 1, 2]]]))
    a = make_model(depth=4)
    b = make_model(depth=4, remat=True)
    params = a.init(jax.random.PRNGKey(1), x, **kw)

    out_a, _ = a.apply(params, x, **kw)
    out_b, _ = b.apply(params, x, **kw)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)

    ga = jax.grad(lambda p: a.apply(p, x, **kw)[0].sum())(params)
    gb = jax.grad(lambda p: b.apply(p, x, **kw)[0].sum())(params)
    for la, lb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-5)


def test_remat_dots_policy_matches():
    """Selective remat (save matmul outputs) must not change values/grads."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32))
    kw = dict(causal=True, times=jnp.full((2, 8), 0.3),
              spans=jnp.array([[[0, 2, 3]], [[0, 1, 2]]]))
    a = make_model(depth=4)
    b = make_model(depth=4, remat=True, remat_policy="dots")
    params = a.init(jax.random.PRNGKey(1), x, **kw)

    out_a, _ = a.apply(params, x, **kw)
    out_b, _ = b.apply(params, x, **kw)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)

    ga = jax.grad(lambda p: a.apply(p, x, **kw)[0].sum())(params)
    gb = jax.grad(lambda p: b.apply(p, x, **kw)[0].sum())(params)
    for la, lb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-5)


def test_per_instance_conditioning_matches_per_token():
    """times_inst (per-instance adaLN) must equal the per-token path exactly."""
    from transfusion_tpu.ops.spans import spans_to_token_times

    model = make_model(depth=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32))
    spans = jnp.array([[[0, 2, 4], [1, 9, 3]], [[0, 5, 6], [0, 0, 0]]])
    times_inst = jnp.array([[0.3, 0.8], [0.6, 0.0]])
    times_tok = spans_to_token_times(16, spans, times_inst)

    kw_tok = dict(spans=spans, times=times_tok)
    kw_inst = dict(spans=spans, times_inst=times_inst)
    params = model.init(jax.random.PRNGKey(1), x, **kw_inst)

    # jitter the zero-init film/ada weights so conditioning is active
    params = jax.tree_util.tree_map_with_path(
        lambda path, p: p + 0.03
        if any(s in str(k) for k in path for s in ("to_film", "to_ada_ln_zero"))
        and p.ndim == 2 else p,
        params,
    )

    out_tok, _ = model.apply(params, x, **kw_tok)
    out_inst, _ = model.apply(params, x, **kw_inst)
    np.testing.assert_allclose(
        np.asarray(out_tok), np.asarray(out_inst), atol=1e-5
    )


def test_fused_projections_parity():
    """fuse_projections=True must keep the exact param tree (same names,
    same init values) and reproduce the unfused outputs to rounding —
    including the learned value-residual mix and gate projections."""
    from transfusion_tpu.models.layers import Attention
    from transfusion_tpu.ops.rope import rope_angles

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16, 32)), jnp.float32
    )
    seq = jnp.arange(16)
    kw = dict(
        rope=rope_angles(seq, 16),
        mask=(seq[:, None] >= seq[None, :])[None, None],
    )
    vr = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 2, 16, 16)), jnp.float32
    )

    for learned_mix in (False, True):
        a_f = Attention(dim=32, dim_head=16, heads=2, fuse_projections=True,
                        learned_value_residual_mix=learned_mix)
        a_u = Attention(dim=32, dim_head=16, heads=2, fuse_projections=False,
                        learned_value_residual_mix=learned_mix)
        p_f = a_f.init(jax.random.PRNGKey(0), x, value_residual=vr, **kw)
        p_u = a_u.init(jax.random.PRNGKey(0), x, value_residual=vr, **kw)
        assert jax.tree_util.tree_structure(p_f) == jax.tree_util.tree_structure(p_u)
        for (k1, l1), (_, l2) in zip(
            jax.tree_util.tree_leaves_with_path(p_f),
            jax.tree_util.tree_leaves_with_path(p_u),
        ):
            np.testing.assert_array_equal(
                np.asarray(l1), np.asarray(l2), err_msg=str(k1)
            )
        out_f = a_f.apply(p_f, x, value_residual=vr, **kw)[0]
        out_u = a_u.apply(p_f, x, value_residual=vr, **kw)[0]
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_u), atol=2e-6,
            err_msg=f"learned_mix={learned_mix}",
        )

"""Unit tests of the numeric core against closed-form expectations.

SURVEY.md §7 build order step 1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transfusion_tpu.ops import (
    apply_rope,
    gumbel_sample,
    min_p_filter,
    model_output_to_flow,
    noise_data,
    odeint,
    rope_angles,
    softclamp,
    sort_spans_by_offset,
    spans_to_attn_mask,
    spans_to_is_any_modality,
    spans_to_modality_mask,
    spans_to_rotary_positions,
    spans_to_token_times,
)
from transfusion_tpu.ops.norms import l2norm, rms_norm
from transfusion_tpu.utils import (
    char_tokenize,
    decode_chars,
    concat_contiguous_text,
    tokens_since_rightmost_id,
)


def test_l2norm_and_rmsnorm():
    x = jnp.array([[3.0, 4.0]])
    np.testing.assert_allclose(l2norm(x), [[0.6, 0.8]], atol=1e-6)
    out = rms_norm(x, jnp.zeros(2), 2**0.5)
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), [2**0.5 * 1.0], atol=1e-5
    )


def test_softclamp():
    np.testing.assert_allclose(softclamp(jnp.array(0.0), 50.0), 0.0, atol=1e-7)
    assert float(softclamp(jnp.array(1e6), 50.0)) <= 50.0
    np.testing.assert_allclose(
        softclamp(jnp.array(1.0), 50.0), np.tanh(1 / 50) * 50, atol=1e-5, rtol=1e-5
    )


def test_noise_and_flow_roundtrip():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 5, 3))
    noise = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 3))
    times = jnp.array([0.25, 0.75])
    noised, flow = noise_data(x, noise, times)
    np.testing.assert_allclose(
        noised, x * times[:, None, None] + noise * (1 - times[:, None, None]),
        atol=1e-6,
    )
    np.testing.assert_allclose(flow, x - noise, atol=1e-6)

    # a perfect clean prediction converts back to the true flow
    pred_flow = model_output_to_flow(x, noised, times, eps=1e-2)
    np.testing.assert_allclose(pred_flow, flow, atol=1e-4)


def test_min_p_filter():
    logits = jnp.log(jnp.array([[0.5, 0.3, 0.15, 0.05]]))
    out = min_p_filter(logits, min_p=0.5)  # limit = 0.25
    assert np.isfinite(np.asarray(out[0, :2])).all()
    assert np.isneginf(np.asarray(out[0, 2:])).all()


def test_gumbel_sample_greedy():
    logits = jnp.array([[0.1, 5.0, 0.2]])
    assert int(gumbel_sample(jax.random.PRNGKey(0), logits, temperature=0.0)[0]) == 1
    # temperature > 0 still overwhelmingly picks the 5.0 logit
    samples = [
        int(gumbel_sample(jax.random.PRNGKey(i), logits, temperature=0.5)[0])
        for i in range(20)
    ]
    assert samples.count(1) >= 18


def test_odeint_exponential():
    # dy/dt = y  ->  y(1) = e
    fn = lambda t, y: y
    times = jnp.linspace(0.0, 1.0, 65)
    for method, tol in [("euler", 3e-2), ("midpoint", 1e-4), ("heun", 1e-4), ("rk4", 1e-6)]:
        y = odeint(fn, jnp.array(1.0), times, method=method)
        np.testing.assert_allclose(float(y), np.e, rtol=tol)


def test_odeint_trajectory_shape():
    fn = lambda t, y: -y
    times = jnp.linspace(0.0, 1.0, 8)
    y, traj = odeint(fn, jnp.ones((3,)), times, return_trajectory=True)
    assert traj.shape == (8, 3)
    np.testing.assert_allclose(traj[-1], y)


# ---------------------------------------------------------------------------
# span ops — semantics fixed by reference transfusion.py:343-513
# ---------------------------------------------------------------------------


def _naive_mask_numpy(n, spans):
    b, m, _ = spans.shape
    out = np.zeros((b, n, n), bool)
    for bi in range(b):
        for i in range(n):
            for j in range(n):
                ok = i >= j
                for t, off, ln in spans[bi]:
                    ok = ok or (i >= off and j < off + ln)
                out[bi, i, j] = ok
    return out


def test_spans_to_attn_mask_matches_bruteforce():
    spans = jnp.array(
        [
            [[0, 3, 4], [1, 9, 2]],
            [[0, 1, 5], [0, 0, 0]],  # second row is padding
        ]
    )
    got = np.asarray(spans_to_attn_mask(12, spans))
    want = _naive_mask_numpy(12, np.asarray(spans))
    np.testing.assert_array_equal(got, want)


def test_rotary_positions_reference_example():
    # reference transfusion.py:402-404 docstring example
    spans = jnp.array([[[0, 3, 4]]])
    pos = np.asarray(spans_to_rotary_positions(10, spans))[0]
    np.testing.assert_array_equal(pos, [0, 1, 2, 3, 3, 3, 3, 4, 5, 6])


def test_spans_instance_and_type_masks():
    spans = jnp.array([[[1, 2, 3], [0, 7, 2]]])
    mask = np.asarray(spans_to_modality_mask(10, spans, num_modalities=2))
    assert mask.shape == (1, 2, 2, 10)
    # type 1 covers positions 2..4 (instance 0)
    np.testing.assert_array_equal(np.nonzero(mask[0, 1, 0])[0], [2, 3, 4])
    # type 0 covers positions 7..8 (instance 1)
    np.testing.assert_array_equal(np.nonzero(mask[0, 0, 1])[0], [7, 8])
    any_mod = np.asarray(spans_to_is_any_modality(10, spans))[0]
    np.testing.assert_array_equal(np.nonzero(any_mod)[0], [2, 3, 4, 7, 8])


def test_spans_token_times():
    spans = jnp.array([[[0, 1, 2], [1, 5, 3]]])
    times = jnp.array([[0.25, 0.75]])
    got = np.asarray(spans_to_token_times(9, spans, times))[0]
    want = np.array([0, 0.25, 0.25, 0, 0, 0.75, 0.75, 0.75, 0])
    np.testing.assert_allclose(got, want)


def test_sort_spans():
    spans = jnp.array([[[1, 9, 2], [0, 0, 0], [0, 3, 4]]])
    sorted_spans, order = sort_spans_by_offset(spans)
    np.testing.assert_array_equal(
        np.asarray(sorted_spans)[0], [[0, 3, 4], [1, 9, 2], [0, 0, 0]]
    )


def test_rope_properties():
    # norm preservation + relative-position property of dot products
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 4, 16))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 4, 16))

    pos = jnp.arange(4)
    ang = rope_angles(pos, 16)
    q_r, k_r = apply_rope(ang, q), apply_rope(ang, k)
    np.testing.assert_allclose(
        np.linalg.norm(q_r, axis=-1), np.linalg.norm(q, axis=-1), atol=1e-4
    )

    # shifting both positions by a constant leaves q.k dot products unchanged
    ang_shift = rope_angles(pos + 7, 16)
    q_s, k_s = apply_rope(ang_shift, q), apply_rope(ang_shift, k)
    dots = np.einsum("bhid,bhjd->bhij", np.asarray(q_r), np.asarray(k_r))
    dots_s = np.einsum("bhid,bhjd->bhij", np.asarray(q_s), np.asarray(k_s))
    np.testing.assert_allclose(dots, dots_s, atol=1e-3)

    # longer angle buffers align to the tail (decode semantics)
    ang_long = rope_angles(jnp.arange(10), 16)
    tail = apply_rope(ang_long, q)
    ang_tail = rope_angles(jnp.arange(6, 10), 16)
    np.testing.assert_allclose(tail, apply_rope(ang_tail, q), atol=1e-5)


# ---------------------------------------------------------------------------
# host helpers
# ---------------------------------------------------------------------------


def test_char_tokenizer_roundtrip():
    toks = char_tokenize("14,14", offset=100)
    assert decode_chars(toks, offset=100) == "14,14"


def test_tokens_since_rightmost_id():
    t = np.array([9, 2, 8, 4, 7])
    np.testing.assert_array_equal(tokens_since_rightmost_id(t, 2), [8, 4, 7])
    assert tokens_since_rightmost_id(t, 99).size == 0
    assert tokens_since_rightmost_id(np.array([1, 2, 3]), 3).size == 0


def test_concat_contiguous_text():
    sample = [
        np.array([1, 2], dtype=np.int32),
        np.array([3], dtype=np.int32),
        (0, np.zeros((2, 4), np.float32)),
        np.array([4], dtype=np.int32),
    ]
    out = concat_contiguous_text(sample)
    assert len(out) == 3
    np.testing.assert_array_equal(out[0], [1, 2, 3])


def test_hyper_connection_stream1_is_plain_residual():
    import flax.linen as nn

    from transfusion_tpu.ops.hyper_connections import (
        HyperConnection,
        expand_stream,
        reduce_stream,
    )

    hc = HyperConnection(dim=8, streams=1, fracs=4, layer_index=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 8))
    s = expand_stream(x, 1)
    params = hc.init(jax.random.PRNGKey(1), s)
    branch, mixed = hc.apply(params, s)
    np.testing.assert_array_equal(np.asarray(branch), np.asarray(x))
    out = jnp.ones_like(x) * 0.5
    s2 = hc.apply(params, mixed, out)
    np.testing.assert_allclose(np.asarray(reduce_stream(s2)), np.asarray(x + 0.5))
    assert params == {}  # no params in the degenerate case


def test_hyper_connection_multi_stream_near_identity_at_init():
    from transfusion_tpu.ops.hyper_connections import (
        HyperConnection,
        expand_stream,
        reduce_stream,
    )

    hc = HyperConnection(dim=8, streams=4, fracs=2, layer_index=0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 8))
    s = expand_stream(x, 4)
    params = hc.init(jax.random.PRNGKey(1), s)
    branch, mixed = hc.apply(params, s)
    # init favors the anchored stream: branch ~ x (all streams identical here)
    np.testing.assert_allclose(np.asarray(branch), np.asarray(x), atol=1e-5)
    out = jnp.full_like(x, 2.0)
    s2 = hc.apply(params, mixed, out)
    red = reduce_stream(s2)
    # write is distributed to one stream; mean over 4 streams adds 1/4 * out
    np.testing.assert_allclose(np.asarray(red), np.asarray(x + 0.5), atol=1e-4)


def test_axial_coords():
    from transfusion_tpu.ops.axial import ContinuousAxialPositionalEmbedding as A

    c = A.coords_for_shape((2, 3), 2)
    assert c.shape == (6, 2)
    np.testing.assert_array_equal(np.asarray(c[0]), [0, 0])
    np.testing.assert_array_equal(np.asarray(c[-1]), [1, 2])
    # zero-dim and padded
    assert A.coords_for_shape((), 2).shape == (1, 2)
    assert A.coords_for_shape((4,), 3).shape == (4, 3)


# ---------------------------------------------------------------------------
# adaptive ODE integration (capability row of ref torchdiffeq atol/rtol 1e-5)
# ---------------------------------------------------------------------------


def test_odeint_adaptive_matches_fixed_grid():
    from transfusion_tpu.ops.odeint import odeint

    fn = lambda t, y: -y + jnp.sin(3.0 * t)
    y0 = jnp.ones((4,))
    grid = jnp.linspace(0.0, 1.0, 64)

    fixed = odeint(fn, y0, grid, method="midpoint")
    adaptive = odeint(fn, y0, grid, method="adaptive", atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(adaptive), np.asarray(fixed), atol=1e-4
    )
    # exact solution check for dy/dt = -y: y(1) = e^-1
    dec = odeint(
        lambda t, y: -y, jnp.ones(()), jnp.linspace(0, 1, 2),
        method="adaptive", atol=1e-7, rtol=1e-7,
    )
    np.testing.assert_allclose(float(dec), np.exp(-1.0), atol=1e-5)


def test_odeint_adaptive_under_jit_and_pytree():
    import jax
    from transfusion_tpu.ops.odeint import odeint

    fn = lambda t, y: jax.tree.map(lambda x: -0.5 * x, y)
    y0 = {"a": jnp.ones((2, 3)), "b": jnp.full((5,), 2.0)}
    out = jax.jit(
        lambda y: odeint(fn, y, jnp.linspace(0, 1, 2), method="adaptive")
    )(y0)
    np.testing.assert_allclose(
        np.asarray(out["a"]), np.exp(-0.5) * np.ones((2, 3)), atol=1e-4
    )


def test_generate_modality_only_adaptive():
    import jax
    from transfusion_tpu.models.transfusion import Transfusion

    model = Transfusion(
        num_text_tokens=16, dim_latent=4, modality_default_shape=(2, 2),
        transformer=dict(dim=16, depth=1, dim_head=8, heads=2),
        pad_multiple=16, odeint_method="adaptive",
    )
    params = model.init_params(jax.random.PRNGKey(0))
    out = model.generate_modality_only(
        params, rng=jax.random.PRNGKey(1), modality_type=0, modality_steps=8
    )
    assert np.asarray(out).shape == (1, 2, 2, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_odeint_adaptive_reaches_endpoint_on_step_exhaustion():
    """max_steps exhaustion must not silently return a partial
    integration: the closing Euler step carries the state to t1
    (r2 review finding)."""
    from transfusion_tpu.ops.odeint import odeint_adaptive

    fn = lambda t, y: jnp.ones_like(y)  # dy/dt = 1 -> y(1) = y0 + 1
    y = odeint_adaptive(fn, jnp.zeros((4,)), 0.0, 1.0, max_steps=1)
    np.testing.assert_allclose(np.asarray(y), np.ones(4), atol=1e-5)


def test_odeint_adaptive_rows_placement_invariant():
    """Per-row adaptive control (serving contract): a row integrated
    alongside a STIFFER co-tenant must produce bit-identical results to the
    same row integrated alone — the controller's accept/step decisions are
    per-row, never coupled across the batch (ops/odeint.py
    odeint_adaptive_rows)."""
    from transfusion_tpu.ops.odeint import (
        odeint_adaptive,
        odeint_adaptive_rows,
    )

    rates = jnp.array([1.0, 25.0])  # row 1 is much stiffer

    def fn(t, y):  # t: [b]; rows decay at different rates
        return -rates[: y.shape[0], None] * y

    y0 = jnp.ones((2, 3))
    joint = odeint_adaptive_rows(fn, y0, 0.0, 1.0)

    # each row alone (b=1): same controller decisions -> identical values
    for r in range(2):
        def fn_r(t, y, r=r):
            return -rates[r] * y

        alone = odeint_adaptive_rows(fn_r, y0[r : r + 1], 0.0, 1.0)
        np.testing.assert_array_equal(np.asarray(joint[r]), np.asarray(alone)[0])

    # b=1 coincides with the scalar-controller integrator
    solo = odeint_adaptive(
        lambda t, y: -rates[0] * y, y0[0], 0.0, 1.0
    )
    np.testing.assert_allclose(
        np.asarray(joint[0]), np.asarray(solo), atol=1e-6
    )
    # and it integrates correctly (exp decay)
    np.testing.assert_allclose(
        np.asarray(joint[0]), np.exp(-1.0) * np.ones(3), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(joint[1]), np.exp(-25.0) * np.ones(3), atol=1e-3
    )

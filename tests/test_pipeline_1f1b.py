"""1F1B pipeline schedule: loss/grad parity vs the unpipelined stack.

The engine computes gradients in-schedule (parallel/pipeline_1f1b.py);
these tests check them against jax.grad through the equivalent
single-device computation (canonical stacked block scan + the same
per-microbatch head), for a trivial head and with conditioning.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transfusion_tpu.models.transformer import Transformer
from transfusion_tpu.parallel.mesh import make_mesh
from transfusion_tpu.parallel.pipeline import (
    _canonical_block,
    stack_block_params,
)
from transfusion_tpu.parallel.pipeline_1f1b import (
    make_1f1b_loss,
    pipeline_1f1b_grads,
)

DIM, HEADS, DH, DEPTH = 32, 2, 16, 4
B, N = 8, 16


def tiny_transformer():
    return Transformer(
        dim=DIM,
        depth=DEPTH,
        dim_head=DH,
        heads=HEADS,
        unet_skips=False,
        num_residual_streams=1,
        dropout=0.0,
        attn_impl="dense",
        dtype=jnp.float32,
    )


def init_stacked(t, key):
    x = jnp.zeros((B, N, DIM))
    params = t.init(
        key, x, times=jnp.zeros((B,)), is_any_modality=False
    )["params"]
    return stack_block_params(params, DEPTH), params


def reference_forward(t, stacked, x, cond, mask, M):
    """Unpipelined canonical-block scan, microbatch semantics identical to
    the schedule (valid flag starts False per microbatch)."""
    block = _canonical_block(t)
    mb = B // M

    def run_mb(x_mb, cond_mb, mask_mb):
        def layer(carry, lp):
            xc, vr, vl = carry
            out = block.apply(
                {"params": lp}, xc[None], None, cond_mb, None, mask_mb,
                None, jnp.zeros((mb, N), bool), vr, None, None, vl > 0.5,
            )
            s, values, _ = out
            vr = jnp.where(vl > 0.5, vr, values)
            return (s[0], vr, vl * 0 + 1.0), None

        vres0 = jnp.zeros((mb, HEADS, N, DH), x_mb.dtype)
        (out, _, _), _ = jax.lax.scan(
            layer, (x_mb, vres0, jnp.zeros(())), stacked
        )
        return out

    outs = []
    for f in range(M):
        sl = slice(f * mb, (f + 1) * mb)
        outs.append(
            run_mb(
                x[sl],
                None if cond is None else cond[sl],
                None if mask is None else mask[sl],
            )
        )
    return jnp.stack(outs)  # [M, mb, N, DIM]


def simple_head(target):
    """head contribution = sum((out - target_mb)^2) / B; aux = per-mb sse.

    `out_mb` may hold only the LOCAL rows of microbatch f (data-sharded
    1F1B); `row0` is the global batch row of its first row."""

    def head_fn(head_params, head_data, out_mb, f, row0):
        mb_l = out_mb.shape[0]
        tgt = jax.lax.dynamic_slice_in_dim(head_data["target"], row0, mb_l)
        w = head_params["w"]
        diff = out_mb * w - tgt
        sse = jnp.sum(diff.astype(jnp.float32) ** 2)
        return sse / B, {"sse": sse}

    return head_fn


@pytest.mark.parametrize(
    "use_cond,dp",
    [
        pytest.param(False, 1, marks=pytest.mark.slow),
        pytest.param(True, 1, marks=pytest.mark.slow),
        pytest.param(False, 2, marks=pytest.mark.slow),
        pytest.param(True, 2, marks=pytest.mark.slow),
    ],
)
def test_1f1b_matches_unpipelined(use_cond, dp):
    t = tiny_transformer()
    key = jax.random.PRNGKey(0)
    stacked, _ = init_stacked(t, key)
    mesh = make_mesh(data=dp, pipe=4) if dp > 1 else make_mesh(pipe=4)
    M = 8 if dp == 1 else 4  # dp=2: mb=2 global rows, 1 local row/device
    mb = B // M

    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, DIM))
    target = jax.random.normal(jax.random.PRNGKey(2), (B, N, DIM))
    cond = (
        jax.random.normal(jax.random.PRNGKey(3), (B, 1, 4 * DIM)) * 0.1
        if use_cond
        else None
    )
    seq = jnp.arange(N)
    mask = jnp.broadcast_to(
        (seq[:, None] >= seq[None, :])[None, None], (B, 1, N, N)
    )
    head_params = {"w": jnp.ones((DIM,)) * 1.1}
    head_data = {"target": target}
    head_fn = simple_head(target)

    loss, aux, dstacked, dx, dcond, dhead = pipeline_1f1b_grads(
        stacked, t, mesh, M, x, head_fn, head_params, head_data,
        cond=cond, mask=mask,
        is_any_modality=jnp.zeros((B, N), bool), remat=True,
    )

    # reference: unpipelined forward + the same head, jax.grad
    def ref_loss(stacked, x, cond, head_params):
        outs = reference_forward(t, stacked, x, cond, mask, M)
        total = jnp.zeros(())
        for f in range(M):
            c, _ = head_fn(
                head_params, head_data, outs[f], jnp.int32(f),
                jnp.int32(f * mb),
            )
            total = total + c
        return total

    ref = jax.value_and_grad(ref_loss, argnums=(0, 1, 2, 3) if use_cond else (0, 1, 3))
    if use_cond:
        ref_l, (ref_dst, ref_dx, ref_dc, ref_dh) = ref(
            stacked, x, cond, head_params
        )
    else:
        ref_l, (ref_dst, ref_dx, ref_dh) = ref(stacked, x, cond, head_params)
        ref_dc = None

    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
    np.testing.assert_allclose(
        float(jax.tree.leaves(aux)[0]), float(ref_l) * B, rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(dstacked), jax.tree.leaves(ref_dst)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
    np.testing.assert_allclose(
        np.asarray(dx), np.asarray(ref_dx), rtol=2e-4, atol=2e-5
    )
    if use_cond:
        np.testing.assert_allclose(
            np.asarray(dcond), np.asarray(ref_dc), rtol=2e-4, atol=2e-5
        )
    np.testing.assert_allclose(
        np.asarray(dhead["w"]), np.asarray(ref_dh["w"]), rtol=2e-4, atol=2e-5
    )


@pytest.mark.slow  # >30s on the 1-core CI host (VERDICT r4 #3 tiering)
def test_1f1b_custom_vjp_composes():
    """The make_1f1b_loss wrapper chains with outer autodiff: grads wrt a
    pre-trunk embedding parameter flow through dx."""
    t = tiny_transformer()
    stacked, _ = init_stacked(t, jax.random.PRNGKey(0))
    mesh = make_mesh(pipe=4)
    M = 4

    target = jax.random.normal(jax.random.PRNGKey(2), (B, N, DIM))
    head_fn = simple_head(target)
    f = make_1f1b_loss(
        head_fn, t, mesh,
        dict(microbatches=M, flash_causal=False, remat=True,
             remat_policy="full"),
    )

    base = jax.random.normal(jax.random.PRNGKey(4), (B, N, DIM))
    head_params = {"w": jnp.ones((DIM,))}
    head_data = {"target": target}

    def outer(emb_scale, stacked, head_params):
        x = base * emb_scale  # stand-in for an embedding layer
        loss, _aux = f(stacked, x, None, head_params, head_data, {})
        return loss

    val, grads = jax.value_and_grad(outer, argnums=(0, 1, 2))(
        jnp.float32(1.0), stacked, head_params
    )

    def ref(emb_scale, stacked, head_params):
        x = base * emb_scale
        outs = reference_forward(t, stacked, x, None, None, M)
        total = jnp.zeros(())
        for i in range(M):
            c, _ = head_fn(
                head_params, head_data, outs[i], jnp.int32(i),
                jnp.int32(i * (B // M)),
            )
            total = total + c
        return total

    rval, rgrads = jax.value_and_grad(ref, argnums=(0, 1, 2))(
        jnp.float32(1.0), stacked, head_params
    )
    np.testing.assert_allclose(float(val), float(rval), rtol=1e-5)
    np.testing.assert_allclose(
        float(grads[0]), float(rgrads[0]), rtol=2e-4
    )
    for a, b in zip(jax.tree.leaves(grads[1]), jax.tree.leaves(rgrads[1])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
    np.testing.assert_allclose(
        np.asarray(grads[2]["w"]), np.asarray(rgrads[2]["w"]),
        rtol=2e-4, atol=2e-5,
    )

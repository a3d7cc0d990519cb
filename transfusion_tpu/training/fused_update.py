"""Fused clip+Adam+EMA parameter update: one tree traversal, minimal HBM.

The flagship train step spends ~3.5 ms/step (16%) in the optimizer tail
(scan-fused ablation, scripts/probe_fixed_r4.py): optax.chain walks the
grad/param trees several times (clip global-norm, clip scale, adam moments,
adam update, apply_updates, metrics' second global_norm, EMA copy/blend),
each pass re-reading ~185 MB trees from HBM. This module performs the exact
same math in two passes:

  pass 1: global grad norm (unavoidable — clipping needs it before any
          update; the norm is also returned so metrics don't recompute it)
  pass 2: ONE `jax.tree.map` over (g, p, mu, nu, ema) emitting
          (p', mu', nu', ema') — XLA fuses the whole per-leaf chain into a
          single kernel reading each operand once

Numerics are bit-identical to
  optax.chain(optax.clip_by_global_norm(c), optax.adam(lr))  (+ ema_update)
— every optax op order is mirrored exactly (clip's select/(t/norm)*c form,
integer-exponent bias correction, add-then-cast apply_updates); the EMA
copy/keep branches become 0*e+1*p / 1*e+0*p blends, which only collapse
-0.0 to +0.0 (== equal). The claim holds under jit (how the train step
always runs): eager execution can differ by 1 ulp in `1 - decay**count`
because optax's bias_correction is itself jitted. Asserted by
tests/test_fused_update.py with array_equal over jitted multi-step
trajectories that cross the EMA warmup and cycle boundaries, clipping on
some steps and not others, plus end-to-end through Trainer.train_step. The reference runs the same
Adam(+ema-pytorch) recipe via its example scripts (reference
train_mnist.py:107-135); fusing it is a TPU-side optimization only.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from transfusion_tpu.training.ema import EmaState


class FusedAux(NamedTuple):
    grad_norm: Any  # f32 scalar — the pre-clip global norm (for metrics)


def find_adam_state(opt_state):
    """Locate the single ScaleByAdamState inside an optax chain state."""
    found = []

    def walk(node):
        if isinstance(node, optax.ScaleByAdamState):
            found.append(node)
            return
        if isinstance(node, tuple):
            for child in node:
                walk(child)

    walk(opt_state)
    if len(found) != 1:
        raise ValueError(
            f"fused update needs exactly one ScaleByAdamState in the "
            f"optimizer state (found {len(found)}) — pass "
            f"fused_update=False for custom optimizers"
        )
    return found[0]


def replace_adam_state(opt_state, new_adam):
    """Rebuild the optax chain state with the adam state swapped."""

    def walk(node):
        if isinstance(node, optax.ScaleByAdamState):
            return new_adam
        if isinstance(node, tuple) and not isinstance(node, optax.ScaleByAdamState):
            rebuilt = tuple(walk(child) for child in node)
            return type(node)(*rebuilt) if hasattr(node, "_fields") else rebuilt
        return node

    return walk(opt_state)


def fused_clip_adam_ema(
    grads,
    params,
    opt_state,
    ema: EmaState,
    *,
    learning_rate: float,
    grad_clip_norm: float | None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    ema_beta: float = 0.99,
    ema_update_every: int = 10,
    ema_update_after_step: int = 100,
):
    """Returns (new_params, new_opt_state, new_ema, FusedAux).

    Exactly optax.clip_by_global_norm -> optax.adam -> apply_updates ->
    ema_update, in one fused traversal.
    """
    adam = find_adam_state(opt_state)
    count = adam.count

    g_norm = optax.global_norm(grads)
    if grad_clip_norm is not None:
        # mirror optax.clip_by_global_norm's exact op order so results are
        # bit-identical: select(norm < c, t, (t / norm) * c) per leaf — NOT
        # the algebraically-equal t * (c / norm), which rounds differently
        trigger = g_norm < grad_clip_norm

        def clip_leaf(t):
            return jnp.where(
                trigger, t, (t / g_norm.astype(t.dtype)) * grad_clip_norm
            )

    else:

        def clip_leaf(t):
            return t

    count_new = optax.safe_increment(count)
    # bias correction exactly as optax.tree.bias_correction: integer-exponent
    # power (decay ** int_count), division by the f32 scalar
    c1 = 1 - b1**count_new
    c2 = 1 - b2**count_new

    # EMA schedule scalars (exactly training/ema.py:ema_update): copy until
    # warmup ends, then blend every `update_every` steps, else keep
    step_new = ema.step + 1
    past_warmup = step_new > ema_update_after_step
    on_cycle = (step_new % ema_update_every) == 0
    a = jnp.where(
        past_warmup,
        jnp.where(on_cycle, jnp.float32(ema_beta), jnp.float32(1.0)),
        jnp.float32(0.0),
    )
    b = jnp.where(
        past_warmup,
        jnp.where(on_cycle, jnp.float32(1.0 - ema_beta), jnp.float32(0.0)),
        jnp.float32(1.0),
    )

    def leaf(g, p, mu, nu, e):
        gc = clip_leaf(g)
        mu_n = (1 - b1) * gc + b1 * mu
        nu_n = (1 - b2) * jnp.square(gc) + b2 * nu
        mu_hat = mu_n / c1.astype(mu_n.dtype)
        nu_hat = nu_n / c2.astype(nu_n.dtype)
        upd = (-learning_rate) * (mu_hat / (jnp.sqrt(nu_hat) + eps))
        p_n = jnp.asarray(p + upd).astype(p.dtype)
        e_n = (a * e + b * p_n).astype(e.dtype)
        return p_n, mu_n, nu_n, e_n

    out = jax.tree.map(leaf, grads, params, adam.mu, adam.nu, ema.params)
    new_params = jax.tree.map(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
    new_mu = jax.tree.map(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
    new_nu = jax.tree.map(lambda o: o[2], out, is_leaf=lambda x: isinstance(x, tuple))
    new_ema_p = jax.tree.map(lambda o: o[3], out, is_leaf=lambda x: isinstance(x, tuple))

    new_opt = replace_adam_state(
        opt_state, optax.ScaleByAdamState(count=count_new, mu=new_mu, nu=new_nu)
    )
    new_ema = EmaState(params=new_ema_p, step=step_new)
    return new_params, new_opt, new_ema, FusedAux(grad_norm=g_norm)

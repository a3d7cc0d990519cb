"""Optimizers: Adam-atan2 and Muon (Newton–Schulz orthogonalized momentum).

The reference's example scripts use `MuonAdamAtan2` from adam-atan2-pytorch
(train_image_only.py:90) with `model.muon_parameters()` — attention V/out and
feedforward in/out weight matrices get Muon, everything else Adam-atan2.
These are JAX/optax-native reimplementations:

  * adam_atan2: Adam with atan2(m_hat, sqrt(v_hat)) in place of
    m_hat / (sqrt(v_hat) + eps)  (Everett et al. 2024, arXiv:2407.05872) —
    scale-invariant, removes the eps hyperparameter.
  * muon: momentum + Newton–Schulz iteration orthogonalizing the 2-D update
    (Jordan et al. 2024), applied only to matrix-shaped params.
  * muon_adam_atan2: the combined optimizer using `muon_param_mask`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def adam_atan2(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.99,
    a: float = 1.27,
    b: float = 1.0,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    def init_fn(params):
        return dict(
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
            count=jnp.zeros((), jnp.int32),
        )

    def update_fn(updates, state, params=None):
        count = state["count"] + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state["mu"], updates)
        nu = jax.tree.map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state["nu"], updates
        )
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)

        def direction(m, v):
            m_hat = m / c1
            v_hat = v / c2
            return a * jnp.arctan2(m_hat, b * jnp.sqrt(v_hat))

        new_updates = jax.tree.map(direction, mu, nu)
        if weight_decay > 0 and params is not None:
            new_updates = jax.tree.map(
                lambda u, p: u + weight_decay * p, new_updates, params
            )
        scaled, _ = optax.scale_by_learning_rate(learning_rate).update(
            new_updates, optax.EmptyState()
        )
        return scaled, dict(mu=mu, nu=nu, count=count)

    return optax.GradientTransformation(init_fn, update_fn)


def _newton_schulz(g, steps: int = 5, eps: float = 1e-7):
    """Orthogonalize a 2-D matrix via the quintic Newton–Schulz iteration."""
    a_c, b_c, c_c = 3.4445, -4.7750, 2.0315
    x = g.astype(jnp.bfloat16)
    transpose = g.shape[0] > g.shape[1]
    if transpose:
        x = x.T
    x = x / (jnp.linalg.norm(x) + eps)

    def body(_, x):
        A = x @ x.T
        B = b_c * A + c_c * A @ A
        return a_c * x + B @ x

    x = jax.lax.fori_loop(0, steps, body, x)
    if transpose:
        x = x.T
    return x.astype(g.dtype)


def muon(
    learning_rate,
    momentum: float = 0.95,
    nesterov: bool = True,
    ns_steps: int = 5,
) -> optax.GradientTransformation:
    def init_fn(params):
        return dict(mu=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        mu = jax.tree.map(
            lambda m, g: momentum * m + g, state["mu"], updates
        )
        use = (
            jax.tree.map(lambda m, g: g + momentum * m, mu, updates)
            if nesterov
            else mu
        )

        def orth(u):
            if u.ndim == 2:
                o = _newton_schulz(u, ns_steps)
                # match rms scale of adam-style updates
                return o * max(1.0, u.shape[0] / u.shape[1]) ** 0.5
            return u

        new_updates = jax.tree.map(orth, use)
        scaled, _ = optax.scale_by_learning_rate(learning_rate).update(
            new_updates, optax.EmptyState()
        )
        return scaled, dict(mu=mu)

    return optax.GradientTransformation(init_fn, update_fn)


def muon_param_mask(params) -> dict:
    """True for params Muon should handle: attention v/out projections and
    feedforward in/out kernels (reference muon_parameters, transfusion.py:
    1580-1595); everything else (embeddings, norms, gates, heads) False."""

    def decide(path, p):
        names = [str(getattr(k, "key", k)) for k in path]
        joined = "/".join(names)
        is_matrix = p.ndim == 2
        muon_site = any(
            s in joined
            for s in ("to_v", "to_out", "proj_in", "proj_out")
        ) and "kernel" in joined
        return bool(is_matrix and muon_site)

    return jax.tree_util.tree_map_with_path(decide, params)


def muon_adam_atan2(
    muon_lr: float = 1e-3,
    adam_lr: float = 1e-4,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Combined optimizer: Muon on matrix params at muon sites, Adam-atan2
    elsewhere (equivalent of adam-atan2-pytorch's MuonAdamAtan2)."""
    return optax.multi_transform(
        {
            "muon": muon(muon_lr),
            "adam": adam_atan2(adam_lr, weight_decay=weight_decay),
        },
        lambda params: jax.tree.map(
            lambda m: "muon" if m else "adam", muon_param_mask(params)
        ),
    )

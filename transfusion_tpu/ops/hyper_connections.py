"""Manifold-constrained hyper-connections (multi-stream residuals).

Capability parity with the reference's use of the `hyper-connections` package
(mHCv2, reference transfusion.py:47, 1066-1070, 1185-1243; paper
arXiv:2503.14125 referenced in the reference README). The torch package is not
a dependency here — this is an independent JAX implementation of the idea:

  * the residual state is `s` parallel streams S in R^{s x d};
  * each residual block reads a convex combination of streams (depth
    connection, simplex-constrained via softmax — the "manifold" constraint,
    which keeps total residual magnitude stable);
  * the block output is written back to the streams with learned per-stream
    weights, and the streams are mixed by a row-stochastic matrix;
  * weights come in a static part plus a dynamic (token-dependent) part
    computed from the normalized stream content;
  * `fracs` splits the channel dim into groups with independent mixing
    weights (the "num_fracs" knob of mHCv2).

`streams == 1` degenerates *exactly* to a plain pre-norm residual
(`x + block(x)`), matching the reference default (transfusion.py:1051).

Usage per transformer block:
    S = expand_stream(x)                  # [s, b, n, d] <- [b, n, d]
    branch, S_mixed = hc.width(S)         # read
    out = block(branch)
    S = hc.depth(S_mixed, out)            # write
    x = reduce_stream(S)                  # [b, n, d]
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from transfusion_tpu.ops.norms import l2norm


def expand_stream(x, streams: int):
    if streams == 1:
        return x[None]
    return jnp.broadcast_to(x[None], (streams, *x.shape))


def reduce_stream(s):
    if s.shape[0] == 1:
        return s[0]
    return s.mean(axis=0)


class HyperConnection(nn.Module):
    """One residual block's read/mix/write connection over `streams` streams."""

    dim: int
    streams: int = 1
    fracs: int = 1
    layer_index: int = 0
    dynamic: bool = True
    param_dtype = jnp.float32

    def _split_fracs(self, t):
        # [..., d] -> [..., f, d/f]
        f = self.fracs
        return t.reshape(*t.shape[:-1], f, self.dim // f)

    def _merge_fracs(self, t):
        return t.reshape(*t.shape[:-2], self.dim)

    @nn.compact
    def __call__(self, s, branch_out=None):
        """Two-phase call.

        Phase 1 (branch_out is None): returns (branch_input [b,n,d],
            mixed streams [s,b,n,d]).
        Phase 2 (branch_out given): returns updated streams [s,b,n,d].
        """
        if self.streams == 1:
            if branch_out is None:
                return s[0], s
            return s + branch_out[None]

        n_s, f = self.streams, self.fracs
        assert self.dim % f == 0
        k = self.layer_index % n_s  # stream this layer is anchored to

        eye_like = jnp.eye(n_s)[None].repeat(f, axis=0)  # [f, s, s]

        alpha_logit = self.param(
            "alpha_logit",
            lambda rng: 4.0 * jnp.eye(n_s)[k][None].repeat(f, axis=0),
        )  # [f, s]
        beta = self.param(
            "beta", lambda rng: jnp.eye(n_s)[k][None].repeat(f, axis=0)
        )  # [f, s]
        mix_logit = self.param("mix_logit", lambda rng: 4.0 * eye_like)  # [f,s,s]

        if branch_out is None:
            sf = self._split_fracs(s)  # [s, b, n, f, d/f]

            logits = alpha_logit  # [f, s]
            if self.dynamic:
                w_dyn = self.param(
                    "alpha_dyn_kernel",
                    nn.initializers.zeros,
                    (f, self.dim // f),
                    self.param_dtype,
                )
                scale = self.param(
                    "alpha_dyn_scale",
                    lambda rng: jnp.full((f,), 1e-2),
                )
                dyn = jnp.tanh(
                    jnp.einsum("sbnfc,fc->sbnf", l2norm(sf), w_dyn)
                ) * scale  # [s, b, n, f]
                logits = logits.T[:, None, None, :] + dyn  # [s, b, n, f]
                weights = nn.softmax(logits, axis=0)
                branch = self._merge_fracs(
                    jnp.einsum("sbnfc,sbnf->bnfc", sf, weights)
                )
            else:
                weights = nn.softmax(logits, axis=-1)  # [f, s]
                branch = self._merge_fracs(
                    jnp.einsum("sbnfc,fs->bnfc", sf, weights)
                )

            # row-stochastic stream mixing (depth connection)
            mix = nn.softmax(mix_logit, axis=-1)  # [f, s_out, s_in]
            mixed = self._merge_fracs(
                jnp.einsum("fos,sbnfc->obnfc", mix, sf)
            )
            return branch, mixed

        # phase 2: write branch output back into the streams
        out_f = self._split_fracs(branch_out)  # [b, n, f, d/f]
        write = jnp.einsum("fs,bnfc->sbnfc", beta, out_f)
        return s + self._merge_fracs(write)

"""Continuous axial positional embeddings.

Capability parity with the reference's use of `axial-positional-embedding`'s
`ContinuousAxialPositionalEmbedding` (reference transfusion.py:43, 1360-1365,
2126, 2668-2690): an MLP generates a positional embedding for a modality's
axial coordinates, so arbitrary (ragged) spatial sizes share one set of
parameters.

TPU-first redesign: instead of the reference's factorize-at-max-dims /
combine-per-instance host machinery (transfusion.py:2482, 2635-2696), we feed
*per-token coordinate vectors* (Float[..., num_axial_dims]) straight through
the MLP. Coordinates are static-shape data prepared by the packer, so a
single application covers every modality instance in a packed batch —
padding/text rows are simply masked out by the caller.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ContinuousAxialPositionalEmbedding(nn.Module):
    dim: int
    num_axial_dims: int
    expansion: int = 2

    @nn.compact
    def __call__(self, coords):
        """coords: Float[..., num_axial_dims] -> Float[..., dim]."""
        h = nn.Dense(self.dim * self.expansion)(coords.astype(jnp.float32))
        h = nn.silu(h)
        h = nn.Dense(self.dim * self.expansion)(h)
        h = nn.silu(h)
        return nn.Dense(self.dim)(h)

    @staticmethod
    def coords_for_shape(shape: tuple[int, ...], num_axial_dims: int):
        """Dense coordinate grid Float[prod(shape), num_axial_dims].

        Zero-dimensional shapes yield a single all-zero coordinate row.
        Shapes shorter than num_axial_dims are right-padded with zeros.
        """
        if len(shape) == 0:
            return jnp.zeros((1, num_axial_dims))

        axes = [jnp.arange(s, dtype=jnp.float32) for s in shape]
        grid = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)
        grid = grid.reshape(-1, len(shape))

        if len(shape) < num_axial_dims:
            pad = num_axial_dims - len(shape)
            grid = jnp.pad(grid, ((0, 0), (0, pad)))

        return grid

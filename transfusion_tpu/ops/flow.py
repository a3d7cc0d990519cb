"""Rectified-flow matching primitives and text sampling filters.

Parity targets in the reference:
  - noising + flow target          transfusion.py:2552-2563, 2088-2094
  - x-prediction -> flow           transfusion.py:629-655 (`get_model_output_to_flow_fn`)
  - min-p filtering                transfusion.py:662-666
  - gumbel sampling                transfusion.py:313-319

All device-side, vectorized; no per-sample Python closures (the reference's
`GetPredFlows` closure machinery becomes plain masked gathers in the model).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from transfusion_tpu.ops.norms import safe_log
from transfusion_tpu.utils.typing import Array, Float, typecheck


def _append_dims(t, ndims: int):
    return t.reshape(*t.shape, *((1,) * ndims))


def noise_data(data, noise, times):
    """x_t = t * x + (1 - t) * noise ; flow target = x - noise.

    times: Float[...] broadcast against data's leading dims (extra dims of
    data are filled with size-1 axes).
    Returns (noised, flow).
    """
    times = _append_dims(times, data.ndim - times.ndim)
    noised = data * times + noise * (1.0 - times)
    flow = data - noise
    return noised, flow


def model_output_to_flow(out, noised, times, eps: float = 5e-2):
    """Convert an x-prediction (clean-data prediction) to a flow prediction.

    flow = (x_hat - x_t) / max(1 - t, eps)

    Reference transfusion.py:629-655; eps default 5e-2 at the function level,
    the model uses eps=1e-2 (transfusion.py:1285).
    """
    noised = noised.reshape(out.shape)
    times = _append_dims(times, out.ndim - times.ndim)
    return (out - noised) / jnp.clip(1.0 - times, min=eps)


@typecheck
def min_p_filter(
    logits: Float[Array, "... v"], min_p: float = 0.1
) -> Float[Array, "... v"]:
    """Keep logits whose probability >= min_p * max probability, else -inf.

    Reference transfusion.py:662-666 (Nguyen et al. 2024, arXiv:2407.01082).
    """
    probs = jax.nn.softmax(logits, axis=-1)
    max_probs = jnp.max(probs, axis=-1, keepdims=True)
    limit = min_p * max_probs
    return jnp.where(probs < limit, -jnp.inf, logits)


def gumbel_noise(key, shape):
    uniform = jax.random.uniform(key, shape, minval=1e-20, maxval=1.0)
    return -safe_log(-safe_log(uniform))


def gumbel_sample(key, logits, temperature: float = 1.0, axis: int = -1):
    """argmax(logits / T + gumbel) — greedy when temperature == 0."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=axis)
    noise = gumbel_noise(key, logits.shape)
    return jnp.argmax(logits / temperature + noise, axis=axis)

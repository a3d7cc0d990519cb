"""Exponential moving average of model parameters.

Capability parity with the reference's use of `ema-pytorch` (reference
transfusion.py:41, 1604-1620, 2296-2298): an EMA copy of the weights with
warmup gating, forwarding the sampling methods, and usable as the
velocity-consistency target model.

Functional core (`ema_update`) + a thin stateful wrapper (`EMA`) mirroring
`model.create_ema()` usage in the reference example scripts.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class EmaState:
    params: Any
    step: Any  # i32 scalar


def init_ema(params) -> EmaState:
    # materialize fresh buffers — the EMA copy must not alias the live params
    # (aliasing breaks buffer donation in jitted train steps)
    copied = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
    return EmaState(params=copied, step=jnp.zeros((), jnp.int32))


def ema_update(
    state: EmaState,
    params,
    beta: float = 0.99,
    update_every: int = 10,
    update_after_step: int = 100,
) -> EmaState:
    """ema-pytorch-style schedule: copy until warmup ends, then decay every
    `update_every` steps."""
    step = state.step + 1

    def blend(ema_p, p):
        return ema_p * beta + p * (1.0 - beta)

    past_warmup = step > update_after_step
    on_cycle = (step % update_every) == 0

    def do_copy(_):
        return jax.tree.map(lambda e, p: p, state.params, params)

    def do_blend(_):
        return jax.tree.map(blend, state.params, params)

    def keep(_):
        return state.params

    new_params = jax.lax.cond(
        past_warmup,
        lambda _: jax.lax.cond(on_cycle, do_blend, keep, None),
        do_copy,
        None,
    )
    return EmaState(params=new_params, step=step)


class EMA:
    """Stateful convenience: `ema = model.create_ema(params)`; `ema.update(params)`;
    `ema.sample(...)` / `ema.generate_text_only(...)` etc. use EMA weights."""

    def __init__(
        self,
        model,
        params,
        beta: float = 0.99,
        update_every: int = 10,
        update_after_step: int = 100,
    ):
        self.model = model
        self.beta = beta
        self.update_every = update_every
        self.update_after_step = update_after_step
        self.state = init_ema(params)
        self._update = jax.jit(
            lambda s, p: ema_update(
                s, p, beta=beta, update_every=update_every,
                update_after_step=update_after_step,
            )
        )

    @property
    def ema_params(self):
        return self.state.params

    def update(self, params):
        self.state = self._update(self.state, params)
        return self.state

    # forwarded sampling methods (reference :1610-1617)
    def sample(self, *args, **kwargs):
        return self.model.sample(self.ema_params, *args, **kwargs)

    def generate_text_only(self, *args, **kwargs):
        return self.model.generate_text_only(self.ema_params, *args, **kwargs)

    def generate_modality_only(self, *args, **kwargs):
        return self.model.generate_modality_only(self.ema_params, *args, **kwargs)

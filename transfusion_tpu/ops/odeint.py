"""Fixed-grid ODE integrators as `lax.scan` — fully on-device.

The reference integrates the sampling flow with `torchdiffeq.odeint`
(method='midpoint', transfusion.py:1280-1284, 1500) over an explicit
`linspace(0, 1, steps)` grid (transfusion.py:1903), so the adaptive machinery
is never used — a fixed-grid solver is exactly equivalent and compiles to a
single XLA while-loop instead of host-side Python stepping.

`fn(t, y) -> dy/dt`; `times` is the integration grid [T]; returns the final
state y(times[-1]) and optionally the trajectory at the grid points.
"""

from __future__ import annotations

from typing import Callable, Literal

import jax
import jax.numpy as jnp

Method = Literal["euler", "midpoint", "heun", "rk4"]


def _euler_step(fn, t0, dt, y):
    return jax.tree.map(lambda y_, d_: y_ + dt * d_, y, fn(t0, y))


def _midpoint_step(fn, t0, dt, y):
    half = dt * 0.5
    k1 = fn(t0, y)
    y_mid = jax.tree.map(lambda y_, d_: y_ + half * d_, y, k1)
    k2 = fn(t0 + half, y_mid)
    return jax.tree.map(lambda y_, d_: y_ + dt * d_, y, k2)


def _heun_step(fn, t0, dt, y):
    k1 = fn(t0, y)
    y1 = jax.tree.map(lambda y_, d_: y_ + dt * d_, y, k1)
    k2 = fn(t0 + dt, y1)
    return jax.tree.map(lambda y_, a, b: y_ + dt * 0.5 * (a + b), y, k1, k2)


def _rk4_step(fn, t0, dt, y):
    half = dt * 0.5
    k1 = fn(t0, y)
    k2 = fn(t0 + half, jax.tree.map(lambda y_, d_: y_ + half * d_, y, k1))
    k3 = fn(t0 + half, jax.tree.map(lambda y_, d_: y_ + half * d_, y, k2))
    k4 = fn(t0 + dt, jax.tree.map(lambda y_, d_: y_ + dt * d_, y, k3))
    return jax.tree.map(
        lambda y_, a, b, c, d: y_ + dt / 6.0 * (a + 2 * b + 2 * c + d),
        y, k1, k2, k3, k4,
    )

_STEPPERS = {
    "euler": _euler_step,
    "midpoint": _midpoint_step,
    "heun": _heun_step,
    "rk4": _rk4_step,
}


def odeint(
    fn: Callable,
    y0,
    times,
    method: Method = "midpoint",
    return_trajectory: bool = False,
):
    """Integrate dy/dt = fn(t, y) across the grid `times` (shape [T]).

    Matches torchdiffeq's fixed-grid solvers: one `method` step is taken
    between each adjacent pair of grid points.
    """
    stepper = _STEPPERS[method]
    times = jnp.asarray(times)

    t0s = times[:-1]
    dts = times[1:] - times[:-1]

    def scan_step(y, t_dt):
        t0, dt = t_dt
        y_next = stepper(fn, t0, dt, y)
        return y_next, (y_next if return_trajectory else None)

    y_final, traj = jax.lax.scan(scan_step, y0, (t0s, dts))

    if return_trajectory:
        full = jax.tree.map(
            lambda first, rest: jnp.concatenate([first[None], rest], axis=0),
            y0, traj,
        )
        return y_final, full

    return y_final

"""Faithful reimplementation of torchdiffeq's FIXED-GRID solvers.

Only the four methods the reference exposes (matcha/models/components/
flow_matching.py:60-63, matcha/inference.py:39-41) are provided, with the
exact step formulas of torchdiffeq/_impl/fixed_grid.py:

  euler     y1 = y0 + dt f(t0, y0)
  midpoint  y1 = y0 + dt f(t0 + dt/2, y0 + dt/2 f(t0, y0))
  rk4       Kutta's 3/8 rule (torchdiffeq's rk4_alt_step_func — NOT the
            classical RK4)
  heun3     k1 = f(t0,y0); k2 = f(t0+dt/3, y0+dt/3 k1);
            k3 = f(t0+2dt/3, y0+2dt/3 k2); y1 = y0 + dt (k1 + 3 k3) / 4
"""

import torch


def _euler(func, t0, dt, y0):
    return dt * func(t0, y0)


def _midpoint(func, t0, dt, y0):
    half_dt = 0.5 * dt
    f0 = func(t0, y0)
    return dt * func(t0 + half_dt, y0 + half_dt * f0)


def _rk4_alt(func, t0, dt, y0):
    # torchdiffeq rk4_alt_step_func: Kutta's 3/8 rule
    k1 = func(t0, y0)
    k2 = func(t0 + dt / 3.0, y0 + dt * k1 / 3.0)
    k3 = func(t0 + dt * 2.0 / 3.0, y0 + dt * (k2 - k1 / 3.0))
    k4 = func(t0 + dt, y0 + dt * (k1 - k2 + k3))
    return (k1 + 3.0 * (k2 + k3) + k4) * dt * 0.125


def _heun3(func, t0, dt, y0):
    k1 = func(t0, y0)
    k2 = func(t0 + dt / 3.0, y0 + dt * k1 / 3.0)
    k3 = func(t0 + dt * 2.0 / 3.0, y0 + dt * 2.0 / 3.0 * k2)
    return dt * (k1 + 3.0 * k3) / 4.0


_STEPS = {"euler": _euler, "midpoint": _midpoint, "rk4": _rk4_alt, "heun3": _heun3}


def odeint(func, y0, t, method="dopri5", **kwargs):
    if method not in _STEPS:
        raise ValueError(f"stub torchdiffeq supports {sorted(_STEPS)}, not {method!r}")
    step = _STEPS[method]
    ys = [y0]
    y = y0
    for i in range(len(t) - 1):
        t0, t1 = t[i], t[i + 1]
        y = y + step(func, t0, t1 - t0, y)
        ys.append(y)
    return torch.stack(ys)

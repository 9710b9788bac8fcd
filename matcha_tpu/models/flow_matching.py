"""Optimal-transport conditional flow matching (OT-CFM).

Training objective and ODE synthesis for the CFM decoder
(reference: matcha/models/components/flow_matching.py):

  training:   y_t = (1 - (1-σ)t)·x0 + t·x1,  target u = x1 - (1-σ)·x0,
              masked MSE between v(y_t, t | mu) and u
  synthesis:  integrate dx/dt = v(x, t | mu) from t=0 → 1 starting at
              z = mu + ε (use_mu_prior) with a FIXED-SEED ε so repeated
              synthesis is bit-reproducible for MCD comparisons
              (reference: flow_matching.py:41-44).

TPU-native solver design: instead of a framework ODE library (torchdiffeq in
the reference), the fixed-grid solvers (euler / midpoint / rk4 / heun3) are
written directly as `lax.scan` over the time grid, so the entire multi-step
integration — 2·steps U-Net evaluations for midpoint — compiles into ONE XLA
program with zero host round-trips.  This is the reference's torch.compile
"3x" insight (README.md:167) taken to its limit.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

# Fixed synthesis seed so repeated synthesis of the same text is identical
# (stable MCD measurement; reference: flow_matching.py:43-44).
DEFAULT_NOISE_SEED = 42

VelocityFn = Callable[[jax.Array, jax.Array], jax.Array]  # (x, t) -> dx/dt
# (x, mask, mu, t) -> velocity
VelocityFn3 = Callable[[jax.Array, jax.Array, jax.Array, jax.Array], jax.Array]

SOLVERS = ("euler", "midpoint", "rk4", "heun3")


def _step_euler(f: VelocityFn, x, t, dt):
    return x + dt * f(x, t)


def _step_midpoint(f: VelocityFn, x, t, dt):
    k1 = f(x, t)
    return x + dt * f(x + 0.5 * dt * k1, t + 0.5 * dt)


def _step_rk4(f: VelocityFn, x, t, dt):
    """Kutta's 3/8-rule RK4 — the exact algorithm torchdiffeq dispatches to
    for method="rk4" (rk4_alt_step_func), so converted checkpoints reproduce
    the reference's rk4 synthesis numerics (reference: flow_matching.py:62).
    """
    k1 = f(x, t)
    k2 = f(x + (dt / 3.0) * k1, t + dt / 3.0)
    k3 = f(x + dt * (k2 - k1 / 3.0), t + 2.0 * dt / 3.0)
    k4 = f(x + dt * (k1 - k2 + k3), t + dt)
    return x + dt * (k1 + 3.0 * (k2 + k3) + k4) / 8.0


def _step_heun3(f: VelocityFn, x, t, dt):
    k1 = f(x, t)
    k2 = f(x + (dt / 3.0) * k1, t + dt / 3.0)
    k3 = f(x + (2.0 * dt / 3.0) * k2, t + 2.0 * dt / 3.0)
    return x + (dt / 4.0) * (k1 + 3.0 * k3)


_STEPS = {
    "euler": _step_euler,
    "midpoint": _step_midpoint,
    "rk4": _step_rk4,
    "heun3": _step_heun3,
}


def odeint_fixed(
    f: VelocityFn, x0: jax.Array, t_span: jax.Array, solver: str = "midpoint"
) -> jax.Array:
    """Integrate dx/dt = f(x, t) over the grid ``t_span`` (static length).

    Matches torchdiffeq's fixed-grid solvers on the same grid
    (reference: flow_matching.py:60-63) but runs as a single `lax.scan`.
    Returns the final state only.
    """
    if solver not in _STEPS:
        raise ValueError(f"Unknown solver {solver!r}; choose from {SOLVERS}")
    step = _STEPS[solver]
    ts, dts = t_span[:-1], t_span[1:] - t_span[:-1]

    def body(x, t_dt):
        t, dt = t_dt
        return step(f, x, t, dt), None

    x_final, _ = jax.lax.scan(body, x0, (ts, dts))
    return x_final


def cfm_loss(
    estimator: VelocityFn3,
    x1: jax.Array,
    mask: jax.Array,
    mu: jax.Array,
    rng: jax.Array,
    *,
    sigma_min: float = 1e-4,
    use_mu_prior: bool = True,
    t_noise: tuple[jax.Array, jax.Array] | None = None,
    row_weights: jax.Array | None = None,
) -> jax.Array:
    """Masked OT-CFM loss. (reference: flow_matching.py:65-112)

    Args:
        estimator: callable (x, mask, mu, t) -> velocity, e.g. a bound
            Decoder apply.
        x1: (B, T, C) target (ground-truth) coarse mel.
        mask: (B, T) validity mask.
        mu: (B, T, C) conditioning prior (already stop-gradient'ed by the
            caller — decoder gradients must not reach the encoder).
        rng: PRNG key for (t, x0).
        t_noise: optional fixed ((B,1,1) timestep, (B,T,C) noise) overriding
            the rng draw — determinism hook for cross-framework parity tests.
        row_weights: optional (B,) loss weights (0 excludes repeat-filled
            rows); the estimator still sees the binary mask.
    """
    b = x1.shape[0]
    if t_noise is not None:
        t, noise = t_noise
    else:
        rng_t, rng_x0 = jax.random.split(rng)
        t = jax.random.uniform(rng_t, (b, 1, 1), dtype=x1.dtype)
        noise = jax.random.normal(rng_x0, x1.shape, dtype=x1.dtype)
    x0 = mu + noise if use_mu_prior else noise

    y = (1.0 - (1.0 - sigma_min) * t) * x0 + t * x1
    u = x1 - (1.0 - sigma_min) * x0

    pred = estimator(y, mask, mu, t[:, 0, 0])
    m = mask[..., None]
    sq = jnp.square((pred - u) * m)
    if row_weights is None:
        return jnp.sum(sq) / (jnp.sum(m) * x1.shape[-1])
    w = row_weights[:, None, None]
    return jnp.sum(sq * w) / (jnp.sum(m * w) * x1.shape[-1])


def seeded_synthesis_noise(
    b: int, t: int, c: int, dtype=jnp.float32, seed: int = DEFAULT_NOISE_SEED
) -> jax.Array:
    """(B, T, C) ODE noise: ONE (T, C) stream shared by every batch row.

    A flat threefry draw over (B, T, C) makes row k's values depend on the
    array SHAPE (the stream offset is k*T*C), so the same utterance got
    different noise depending on its position in a batcher group, the group
    size, and the mel bucket (the fused path predicts the bucket from text
    length; the two-stage path derives it from durations) — SERVE_FUSED vs
    two-stage could return audibly different audio for rows k>0.  Sharing
    row 0's stream across the batch makes every request's noise exactly the
    B=1 draw (value at (t, c) has flat index t*C+c, invariant to both B and
    T), i.e. synthesis is deterministic per utterance no matter how requests
    are batched or bucketed — the property the fixed seed exists for
    (reference pins its seed for stable MCD; rows are independent through
    the ODE, so sharing the initial condition couples nothing).
    """
    row = jax.random.normal(jax.random.PRNGKey(seed), (t, c), dtype)
    return jnp.broadcast_to(row[None], (b, t, c))


def cfm_synthesise(
    estimator: VelocityFn3,
    mu: jax.Array,
    mask: jax.Array,
    n_timesteps: int,
    *,
    solver: str = "midpoint",
    use_mu_prior: bool = True,
    noise_seed: int = DEFAULT_NOISE_SEED,
    noise: jax.Array | None = None,
) -> jax.Array:
    """ODE synthesis from the encoder prior. (reference: flow_matching.py:26-63)

    The noise seed is fixed by default so repeated synthesis of the same text
    produces identical audio (required for stable MCD measurement).  An
    explicit ``noise`` array overrides the seeded draw (parity-test hook).
    """
    if noise is None:
        b, t, c = mu.shape
        noise = seeded_synthesis_noise(b, t, c, mu.dtype, seed=noise_seed)
    z = mu + noise if use_mu_prior else noise
    z = z * mask[..., None]
    t_span = jnp.linspace(0.0, 1.0, n_timesteps + 1, dtype=mu.dtype)

    def f(x, t):
        return estimator(x, mask, mu, t)

    return odeint_fixed(f, z, t_span, solver=solver)

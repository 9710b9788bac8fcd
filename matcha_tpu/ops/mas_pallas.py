"""Pallas TPU kernel for Monotonic Alignment Search.

One kernel invocation per batch element (grid=(B,)): the whole dynamic
program — forward wavefront AND backtrack — runs inside VMEM, so the only
HBM traffic is the (Ty, Tx) score read and the (Ty,) index write.  This is
the TPU counterpart of the reference's Triton `super_monotonic_align`
dependency (reference: matcha/models/matcha_tts.py:10,199), and replaces
the 2·Ty-step `lax.scan` in ops/mas.py whose per-step outputs round-trip
through HBM.

Layout: scores arrive TIME-MAJOR (B, Ty, Tx) — mel frames on sublanes,
tokens on lanes — so each DP step touches one contiguous (1, Tx) row.
Masking uses the same -1e9 sentinel scheme as the scan implementation.

The public wrapper `maximum_path_indices_pallas` matches
`ops.mas.maximum_path_indices` (which remains the portable fallback).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _mas_kernel(xlen_ref, ylen_ref, value_ref, idx_ref, f_ref, dec_ref):
    """Single-sample MAS.

    Refs:
        xlen_ref, ylen_ref: (B,) int32 (scalar prefetch); indexed by program_id.
        value_ref: (Ty, Tx) f32 log-priors (time-major) in VMEM.
        idx_ref:   (Ty, 1) int32 output — per-frame token index (-1 padding).
        f_ref:     (1, Tx) f32 scratch — DP score column.
        dec_ref:   (Ty, Tx) int8 scratch — backtrack decisions.
    """
    t_y, t_x = value_ref.shape
    i = pl.program_id(0)
    x_len = xlen_ref[i]
    y_len = ylen_ref[i]

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, t_x), 1)
    row_valid = lanes < x_len

    # --- forward DP over mel frames ---
    f_ref[:] = jnp.where(lanes == 0, value_ref[0:1, :], NEG_INF)
    dec_ref[0:1, :] = jnp.zeros((1, t_x), jnp.int8)

    def fwd(j, _):
        f_prev = f_ref[:]
        shifted = jnp.where(
            lanes == 0, NEG_INF, pltpu.roll(f_prev, shift=1, axis=1)
        )
        take_diag = shifted >= f_prev
        f = value_ref[pl.ds(j, 1), :] + jnp.maximum(f_prev, shifted)
        f_ref[:] = jnp.where(row_valid, f, NEG_INF)
        dec_ref[pl.ds(j, 1), :] = take_diag.astype(jnp.int8)
        return 0

    jax.lax.fori_loop(1, y_len, fwd, 0)

    # --- backtrack from (x_len-1, y_len-1) ---
    def bwd(k, cursor):
        j = t_y - 1 - k  # iterate j = Ty-1 .. 0
        active = j < y_len
        idx_ref[pl.ds(j, 1), :] = jnp.full((1, 1), jnp.where(active, cursor, -1), jnp.int32)
        cursor_onehot = (lanes == cursor).astype(jnp.int8)
        took_diag = jnp.sum(dec_ref[pl.ds(j, 1), :] * cursor_onehot) > 0
        step = active & (j > 0) & (cursor > 0) & took_diag
        return cursor - step.astype(jnp.int32)

    jax.lax.fori_loop(0, t_y, bwd, x_len - 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def maximum_path_indices_pallas(
    value: jax.Array,
    x_lengths: jax.Array,
    y_lengths: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Batched MAS via the Pallas kernel.

    Args:
        value: (B, Tx, Ty) fp32 log-priors (same layout as ops.mas).
    Returns:
        (B, Ty) int32 per-frame token indices, -1 on padding frames.
    """
    value = value.astype(jnp.float32)
    b, t_x, t_y = value.shape
    value_tm = jnp.swapaxes(value, 1, 2)  # (B, Ty, Tx) time-major

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (None, t_y, t_x), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, t_y, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((1, t_x), jnp.float32),
            pltpu.VMEM((t_y, t_x), jnp.int8),
        ],
    )
    out = pl.pallas_call(
        _mas_kernel,
        out_shape=jax.ShapeDtypeStruct((b, t_y, 1), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        x_lengths.astype(jnp.int32),
        y_lengths.astype(jnp.int32),
        value_tm,
    )
    return out[..., 0]

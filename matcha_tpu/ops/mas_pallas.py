"""Pallas TPU kernels for Monotonic Alignment Search.

TPU counterpart of the reference's Triton `super_monotonic_align` dependency
(reference: matcha/models/matcha_tts.py:10,199), replacing the 2·Ty-step
`lax.scan` in ops/mas.py whose per-step XLA while-loop overhead dominates
(the DP is latency-bound, not bandwidth-bound).

Design (shaped by Mosaic's tiling rules):
  * Batch lives on SUBLANES, tokens on LANES: every DP step is one
    (B, Tx) vector op — full VPU rows, all samples advance together.
  * Scores are streamed TIME-MAJOR as (TB, B, Tx) blocks over a 1-D grid;
    the DP front f (B, Tx) persists in VMEM scratch across grid steps
    (TPU grids are sequential), so arbitrarily long Ty never exceeds VMEM.
  * The leading block dim is UNTILED for 3-D refs, so the inner
    `fori_loop` may index rows dynamically — the constraint that sank the
    naive kernel (vector stores at dynamic sublane offsets must be 8-aligned)
    does not apply.
  * Backtrack is a second kernel whose index_map serves the decision blocks
    in REVERSE grid order, carrying per-sample cursors (B, 1) in scratch.

Per-sample lengths enter as (B, 128) broadcast int32 arrays (column 0 used)
rather than scalar prefetch, so masks are single vector compares.

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
_TARGET_BLOCK_BYTES = 1 << 20  # ~1 MB value block → ≤ ~5 MB live VMEM
_UNROLL = 8  # DP rows per fori_loop iteration (block rows stay a multiple)


def _fwd_kernel(xlen_ref, ylen_ref, value_ref, dec_ref, f_ref):
    """Forward DP over one (TB, B, Tx) block of mel-frame rows.

    f_ref (B, Tx) carries the score front across grid steps; dec_ref gets
    the per-row take-diagonal decisions for the backtrack kernel.
    """
    t = pl.program_id(0)
    tb, b, t_x = value_ref.shape
    lanes = jax.lax.broadcasted_iota(jnp.int32, (b, t_x), 1)
    xlen = xlen_ref[:, 0:1]  # (B, 1)
    ylen = ylen_ref[:, 0:1]
    row_valid = lanes < xlen

    @pl.when(t == 0)
    def _():
        # the j==0 select overwrites every element of the first DP row, so
        # any init value is correct — but never CONSUME undefined VMEM
        # (mirrors _bwd_kernel's cursor init)
        f_ref[:] = jnp.full(f_ref.shape, NEG_INF, jnp.float32)

    def rows(u, _):
        f = f_ref[:]
        for s in range(_UNROLL):  # unrolled: amortizes scalar loop control
            r = u * _UNROLL + s
            j = t * tb + r
            vrow = value_ref[r]  # (B, Tx)
            shifted = jnp.where(
                lanes == 0, NEG_INF, pltpu.roll(f, shift=1, axis=1)
            )
            take_diag = shifted >= f
            f_dp = vrow + jnp.maximum(f, shifted)
            f_init = jnp.where(lanes == 0, vrow, NEG_INF)
            f_new = jnp.where(j == 0, f_init, f_dp)
            f_new = jnp.where(row_valid, f_new, NEG_INF)
            f = jnp.where(j < ylen, f_new, f)
            dec_ref[r] = take_diag.astype(jnp.int32)
        f_ref[:] = f
        return 0

    jax.lax.fori_loop(0, tb // _UNROLL, rows, 0)


def _bwd_kernel(xlen_ref, ylen_ref, dec_ref, idx_ref, cur_ref):
    """Backtrack over decision blocks served in reverse grid order.

    cur_ref (B, 1) carries each sample's token cursor; rows above y_len
    emit -1 and leave the cursor untouched.
    """
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    tb, b, t_x = dec_ref.shape
    base = (n_t - 1 - t) * tb
    lanes = jax.lax.broadcasted_iota(jnp.int32, (b, t_x), 1)
    xlen = xlen_ref[:, 0:1]
    ylen = ylen_ref[:, 0:1]

    @pl.when(t == 0)
    def _():
        cur_ref[:] = xlen - 1

    def rows(u, _):
        cursor = cur_ref[:]  # (B, 1)
        for s in range(_UNROLL):
            r = tb - 1 - (u * _UNROLL + s)
            j = base + r
            active = j < ylen
            idx_val = jnp.where(active, cursor, -1)
            idx_ref[r] = jnp.broadcast_to(idx_val, (b, 128))
            onehot = (lanes == cursor).astype(jnp.int32)
            took_diag = jnp.sum(dec_ref[r] * onehot, axis=1, keepdims=True) > 0
            step = active & (j > 0) & (cursor > 0) & took_diag
            cursor = cursor - step.astype(jnp.int32)
        cur_ref[:] = cursor
        return 0

    jax.lax.fori_loop(0, tb // _UNROLL, rows, 0)


def _pick_block_rows(b: int, t_x: int) -> int:
    rows = _TARGET_BLOCK_BYTES // max(b * t_x * 4, 1)
    return max(8, min(256, (rows // 8) * 8))


@functools.partial(jax.jit, static_argnames=("interpret",))
def maximum_path_indices_pallas(
    value: jax.Array,
    x_lengths: jax.Array,
    y_lengths: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Batched MAS via the streamed Pallas kernels.

    Args:
        value: (B, Tx, Ty) fp32 log-priors (same layout as ops.mas).
    Returns:
        (B, Ty) int32 per-frame token indices, -1 on padding frames.
    """
    value = value.astype(jnp.float32)
    b, t_x, t_y = value.shape
    b_pad = -(-b // 8) * 8  # batch on sublanes: pad to the fp32 tile
    tb = _pick_block_rows(b_pad, t_x)
    n_t = -(-t_y // tb)
    t_y_pad = n_t * tb

    value_tm = jnp.transpose(value, (2, 0, 1))  # (Ty, B, Tx) time-major
    value_tm = jnp.pad(
        value_tm,
        ((0, t_y_pad - t_y), (0, b_pad - b), (0, 0)),
        constant_values=NEG_INF,
    )
    xlen_b = jnp.broadcast_to(
        jnp.pad(x_lengths.astype(jnp.int32), (0, b_pad - b), constant_values=1)[
            :, None
        ],
        (b_pad, 128),
    )
    ylen_b = jnp.broadcast_to(
        jnp.pad(y_lengths.astype(jnp.int32), (0, b_pad - b))[:, None],
        (b_pad, 128),
    )

    whole = pl.BlockSpec((b_pad, 128), lambda t: (0, 0), memory_space=pltpu.VMEM)
    stream = pl.BlockSpec(
        (tb, b_pad, t_x), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
    )
    stream_rev = pl.BlockSpec(
        (tb, b_pad, t_x),
        lambda t: (pl.num_programs(0) - 1 - t, 0, 0),
        memory_space=pltpu.VMEM,
    )
    idx_rev = pl.BlockSpec(
        (tb, b_pad, 128),
        lambda t: (pl.num_programs(0) - 1 - t, 0, 0),
        memory_space=pltpu.VMEM,
    )

    dec = pl.pallas_call(
        _fwd_kernel,
        grid=(n_t,),
        in_specs=[whole, whole, stream],
        out_specs=stream,
        out_shape=jax.ShapeDtypeStruct((t_y_pad, b_pad, t_x), jnp.int32),
        scratch_shapes=[pltpu.VMEM((b_pad, t_x), jnp.float32)],
        interpret=interpret,
    )(xlen_b, ylen_b, value_tm)

    idx = pl.pallas_call(
        _bwd_kernel,
        grid=(n_t,),
        in_specs=[whole, whole, stream_rev],
        out_specs=idx_rev,
        out_shape=jax.ShapeDtypeStruct((t_y_pad, b_pad, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((b_pad, 1), jnp.int32)],
        interpret=interpret,
    )(xlen_b, ylen_b, dec)

    return jnp.transpose(idx[:t_y, :b, 0], (1, 0))


def maximum_path_indices_pallas_sharded(
    value: jax.Array,
    x_lengths: jax.Array,
    y_lengths: jax.Array,
    mesh,
    axis: str = "data",
    *,
    interpret: bool = False,
) -> jax.Array:
    """Pallas MAS under a data-parallel mesh via shard_map.

    MAS is independent per batch element, so each device runs the kernel
    on its LOCAL batch shard — no collectives, no global (B, Tx, Ty)
    materialization.  This is how the kernel composes with the
    GSPMD-sharded train step: a bare pallas_call inside a sharded jit has
    no partitioning rule, but inside shard_map it sees only local shapes.
    (Mirrors how the reference's Triton kernel would be used under DDP —
    per-rank local batches.)
    """
    from jax.sharding import PartitionSpec as P

    spec = P(axis)
    return jax.shard_map(
        lambda v, xl, yl: maximum_path_indices_pallas(
            v, xl, yl, interpret=interpret
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        # pallas_call's out_shape carries no varying-mesh-axes annotation;
        # per-shard independence makes the check unnecessary here
        check_vma=False,
    )(value, x_lengths, y_lengths)

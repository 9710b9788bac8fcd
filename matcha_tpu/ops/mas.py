"""Monotonic Alignment Search (MAS) on TPU.

The reference offloads MAS to `super_monotonic_align`, an external Triton GPU
kernel (reference: matcha/models/matcha_tts.py:10,199).  Here MAS is built
TPU-native as a wavefront dynamic program:

  * forward pass: one `lax.scan` over mel frames; each step updates the whole
    (B, Tx) score column with vectorized max/add (VPU work, no host syncs)
  * backward pass: a reverse `lax.scan` that materializes the binary path
    from the stored per-step decisions via one-hot/gather — no data-dependent
    Python control flow, so the whole thing lives inside one jit program.

Everything runs in fp32: bf16 cannot distinguish near-tied alignment paths,
which destabilizes duration targets late in training (reference:
matcha/models/matcha_tts.py:97-106, documentation/prior_problem.md).

A numpy oracle (`maximum_path_numpy`) implements the textbook O(Tx*Ty) DP and
anchors the property tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9


def maximum_path_numpy(value: np.ndarray, x_len: int, y_len: int) -> np.ndarray:
    """Reference DP oracle for one (Tx, Ty) log-prior matrix.

    Finds the monotonic, surjective alignment path maximizing the summed
    log-prior: starts at (0, 0), ends at (x_len-1, y_len-1), each mel frame
    advances the text index by 0 or 1.
    """
    t_x, t_y = value.shape
    f = np.full((t_x, t_y), -np.inf, dtype=np.float64)
    f[0, 0] = value[0, 0]
    for j in range(1, y_len):
        for i in range(min(j + 1, x_len)):
            stay = f[i, j - 1]
            diag = f[i - 1, j - 1] if i > 0 else -np.inf
            f[i, j] = value[i, j] + max(stay, diag)
    path = np.zeros((t_x, t_y), dtype=np.float32)
    i = x_len - 1
    for j in range(y_len - 1, -1, -1):
        path[i, j] = 1.0
        if i > 0 and (i == j or f[i - 1, j - 1] >= f[i, j - 1]):
            i -= 1
    return path


@jax.jit
def maximum_path_indices(
    value: jax.Array, x_lengths: jax.Array, y_lengths: jax.Array
) -> jax.Array:
    """Batched MAS returning per-frame token indices.

    Args:
        value: (B, Tx, Ty) fp32 log-prior scores.
        x_lengths: (B,) valid token counts.
        y_lengths: (B,) valid mel-frame counts.
    Returns:
        (B, Ty) int32 — the aligned token index for each mel frame, or -1
        for frames beyond ``y_lengths``.

    This compact form is what training actually consumes: durations are a
    histogram of the indices and the prior assembly ``mu_y = mu_x[idx]`` is
    a gather — O(B·Ty·C) instead of the O(B·Tx·Ty·C) dense-path matmul.
    The backward scan carries only a (B,) cursor and emits (B,) indices per
    step, avoiding the (B, Tx, Ty) one-hot materialization + transpose that
    dominated the dense formulation's runtime on TPU.
    """
    value = value.astype(jnp.float32)
    b, t_x, t_y = value.shape
    x_lengths = x_lengths.astype(jnp.int32)
    y_lengths = y_lengths.astype(jnp.int32)

    rows = jnp.arange(t_x, dtype=jnp.int32)
    row_valid = rows[None, :] < x_lengths[:, None]  # (B, Tx)

    # --- forward: scan over mel frames, carry the DP score column ---
    f0 = jnp.where(rows[None, :] == 0, value[:, :, 0], NEG_INF)

    def fwd(f_prev, v_col):
        shifted = jnp.pad(
            f_prev[:, :-1], ((0, 0), (1, 0)), constant_values=NEG_INF
        )
        take_diag = shifted >= f_prev  # came from (i-1, j-1)?
        f = v_col + jnp.maximum(f_prev, shifted)
        f = jnp.where(row_valid, f, NEG_INF)
        return f, take_diag

    v_cols = jnp.moveaxis(value[:, :, 1:], -1, 0)  # (Ty-1, B, Tx)
    _, decisions = jax.lax.scan(fwd, f0, v_cols)  # (Ty-1, B, Tx) bool

    # --- backward: walk from (x_len-1, y_len-1) back to (0, 0) ---
    # Iterate j = Ty-1 .. 0.  Before the path starts (j >= y_len) the cursor
    # is parked at x_len-1 and -1 is emitted.
    cols = jnp.arange(t_y, dtype=jnp.int32)

    def bwd(i_cursor, inputs):
        j, dec_col = inputs  # dec_col: (B, Tx) decision for step j-1 -> j
        active = j < y_lengths  # (B,)
        took_diag = jnp.take_along_axis(
            dec_col, i_cursor[:, None], axis=1
        )[:, 0]
        step_down = active & (j > 0) & (i_cursor > 0) & took_diag
        out_idx = jnp.where(active, i_cursor, -1)
        return i_cursor - step_down.astype(jnp.int32), out_idx

    # decision columns indexed by j (j=0 has no incoming transition)
    dec_by_j = jnp.concatenate(
        [jnp.zeros((1, b, t_x), dtype=bool), decisions], axis=0
    )
    _, idx_rev = jax.lax.scan(
        bwd, x_lengths - 1, (cols[::-1], dec_by_j[::-1])
    )
    return jnp.transpose(idx_rev[::-1])  # (B, Ty)


def durations_from_indices(idx: jax.Array, t_x: int) -> jax.Array:
    """(B, Ty) frame→token indices → (B, Tx) per-token frame counts."""
    oh = jax.nn.one_hot(idx, t_x, dtype=jnp.float32)  # -1 rows are all-zero
    return jnp.sum(oh, axis=1)


# mesh registry for the opt-in shard_map'ed Pallas path: set by the trainer
# before tracing (static for the process), consulted at trace time
_SHARD_MESH = None
_SHARD_AXIS = "data"


def set_mas_shard_mesh(mesh, axis: str = "data") -> None:
    """Register the mesh for ``mas_backend="pallas_shard_map"`` dispatch."""
    global _SHARD_MESH, _SHARD_AXIS
    _SHARD_MESH = mesh
    _SHARD_AXIS = axis


def maximum_path_indices_auto(
    value: jax.Array,
    x_lengths: jax.Array,
    y_lengths: jax.Array,
    backend: str = "auto",
) -> jax.Array:
    """Backend-dispatched MAS: the Pallas kernel on TPU (~2× the scan at
    training shapes — measured 1.69 vs 3.37 ms at B=32, Tx=128, Ty=1024 on
    v5e), the portable `lax.scan` wavefront everywhere else.

    ``backend``: "auto" | "pallas" | "scan" (cfg.mas_backend).  The choice
    is made at trace time (static under jit), so this is safe to call from
    inside a jitted training step.  Multi-chip mesh steps must pass "scan"
    — see MatchaConfig.mas_backend.
    """
    if backend == "pallas_shard_map":
        if _SHARD_MESH is None:
            raise ValueError(
                "mas_backend='pallas_shard_map' needs set_mas_shard_mesh() "
                "(the mesh Trainer registers it automatically)"
            )
        # the kernel shards over the batch axis only, so divisibility is
        # against the data-axis size (== device count on a 1-D mesh; under
        # a 2-D (data, model) TP mesh the model axis replicates the DP)
        n_dev = _SHARD_MESH.shape[_SHARD_AXIS]
        if value.shape[0] % n_dev != 0:
            # init-time tracing uses tiny dummy batches; real mesh batches
            # are always device-multiples (sampler guarantees it)
            return maximum_path_indices(value, x_lengths, y_lengths)
        from matcha_tpu.ops.mas_pallas import (
            maximum_path_indices_pallas_sharded,
        )

        return maximum_path_indices_pallas_sharded(
            value,
            x_lengths,
            y_lengths,
            _SHARD_MESH,
            _SHARD_AXIS,
            # Mosaic on TPU shards, interpreter elsewhere (hermetic tests)
            interpret=jax.default_backend() != "tpu",
        )
    use_pallas = backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from matcha_tpu.ops.mas_pallas import maximum_path_indices_pallas

        return maximum_path_indices_pallas(value, x_lengths, y_lengths)
    return maximum_path_indices(value, x_lengths, y_lengths)


@jax.jit
def maximum_path(
    value: jax.Array, x_lengths: jax.Array, y_lengths: jax.Array
) -> jax.Array:
    """Dense-path MAS: (B, Tx, Ty) binary alignment (compat wrapper)."""
    idx = maximum_path_indices(value, x_lengths, y_lengths)
    t_x = value.shape[1]
    path = jax.nn.one_hot(idx, t_x, dtype=jnp.float32)  # (B, Ty, Tx)
    return jnp.transpose(path, (0, 2, 1))


# ---------------------------------------------------------------------------
# segment-DP formulation: scan over TOKENS instead of frames
# ---------------------------------------------------------------------------

def _cummax_with_arg(h: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Cumulative (max, argmax) along axis 1 of (B, Ty), log-depth."""
    t_y = h.shape[1]
    idx = jnp.broadcast_to(jnp.arange(t_y, dtype=jnp.int32)[None, :], h.shape)

    def combine(left, right):
        lm, la = left
        rm, ra = right
        take_r = rm >= lm
        return jnp.where(take_r, rm, lm), jnp.where(take_r, ra, la)

    return jax.lax.associative_scan(combine, (h, idx), axis=1)


@jax.jit
def maximum_path_durations(
    value: jax.Array, x_lengths: jax.Array, y_lengths: jax.Array
) -> jax.Array:
    """Batched MAS returning per-token durations, via a segment DP.

    Equivalent optimum to `maximum_path_indices` but with 2·Tx sequential
    steps instead of 2·Ty: let e[i][j] be the best score with token i ending
    exactly at frame j and R[i] the per-token prefix sums; then

        e[i] = R[i] + shift1( cummax_j( e[i-1] - R[i] ) )

    where the cummax (with argmax, for backtracking) is a log-depth
    `associative_scan` over frames — fully vectorized.  For speech, Tx is
    typically 4x smaller than the fine-resolution Ty, so the wall-clock of
    the sequential wavefront drops accordingly (ties may resolve to a
    different — equally optimal — path than the frame DP).

    Returns:
        (B, Tx) int32 frame counts per token (0 on padding tokens).
    """
    value = value.astype(jnp.float32)
    b, t_x, t_y = value.shape
    x_lengths = x_lengths.astype(jnp.int32)
    y_lengths = y_lengths.astype(jnp.int32)

    prefix = jnp.cumsum(value, axis=2)  # R[i, j] = sum_{t<=j} value[i, t]
    e0 = prefix[:, 0, :]  # token 0 ends at j

    def fwd(e_prev, r_i):
        h = e_prev - r_i
        cm, am = _cummax_with_arg(h)
        cm = jnp.pad(cm[:, :-1], ((0, 0), (1, 0)), constant_values=NEG_INF)
        am = jnp.pad(am[:, :-1], ((0, 0), (1, 0)))
        return r_i + cm, am

    r_rows = jnp.moveaxis(prefix[:, 1:, :], 1, 0)  # (Tx-1, B, Ty)
    _, args = jax.lax.scan(fwd, e0, r_rows)  # args: (Tx-1, B, Ty) int32
    args = jnp.concatenate([jnp.zeros((1, b, t_y), jnp.int32), args], axis=0)

    # --- backtrack over tokens: j walks the segment ends right-to-left ---
    rows = jnp.arange(t_x, dtype=jnp.int32)

    def bwd(j_cur, inputs):
        i, arg_row = inputs  # arg_row: (B, Ty)
        active = i < x_lengths
        is_last = i == x_lengths - 1
        j_here = jnp.where(is_last, y_lengths - 1, j_cur)
        k = jnp.take_along_axis(arg_row, j_here[:, None], axis=1)[:, 0]
        dur = jnp.where(
            active, jnp.where(i > 0, j_here - k, j_here + 1), 0
        )
        j_next = jnp.where(active & (i > 0), k, j_here)
        return j_next, dur

    _, durs_rev = jax.lax.scan(
        bwd,
        y_lengths - 1,
        (rows[::-1], jnp.moveaxis(args, 0, 0)[::-1]),
    )
    return jnp.transpose(durs_rev[::-1]).astype(jnp.int32)  # (B, Tx)

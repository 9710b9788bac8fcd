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

import functools

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


@functools.partial(jax.jit, static_argnames=())
def maximum_path(
    value: jax.Array, x_lengths: jax.Array, y_lengths: jax.Array
) -> jax.Array:
    """Batched MAS.

    Args:
        value: (B, Tx, Ty) fp32 log-prior scores.
        x_lengths: (B,) valid token counts.
        y_lengths: (B,) valid mel-frame counts.
    Returns:
        (B, Tx, Ty) binary alignment path (fp32), zero outside valid regions.
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
    # Iterate j = Ty-1 .. 0.  Before the path starts (j >= y_len) emit zeros;
    # the cursor is parked at x_len-1 so it is already correct at activation.
    cols = jnp.arange(t_y, dtype=jnp.int32)

    def bwd(i_cursor, inputs):
        j, dec_col = inputs  # dec_col: (B, Tx) decision for step j-1 -> j
        active = j < y_lengths  # (B,)
        row = jax.nn.one_hot(i_cursor, t_x, dtype=jnp.float32)
        row = jnp.where(active[:, None], row, 0.0)
        took_diag = jnp.take_along_axis(
            dec_col, i_cursor[:, None], axis=1
        )[:, 0]
        step_down = active & (j > 0) & (i_cursor > 0) & took_diag
        return i_cursor - step_down.astype(jnp.int32), row

    # decision columns indexed by j (j=0 has no incoming transition)
    dec_by_j = jnp.concatenate(
        [jnp.zeros((1, b, t_x), dtype=bool), decisions], axis=0
    )
    _, rows_rev = jax.lax.scan(
        bwd, x_lengths - 1, (cols[::-1], dec_by_j[::-1])
    )
    path = jnp.moveaxis(rows_rev[::-1], 0, 2)  # (B, Tx, Ty)
    return path * row_valid[:, :, None].astype(jnp.float32)

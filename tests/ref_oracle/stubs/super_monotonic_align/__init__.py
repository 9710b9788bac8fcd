"""Numpy oracle for super_monotonic_align.maximum_path.

Independent reimplementation of the glow-tts monotonic-alignment-search DP
(the algorithm the reference's Triton kernel computes on GPU;
matcha/models/matcha_tts.py:10,199).  Deliberately written from the DP
recurrence — not imported from matcha_tpu — so the parity tests compare two
independent MAS implementations.
"""

import numpy as np
import torch

_NEG = -1e9


def _maximum_path_each(value: np.ndarray, t_x: int, t_y: int) -> np.ndarray:
    """DP over one (T_x, T_y) score matrix; returns the binary path."""
    q = value[:t_x, :t_y].astype(np.float64).copy()
    for y in range(t_y):
        lo = max(0, t_x + y - t_y)
        hi = min(t_x, y + 1)
        for x in range(lo, hi):
            v_cur = _NEG if x == y else q[x, y - 1]          # stay on token x
            if x == 0:
                v_prev = 0.0 if y == 0 else _NEG             # path start
            else:
                v_prev = q[x - 1, y - 1]                     # advance token
            q[x, y] += max(v_prev, v_cur)

    path = np.zeros_like(value, dtype=np.float64)
    index = t_x - 1
    for y in range(t_y - 1, -1, -1):
        path[index, y] = 1.0
        if index != 0 and (index == y or q[index, y - 1] < q[index - 1, y - 1]):
            index -= 1
    return path


def maximum_path(value, attn_mask, dtype=None):
    """(B, T_x, T_y) scores + int mask → (B, T_x, T_y) binary path."""
    v = value.detach().cpu().numpy()
    m = attn_mask.detach().cpu().numpy()
    out = np.zeros_like(v, dtype=np.float64)
    for b in range(v.shape[0]):
        t_x = int(m[b].any(axis=1).sum())
        t_y = int(m[b].any(axis=0).sum())
        out[b] = _maximum_path_each(v[b], t_x, t_y)
    res = torch.from_numpy(out).to(value.device)
    return res.to(dtype if dtype is not None else value.dtype)

"""Shape/alignment math shared across the framework.

JAX-native equivalents of the reference helpers (matcha/utils/model.py).
Everything here is shape-polymorphic only in *static* shapes: the functions
are pure and jit-safe, masks carry the dynamic lengths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NUM_UNET_DOWNSAMPLES = 1  # len(decoder channels) - 1; see configs/model.py


def sequence_mask(lengths: jax.Array, max_length: int) -> jax.Array:
    """(B,) lengths → (B, max_length) boolean mask (True = valid)."""
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def fix_len_compatibility(length: int, num_downsamples: int = NUM_UNET_DOWNSAMPLES) -> int:
    """Round a frame count up so the U-Net can halve it cleanly.

    Host-side (static) version; the TPU build always computes padded bucket
    lengths on the host so compiled shapes stay static
    (reference: matcha/utils/model.py:15-21).
    """
    factor = 2 ** num_downsamples
    return int(-(-length // factor) * factor)


def generate_path(duration: jax.Array, mask: jax.Array) -> jax.Array:
    """Durations → hard monotonic alignment map via the cumsum trick.

    Args:
        duration: (B, Tx) integer frame counts per token.
        mask: (B, Tx, Ty) attention mask.
    Returns:
        (B, Tx, Ty) binary path; row i is 1 on frames [cum[i-1], cum[i]).

    Fully vectorized (two cumsum-style ops), so it maps straight onto the VPU
    with no sequential loop (reference: matcha/utils/model.py:24-40).
    """
    b, t_x, t_y = mask.shape
    cum = jnp.cumsum(duration.astype(jnp.int32), axis=1)  # (B, Tx)
    pos = jnp.arange(t_y, dtype=jnp.int32)
    upper = pos[None, None, :] < cum[:, :, None]  # frames before end of token i
    prev = jnp.concatenate([jnp.zeros((b, 1), jnp.int32), cum[:, :-1]], axis=1)
    lower = pos[None, None, :] >= prev[:, :, None]  # frames at/after start
    return (upper & lower).astype(mask.dtype) * mask


def normalize(data: jax.Array, mean: float, std: float) -> jax.Array:
    """Corpus-global standardization; invertible without per-utterance stats."""
    return (data - mean) / std


def denormalize(data: jax.Array, mean: float, std: float) -> jax.Array:
    return data * std + mean


def downsample_time(x: jax.Array) -> jax.Array:
    """Halve time resolution with overlapping 3-frame averaging.

    Equivalent to avg_pool1d(kernel=3, stride=2, padding=1) with
    count_include_pad=True semantics: edge windows still divide by 3
    (reference: matcha/utils/model.py:57-68 — the overlapping variant was
    chosen over pairwise pooling because it "sounds great").

    Args:
        x: (B, T, C) fine-resolution features (hop 128).
    Returns:
        (B, ceil(T/2), C) coarse features (hop 256).
    """
    b, t, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1 + t % 2), (0, 0)))
    windows = xp[:, 0:-2:2] + xp[:, 1:-1:2] + xp[:, 2::2]
    return windows / 3.0

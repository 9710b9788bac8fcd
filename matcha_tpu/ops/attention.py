"""Masked self-attention with a fused Pallas TPU (flash) path.

The einsum formulation materializes (B, H, T, T) fp32 logits in HBM — at the
production serving point (B=16, T=512, 5 heads) that is ~84 MB per
transformer block and ~2 GB of HBM traffic per U-Net evaluation, the
dominant device-time term of stage B (documentation/performance.md).  The
flash path runs the standard streaming-softmax kernel
(jax.experimental.pallas.ops.tpu.flash_attention) so logits never leave
VMEM; it is numerically the same computation with fp32 accumulation.

This mirrors the reference, which leans on torch SDPA's fused kernels in
both the encoder (text_encoder.py:231) and the decoder (diffusers
Attention), falling back to a materializing implementation when masks rule
the fused kernel out.

Backend resolution ("auto"):
  * "flash" on TPU backends when the seq len is long enough that the
    materialized logits' HBM round-trip dominates (>= 1024, measured
    crossover below) and the static shape fits the kernel's tiling
    (seq multiple of 128, head_dim lane-friendly);
  * "einsum" everywhere else (short buckets — XLA's fused attention wins
    there — CPU test meshes, tiny configs, odd buckets).

Padding semantics match the einsum path exactly: PADDED KEYS are excluded
from every softmax; all query rows (valid or padded) attend the same valid
keys, so padded-row outputs are finite and downstream masks dispose of
them.  Implemented with segment ids — queries carry segment 0, valid keys
segment 0, padded keys segment 1.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

# head dims verified to compile & match einsum on v5e (see
# tests/test_attention.py TPU tier); extend after testing new widths
_FLASH_HEAD_DIMS = (32, 48, 64, 96, 128, 256)
_SEQ_ALIGN = 128  # flash kernel MIN_BLOCK_SIZE

# Measured per-call device time on v5e (inner-repeat probe, B=16, H=5,
# D=64, bf16; /tmp reproduction script preserved in
# documentation/performance.md):
#
#     T      einsum     flash
#     256    0.26 ms    0.08 ms   (noise floor — both trivial)
#     512    0.12 ms    0.25 ms   einsum wins (XLA's fused attention)
#     1024   0.70 ms    0.26 ms   flash 2.7x
#     2048   4.35 ms    1.45 ms   flash 3.0x
#     4096  17.2  ms    6.6  ms   flash 2.6x
#
# Below _FLASH_MIN_SEQ the materialized (B,H,T,T) logits still fit cache-
# friendly tiles and XLA's fusion beats the Pallas kernel's grid overhead;
# above it the logits' HBM round-trip dominates and the streaming kernel
# wins.  End-to-end A/B at the serving headline (coarse mel 512) confirmed
# flash there is a ~7 ms/stage-B regression — hence the threshold.
_FLASH_MIN_SEQ = 1024


def resolve_backend(backend: str, q_shape: tuple[int, ...]) -> str:
    """'auto' → 'flash' | 'einsum' for a (B, H, T, D) self-attention."""
    if backend in ("einsum", "flash"):
        return backend
    if backend != "auto":
        raise ValueError(f"Unknown attention backend {backend!r}")
    _, _, t, d = q_shape
    if (
        jax.default_backend() == "tpu"
        and t >= _FLASH_MIN_SEQ
        and t % _SEQ_ALIGN == 0
        and d in _FLASH_HEAD_DIMS
    ):
        return "flash"
    return "einsum"


def _block(n: int) -> int:
    """Largest flash block size that divides the (128-aligned) seq len."""
    for b in (512, 256, 128):
        if n % b == 0:
            return b
    raise ValueError(f"seq len {n} not {_SEQ_ALIGN}-aligned")


@functools.lru_cache(maxsize=None)
def _block_sizes(t: int):
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    bq = bk = _block(t)
    return BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk,
        block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )


def masked_self_attention(
    q: jax.Array,          # (B, H, T, D)
    k: jax.Array,          # (B, H, T, D)
    v: jax.Array,          # (B, H, T, D)
    key_valid: jax.Array,  # (B, T) 1.0 = real token, 0.0 = padding
    *,
    backend: str = "auto",
) -> jax.Array:
    """Softmax(q·kᵀ/√D masked to valid keys)·v, fused when possible.

    Returns (B, H, T, D) in v's dtype.  No dropout — callers needing
    attention-prob dropout (the reference ENCODER trains with SDPA
    dropout_p, text_encoder.py:234) must use the einsum path directly.
    """
    scale = 1.0 / math.sqrt(q.shape[-1])
    resolved = resolve_backend(backend, q.shape)
    if resolved == "flash":
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            SegmentIds,
            flash_attention,
        )

        b, _, t, _ = q.shape
        q_seg = jnp.zeros((b, t), jnp.int32)
        kv_seg = jnp.where(key_valid > 0, 0, 1).astype(jnp.int32)
        out = flash_attention(
            q, k, v,
            segment_ids=SegmentIds(q=q_seg, kv=kv_seg),
            sm_scale=scale,
            block_sizes=_block_sizes(t),
        )
        return out.astype(v.dtype)

    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    logits = jnp.where(key_valid[:, None, None, :] > 0, logits, -jnp.inf)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)

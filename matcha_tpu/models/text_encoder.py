"""Text encoder: phoneme embeddings → acoustic prior mu_x + log-durations.

TPU-native redesign of the reference encoder stack
(reference: matcha/models/components/text_encoder.py:319-406):

  embed (x sqrt(C)) → ConvSiluNorm prenet (6 layers, residual)
  → concat broadcast speaker embedding → transformer encoder
    (RoPE on half the head dims, post-norm residuals, conv-FFN k=5)
  → proj_m head (conv-SiLU-conv)  and  FiLM duration predictor on a
    stop-gradient branch.

Design differences from the reference (all intentional, TPU-first):
  * time-major (B, T, C) layout so channels live on the TPU lane dimension;
    "Conv1d" is flax nn.Conv over the time axis (lowered to MXU matmuls)
  * attention is a plain fused-einsum SDPA with an additive mask — XLA fuses
    QK^T → softmax → V for these short (≤4000) sequences; no torch.compile
    needed because the entire text→wav graph is jitted at a higher level
  * RoPE cos/sin caches are module constants, sliced statically per bucket
  * dropout via linen's `deterministic` flag; no module mutation.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from matcha_tpu.models.config import DurationPredictorConfig, EncoderConfig
from matcha_tpu.ops.attention import masked_self_attention


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis of (B, T, C) activations.

    Equivalent to the reference's channel-dim LayerNorm on (B, C, T)
    (reference: text_encoder.py:10-27) — in time-major layout it is just a
    last-axis LayerNorm.  Statistics are always fp32; the affine output is
    cast back to ``dtype``.
    """

    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    # autocast semantics (EncoderConfig.fp32_residual): norm outputs stay
    # fp32 so the post-norm residual carry is never bf16-rounded
    f32_out: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        gamma = self.param("gamma", nn.initializers.ones, (x.shape[-1],))
        beta = self.param("beta", nn.initializers.zeros, (x.shape[-1],))
        out_dtype = jnp.float32 if self.f32_out else self.dtype
        return (y * gamma + beta).astype(out_dtype)


class ConvSiluNorm(nn.Module):
    """Residual conv prenet: n x [masked conv → LayerNorm → SiLU → dropout].

    (reference: text_encoder.py:30-62)
    """

    hidden_channels: int
    out_channels: int
    kernel_size: int
    n_layers: int
    p_dropout: float
    dtype: jnp.dtype = jnp.float32
    f32_carry: bool = False

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool = True):
        x_org = x
        h = x
        m = mask[..., None].astype(self.dtype)
        for _ in range(self.n_layers):
            h = nn.Conv(
                self.hidden_channels, (self.kernel_size,), padding="SAME",
                dtype=self.dtype,
            )(h * m)
            h = ChannelLayerNorm(dtype=self.dtype, f32_out=self.f32_carry)(h)
            h = nn.silu(h)
            h = nn.Dropout(self.p_dropout)(h, deterministic=deterministic)
        proj = nn.Conv(
            self.out_channels, (1,), kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
        )
        return (x_org + proj(h)) * m


def rope_cache(max_len: int, rot_dim: int, base: float = 10_000.0):
    """Precompute RoPE cos/sin tables of shape (max_len, rot_dim).

    ``rot_dim`` is the number of per-head dims rotated (half the head size;
    reference applies RoPE to the first half only, text_encoder.py:199).
    The table duplicates the theta ramp across both halves of rot_dim,
    matching the labml-style [x1, x2] pairing used by the reference.
    """
    theta = 1.0 / (base ** (np.arange(0, rot_dim, 2, dtype=np.float64) / rot_dim))
    angles = np.arange(max_len, dtype=np.float64)[:, None] * theta[None, :]
    angles = np.concatenate([angles, angles], axis=1)  # (max_len, rot_dim)
    return np.cos(angles).astype(np.float32), np.sin(angles).astype(np.float32)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array, rot_dim: int):
    """Rotate the first ``rot_dim`` dims of (B, H, T, Dh) queries/keys."""
    x_rope, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    half = rot_dim // 2
    neg_half = jnp.concatenate([-x_rope[..., half:], x_rope[..., :half]], axis=-1)
    t = x.shape[-2]
    rotated = x_rope * cos[:t][None, None] + neg_half * sin[:t][None, None]
    return jnp.concatenate([rotated, x_pass], axis=-1)


class RopeSelfAttention(nn.Module):
    """Multi-head self-attention with rotary embeddings on half the head dims.

    (reference: text_encoder.py:176-243 — conv1x1 q/k/v projections become
    dense layers in time-major layout; boolean padding mask excludes padding
    from the softmax entirely.)
    """

    channels: int
    n_heads: int
    rope_max_len: int
    p_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_backend: str = "auto"

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool = True):
        b, t, c = x.shape
        head_dim = self.channels // self.n_heads
        rot_dim = int(head_dim * 0.5)
        xavier = nn.initializers.xavier_uniform()

        q = nn.Dense(self.channels, kernel_init=xavier, name="q", dtype=self.dtype)(x)
        k = nn.Dense(self.channels, kernel_init=xavier, name="k", dtype=self.dtype)(x)
        v = nn.Dense(self.channels, kernel_init=xavier, name="v", dtype=self.dtype)(x)

        def split_heads(y):
            return y.reshape(b, t, self.n_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)

        cos_np, sin_np = rope_cache(self.rope_max_len, rot_dim)
        cos = jnp.asarray(cos_np, self.dtype)
        sin = jnp.asarray(sin_np, self.dtype)
        q = apply_rope(q, cos, sin, rot_dim)
        k = apply_rope(k, cos, sin, rot_dim)

        if deterministic or self.p_dropout == 0.0:
            # fused (flash) path on TPU — no attention-prob dropout needed
            out = masked_self_attention(q, k, v, mask, backend=self.attn_backend)
        else:
            # training: the reference runs SDPA with dropout_p on the
            # attention probabilities (text_encoder.py:231-235) — keep the
            # materializing path so dropout semantics match exactly
            scale = 1.0 / math.sqrt(head_dim)
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            key_valid = mask[:, None, None, :] > 0  # (B, 1, 1, T)
            logits = jnp.where(key_valid, logits, -jnp.inf)
            weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            weights = nn.Dropout(self.p_dropout)(
                weights, deterministic=deterministic
            )
            out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.channels)
        return nn.Dense(self.channels, name="out", dtype=self.dtype)(out)


class ConvFFN(nn.Module):
    """Position-wise FFN with kernel-5 convs for local phonetic context.

    (reference: text_encoder.py:246-258)
    """

    filter_channels: int
    out_channels: int
    kernel_size: int
    p_dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool = True):
        m = mask[..., None].astype(self.dtype)
        h = nn.Conv(
            self.filter_channels, (self.kernel_size,), padding="SAME",
            dtype=self.dtype,
        )(x * m)
        h = nn.relu(h)
        h = nn.Dropout(self.p_dropout)(h, deterministic=deterministic)
        h = nn.Conv(
            self.out_channels, (self.kernel_size,), padding="SAME",
            dtype=self.dtype,
        )(h * m)
        return h * m


class TransformerEncoder(nn.Module):
    """Post-norm transformer stack: [SDPA → LN → convFFN → LN] x n_layers.

    (reference: text_encoder.py:261-316)
    """

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    rope_max_len: int
    dtype: jnp.dtype = jnp.float32
    attn_backend: str = "auto"
    f32_carry: bool = False

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool = True):
        m = mask[..., None].astype(self.dtype)
        for _ in range(self.n_layers):
            x = x * m
            y = RopeSelfAttention(
                channels=self.hidden_channels,
                n_heads=self.n_heads,
                rope_max_len=self.rope_max_len,
                p_dropout=self.p_dropout,
                dtype=self.dtype,
                attn_backend=self.attn_backend,
            )(x, mask, deterministic=deterministic)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = ChannelLayerNorm(dtype=self.dtype, f32_out=self.f32_carry)(x + y)
            y = ConvFFN(
                filter_channels=self.filter_channels,
                out_channels=self.hidden_channels,
                kernel_size=self.kernel_size,
                p_dropout=self.p_dropout,
                dtype=self.dtype,
            )(x, mask, deterministic=deterministic)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = ChannelLayerNorm(dtype=self.dtype, f32_out=self.f32_carry)(x + y)
        return x * m


class DurationPredictor(nn.Module):
    """Stacked convs with FiLM speaker conditioning → per-token log-duration.

    FiLM gamma/beta come from a zero-initialized projection so conditioning
    starts as identity (reference: text_encoder.py:64-112).  Input is the
    stop-gradient encoder output — the caller handles the detach.
    """

    cfg: DurationPredictorConfig
    dtype: jnp.dtype = jnp.float32
    f32_carry: bool = False

    @nn.compact
    def __call__(self, x, mask, spk_emb, *, deterministic: bool = True):
        fc = self.cfg.filter_channels
        film = nn.Dense(
            2 * fc,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.concatenate(
                [jnp.ones((fc,), dtype), jnp.zeros((fc,), dtype)]
            ),
            name="spk_proj",
            dtype=self.dtype,
        )(spk_emb)
        gamma, beta = jnp.split(film[:, None, :], 2, axis=-1)  # (B, 1, fc)

        m = mask[..., None].astype(self.dtype)
        h = x
        for _ in range(self.cfg.n_layers):
            h = nn.Conv(
                fc, (self.cfg.kernel_size,), padding="SAME", dtype=self.dtype
            )(h * m)
            h = nn.relu(h)
            h = ChannelLayerNorm(dtype=self.dtype, f32_out=self.f32_carry)(h)
            h = h * gamma + beta
            h = nn.Dropout(self.cfg.p_dropout)(h, deterministic=deterministic)
        # the duration head runs fp32: log-durations feed a Huber loss whose
        # sub-0.1 differences vanish in bf16.  precision=HIGHEST: a TPU
        # fp32 conv at DEFAULT truncates to bf16 on the MXU (see
        # log_prior_scores in models/matcha.py)
        logw = nn.Conv(1, (1,), precision="highest")(
            h.astype(jnp.float32) * mask[..., None]
        )
        return logw[..., 0] * mask


class TextEncoder(nn.Module):
    """Full encoder: tokens → (mu_x, logw).

    (reference: text_encoder.py:319-406)
    """

    cfg: EncoderConfig
    dp_cfg: DurationPredictorConfig
    n_vocab: int
    spk_emb_dim: int
    dtype: jnp.dtype = jnp.float32
    attn_backend: str = "auto"

    @nn.compact
    def __call__(self, x_ids, x_mask, spk_enc, spk_dur, *, deterministic: bool = True):
        """
        Args:
            x_ids: (B, Tx) int phoneme IDs.
            x_mask: (B, Tx) float {0,1} validity mask.
            spk_enc / spk_dur: (B, spk_emb_dim) speaker embeddings for the
                encoder and duration-predictor branches.
        Returns:
            mu_x: (B, Tx, n_feats) predicted prior mel frames per token.
            logw: (B, Tx) log-durations (training target is log(2 + d)).
        """
        c = self.cfg.n_channels
        # autocast-style fp32 carry (EncoderConfig.fp32_residual): the
        # embedding/residual/norm stream stays fp32 under bf16 compute;
        # conv/dense modules still cast their inputs down per-module
        f32_carry = self.cfg.fp32_residual and self.dtype != jnp.float32
        carry = jnp.float32 if f32_carry else self.dtype
        emb = nn.Embed(
            self.n_vocab,
            c,
            embedding_init=nn.initializers.normal(stddev=c**-0.5),
            name="emb",
            dtype=carry,
        )
        x = emb(x_ids) * jnp.asarray(math.sqrt(c), carry)

        if self.cfg.prenet:
            x = ConvSiluNorm(
                hidden_channels=c,
                out_channels=c,
                kernel_size=self.cfg.prenet_kernel_size,
                n_layers=self.cfg.prenet_layers,
                p_dropout=self.cfg.p_dropout,
                name="prenet",
                dtype=self.dtype,
                f32_carry=f32_carry,
            )(x, x_mask, deterministic=deterministic)

        t = x.shape[1]
        spk_tiled = jnp.broadcast_to(
            spk_enc[:, None, :].astype(carry),
            (x.shape[0], t, self.spk_emb_dim),
        )
        x = jnp.concatenate([x, spk_tiled], axis=-1)

        x = TransformerEncoder(
            hidden_channels=c + self.spk_emb_dim,
            filter_channels=self.cfg.filter_channels,
            n_heads=self.cfg.n_heads,
            n_layers=self.cfg.n_layers,
            kernel_size=self.cfg.kernel_size,
            p_dropout=self.cfg.p_dropout,
            rope_max_len=self.cfg.rope_max_len,
            name="encoder",
            dtype=self.dtype,
            attn_backend=self.attn_backend,
            f32_carry=f32_carry,
        )(x, x_mask, deterministic=deterministic)

        # the mel head runs fp32: mu_x feeds the fp32 MAS/prior island.
        # precision=HIGHEST keeps these convs TRUE fp32 on the TPU MXU
        # (DEFAULT would truncate to bf16 — models/matcha.py)
        h = nn.Conv(c, (1,), name="proj_m_hidden", precision="highest")(
            x.astype(jnp.float32)
        )
        h = nn.silu(h)
        mu_x = nn.Conv(
            self.cfg.n_feats,
            (1,),
            kernel_init=nn.initializers.xavier_uniform(),
            name="proj_m_out",
            precision="highest",
        )(h)
        mu_x = mu_x * x_mask[..., None]

        # The duration branch must not shape the acoustic representation.
        logw = DurationPredictor(
            self.dp_cfg, name="proj_w", dtype=self.dtype, f32_carry=f32_carry
        )(
            jax.lax.stop_gradient(x), x_mask, spk_dur, deterministic=deterministic
        )
        return mu_x, logw

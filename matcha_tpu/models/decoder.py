"""CFM estimator: 1D U-Net over mel frames, conditioned on (mu, t).

TPU-native redesign of the reference decoder
(reference: matcha/models/components/decoder.py:202-427 and
matcha/models/components/transformer.py:14-303):

  input  [x ‖ mu]  (channel concat of noisy sample and encoder prior)
  down:  per stage  ResnetBlock1D(+t) → n_blocks x TransformerBlock → stride-2 conv
  mid:   num_mid_blocks x (ResnetBlock1D → blocks)
  up:    skip-concat → ResnetBlock1D → blocks → conv-transpose x2
  head:  Block1D → 1x1 conv

Everything is time-major (B, T, C); masks are (B, T) floats carried per
resolution (halved with ``mask[:, ::2]`` on downsample, exactly mirroring the
reference's mask bookkeeping so padding never leaks through convolutions).
The transformer block is pre-norm with a SnakeBeta feed-forward
(x + (1/b)·sin²(a·x), log-scale learnable a/b — reference transformer.py:14-77).

The whole module is one jit-able function of (x, mask, mu, t); the ODE loop
in flow_matching.py scans over it inside the same compiled program.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from matcha_tpu.models.config import DecoderConfig
from matcha_tpu.ops.attention import masked_self_attention


def mish(x: jax.Array) -> jax.Array:
    return x * jnp.tanh(jax.nn.softplus(x))


class SinusoidalTimeEmbedding(nn.Module):
    """t ∈ [0,1] → (B, dim) sinusoidal features, scale=1000.

    (reference: decoder.py:15-29)
    """

    dim: int

    @nn.compact
    def __call__(self, t: jax.Array, scale: float = 1000.0) -> jax.Array:
        half = self.dim // 2
        freqs = jnp.exp(
            jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1))
        )
        args = scale * t[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class TimestepMLP(nn.Module):
    """Two-layer SiLU MLP lifting the sinusoidal embedding.

    (reference: decoder.py:77-118)
    """

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb: jax.Array) -> jax.Array:
        h = nn.Dense(self.time_embed_dim, name="linear_1", dtype=self.dtype)(emb)
        h = nn.silu(h)
        return nn.Dense(self.time_embed_dim, name="linear_2", dtype=self.dtype)(h)


class Block1D(nn.Module):
    """Masked conv3 → GroupNorm(8) → Mish. (reference: decoder.py:32-45)

    ``masked_stats`` switches the GroupNorm statistics to VALID frames only.
    GroupNorm reduces over the time axis, so with plain stats the valid
    region's output depends on how much padding the bucket carries — the
    reference never sees this at inference because it runs unpadded exact
    lengths (B=1); masked stats at a padded bucket are numerically the
    reference's exact-length stats, making bucketed inference invariant to
    bucket choice and batch composition.  Training keeps plain stats: the
    reference trains on padded batches with unmasked GroupNorm, and loss
    parity is pinned to that behaviour.
    """

    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32
    masked_stats: bool = False
    f32_stats: bool = True
    # torch-autocast semantics: GroupNorm (and everything after it) in
    # fp32, only the conv itself in the compute dtype — see
    # DecoderConfig.fp32_residual
    f32_carry: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        m = mask[..., None].astype(self.dtype)
        h = nn.Conv(self.dim_out, (3,), padding="SAME", dtype=self.dtype)(x * m)
        # epsilon=1e-5 matches torch GroupNorm (flax defaults to 1e-6)
        norm_dtype = jnp.float32 if self.f32_carry else self.dtype
        gn = nn.GroupNorm(
            num_groups=self.groups, epsilon=1e-5, dtype=norm_dtype,
            force_float32_reductions=self.f32_stats,
        )
        if self.masked_stats:
            h = gn(h, mask=jnp.broadcast_to(mask[..., None] > 0, h.shape))
        else:
            h = gn(h)
        return mish(h) * m


class ResnetBlock1D(nn.Module):
    """Two Block1Ds with an additive time embedding and a 1x1 residual.

    (reference: decoder.py:48-64)
    """

    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32
    masked_stats: bool = False
    f32_stats: bool = True
    f32_carry: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array, t_emb: jax.Array) -> jax.Array:
        h = Block1D(
            self.dim_out, self.groups, dtype=self.dtype,
            masked_stats=self.masked_stats, f32_stats=self.f32_stats,
            f32_carry=self.f32_carry, name="block1",
        )(x, mask)
        # fp32 carry + bf16 Dense output promotes the sum to fp32 — exactly
        # autocast's "adds stay fp32" rule, no explicit cast needed
        h = h + nn.Dense(self.dim_out, name="time_proj", dtype=self.dtype)(
            mish(t_emb)
        )[:, None, :]
        h = Block1D(
            self.dim_out, self.groups, dtype=self.dtype,
            masked_stats=self.masked_stats, f32_stats=self.f32_stats,
            f32_carry=self.f32_carry, name="block2",
        )(h, mask)
        res = nn.Conv(self.dim_out, (1,), name="res_conv", dtype=self.dtype)(
            x * mask[..., None].astype(self.dtype)
        )
        return h + res


class SnakeBetaFFN(nn.Module):
    """Feed-forward with the SnakeBeta periodic activation.

    proj → x + (1/exp(b))·sin²(x·exp(a)) → dropout → proj
    (reference: transformer.py:14-121; mult=4, log-scale alpha/beta)
    """

    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        inner = self.dim * self.mult
        h = nn.Dense(inner, name="proj_in", dtype=self.dtype)(x)
        log_alpha = self.param("alpha", nn.initializers.zeros, (inner,))
        log_beta = self.param("beta", nn.initializers.zeros, (inner,))
        alpha = jnp.exp(log_alpha).astype(self.dtype)
        inv_beta = (1.0 / (jnp.exp(log_beta) + 1e-9)).astype(self.dtype)
        h = h + inv_beta * jnp.square(jnp.sin(h * alpha))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.dim, name="proj_out", dtype=self.dtype)(h)


class DecoderTransformerBlock(nn.Module):
    """Pre-norm block: LN → SDPA → LN → SnakeBeta FFN, residual both.

    (reference: transformer.py:123-303, diffusers-style without AdaNorm —
    the production config uses plain LayerNorm and self-attention only.)
    """

    dim: int
    num_heads: int
    head_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_backend: str = "auto"
    f32_stats: bool = True

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        # `deterministic` is positional-or-keyword so nn.remat can declare it
        # static (static_argnums is positional-only); it stays a Python bool.
        b, t, _ = x.shape
        inner = self.num_heads * self.head_dim

        # epsilon=1e-5 matches torch LayerNorm (flax defaults to 1e-6)
        h = nn.LayerNorm(
            name="norm1", epsilon=1e-5, dtype=self.dtype,
            force_float32_reductions=self.f32_stats,
        )(x)
        q = nn.Dense(inner, use_bias=False, name="to_q", dtype=self.dtype)(h)
        k = nn.Dense(inner, use_bias=False, name="to_k", dtype=self.dtype)(h)
        v = nn.Dense(inner, use_bias=False, name="to_v", dtype=self.dtype)(h)

        def split(y):
            return y.reshape(b, t, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)

        out = masked_self_attention(
            split(q), split(k), split(v), mask, backend=self.attn_backend
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, t, inner)
        # dropout sits AFTER the output projection, matching the reference's
        # diffusers Attention (to_out = [Linear, Dropout]) — SDPA there runs
        # with dropout_p=0, so attention probs are never dropped
        out = nn.Dense(self.dim, name="to_out", dtype=self.dtype)(out)
        x = x + nn.Dropout(self.dropout)(out, deterministic=deterministic)

        h = nn.LayerNorm(
            name="norm3", epsilon=1e-5, dtype=self.dtype,
            force_float32_reductions=self.f32_stats,
        )(x)
        x = x + SnakeBetaFFN(
            self.dim, dropout=self.dropout, dtype=self.dtype, name="ff"
        )(h, deterministic=deterministic)
        return x


class ConformerBlock(nn.Module):
    """Conformer alternative to the transformer block (reference:
    decoder.py:163-199 wraps lucidrains' ConformerBlock; selectable via
    DecoderConfig.block_type="conformer").

    Structure: 0.5·FFN → MHSA → depthwise conv module → 0.5·FFN → LN.
    """

    dim: int
    num_heads: int
    head_dim: int
    ff_mult: int = 1
    conv_expansion: int = 2
    conv_kernel: int = 31
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_backend: str = "auto"
    f32_stats: bool = True

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        # positional-or-keyword for nn.remat's static_argnums (see above)
        m = mask[..., None].astype(self.dtype)

        def _ln(name):
            return nn.LayerNorm(
                name=name, epsilon=1e-5, dtype=self.dtype,
                force_float32_reductions=self.f32_stats,
            )

        def ffn(h, name):
            h = _ln(f"{name}_norm")(h)
            h = nn.Dense(self.dim * self.ff_mult * 4, name=f"{name}_in", dtype=self.dtype)(h)
            h = nn.swish(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            return nn.Dense(self.dim, name=f"{name}_out", dtype=self.dtype)(h)

        x = x + 0.5 * ffn(x, "ff1")

        # MHSA
        h = _ln("attn_norm")(x)
        b, t, _ = h.shape
        inner = self.num_heads * self.head_dim
        q = nn.Dense(inner, name="to_q", dtype=self.dtype)(h)
        k = nn.Dense(inner, name="to_k", dtype=self.dtype)(h)
        v = nn.Dense(inner, name="to_v", dtype=self.dtype)(h)

        def split(y):
            return y.reshape(b, t, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)

        out = masked_self_attention(
            split(q), split(k), split(v), mask, backend=self.attn_backend
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, t, inner)
        x = x + nn.Dense(self.dim, name="to_out", dtype=self.dtype)(out)

        # conv module: LN → pointwise glu → depthwise → swish → pointwise
        h = _ln("conv_norm")(x)
        h = nn.Dense(self.dim * self.conv_expansion * 2, name="conv_in", dtype=self.dtype)(h)
        a, g = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(g)
        h = nn.Conv(
            self.dim * self.conv_expansion, (self.conv_kernel,), padding="SAME",
            feature_group_count=self.dim * self.conv_expansion,
            name="conv_dw", dtype=self.dtype,
        )(h * m)
        h = nn.swish(h)
        h = nn.Dense(self.dim, name="conv_out", dtype=self.dtype)(h)
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)

        x = x + 0.5 * ffn(x, "ff2")
        return _ln("final_norm")(x)


class Downsample1D(nn.Module):
    """Stride-2 conv halving the time axis. (reference: decoder.py:67-73)"""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(
            self.dim, (3,), strides=(2,), padding=((1, 1),), dtype=self.dtype
        )(x)


class Upsample1D(nn.Module):
    """ConvTranspose(k=4, s=2, p=1) doubling the time axis.

    (reference: decoder.py:121-160, use_conv_transpose=True path)
    """

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.ConvTranspose(
            self.dim, (4,), strides=(2,), padding="SAME", transpose_kernel=True,
            dtype=self.dtype,
        )(x)


class Decoder(nn.Module):
    """U-Net velocity estimator v(x, t | mu)."""

    cfg: DecoderConfig
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    attn_backend: str = "auto"

    @nn.compact
    def __call__(
        self, x, mask, mu, t, *, deterministic: bool = True,
        masked_norm: bool = False,
    ):
        """
        Args:
            x: (B, T, n_feats) current ODE state (noisy mel).
            mask: (B, T) validity mask; T must be divisible by
                2**num_downsamples (host-side bucketing guarantees this).
            mu: (B, T, n_feats) encoder prior (conditioning).
            t: (B,) or scalar ODE time in [0, 1].
        Returns:
            (B, T, n_feats) predicted velocity.
        """
        cfg = self.cfg
        f32_stats = not cfg.bf16_norm_stats
        # autocast-style mixed precision (DecoderConfig.fp32_residual): the
        # residual carry between blocks/stages stays fp32; matmul/conv
        # modules still take bf16 inputs (flax casts down per-module), so
        # the MXU work is unchanged — only the stream's rounding points go.
        f32_carry = cfg.fp32_residual and self.dtype != jnp.float32
        carry = jnp.float32 if f32_carry else self.dtype
        in_ch = x.shape[-1] + mu.shape[-1]
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (x.shape[0],))
        t_emb = SinusoidalTimeEmbedding(in_ch, name="time_embeddings")(t)
        t_emb = TimestepMLP(
            cfg.channels[0] * 4, dtype=self.dtype, name="time_mlp"
        )(t_emb)

        h = jnp.concatenate([x, mu], axis=-1).astype(carry)

        # cfg.remat: jax.checkpoint each block so the backward pass holds one
        # block's activations at a time instead of the whole U-Net's (lifted
        # transform — parameter tree and numerics are unchanged; dropout rngs
        # replay identically on recompute).  `deterministic` must be static:
        # flax Dropout branches on it in Python.
        resnet_cls = nn.remat(ResnetBlock1D) if cfg.remat else ResnetBlock1D
        block_cls = (
            ConformerBlock if cfg.block_type == "conformer"
            else DecoderTransformerBlock
        )
        if cfg.remat:
            block_cls = nn.remat(block_cls, static_argnums=(3,))

        def run_blocks(h, m, stage, n):
            for bi in range(cfg.n_blocks):
                h = block_cls(
                    dim=n,
                    num_heads=cfg.num_heads,
                    head_dim=cfg.attention_head_dim,
                    dropout=cfg.dropout,
                    dtype=self.dtype,
                    attn_backend=self.attn_backend,
                    f32_stats=f32_stats,
                    name=f"{stage}_tblock{bi}",
                )(h, m, deterministic)
            return h

        skips = []
        masks = [mask]
        for i, ch in enumerate(cfg.channels):
            m = masks[-1]
            h = resnet_cls(
                ch, dtype=self.dtype, masked_stats=masked_norm, f32_stats=f32_stats,
                f32_carry=f32_carry,
                name=f"down{i}_resnet",
            )(h, m, t_emb)
            h = run_blocks(h, m, f"down{i}", ch)
            skips.append(h)
            is_last = i == len(cfg.channels) - 1
            if not is_last:
                h = Downsample1D(ch, dtype=self.dtype, name=f"down{i}_downsample")(h * m[..., None].astype(self.dtype)).astype(carry)
                masks.append(m[:, ::2])
            else:
                h = nn.Conv(
                    ch, (3,), padding="SAME", dtype=self.dtype,
                    name=f"down{i}_conv",
                )(h * m[..., None].astype(self.dtype)).astype(carry)

        m = masks[-1]
        for i in range(cfg.num_mid_blocks):
            h = resnet_cls(
                cfg.channels[-1], dtype=self.dtype, masked_stats=masked_norm, f32_stats=f32_stats,
                f32_carry=f32_carry,
                name=f"mid{i}_resnet",
            )(h, m, t_emb)
            h = run_blocks(h, m, f"mid{i}", cfg.channels[-1])

        up_channels = cfg.channels[::-1] + (cfg.channels[0],)
        for i in range(len(up_channels) - 1):
            out_ch = up_channels[i + 1]
            m = masks.pop()
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = resnet_cls(
                out_ch, dtype=self.dtype, masked_stats=masked_norm, f32_stats=f32_stats,
                f32_carry=f32_carry,
                name=f"up{i}_resnet",
            )(h, m, t_emb)
            h = run_blocks(h, m, f"up{i}", out_ch)
            is_last = i == len(up_channels) - 2
            if not is_last:
                h = Upsample1D(out_ch, dtype=self.dtype, name=f"up{i}_upsample")(h * m[..., None].astype(self.dtype)).astype(carry)
            else:
                h = nn.Conv(
                    out_ch, (3,), padding="SAME", dtype=self.dtype,
                    name=f"up{i}_conv",
                )(h * m[..., None].astype(self.dtype)).astype(carry)

        h = Block1D(
            up_channels[-1], dtype=self.dtype, masked_stats=masked_norm, f32_stats=f32_stats,
                f32_carry=f32_carry,
            name="final_block",
        )(h, mask)
        # final projection in fp32: the velocity output feeds fp32 ODE math.
        # precision=HIGHEST keeps it true fp32 on the TPU MXU (DEFAULT
        # truncates fp32 matmul inputs to bf16 — see models/matcha.py)
        out = nn.Conv(
            self.out_channels, (1,), name="final_proj", precision="highest"
        )(h.astype(jnp.float32) * mask[..., None])
        return out * mask[..., None]

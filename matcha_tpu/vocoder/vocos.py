"""Vocos-24k vocoder in pure JAX: ConvNeXt backbone + ISTFT head.

Re-implementation of the `charactr/vocos-mel-24khz` architecture the
reference loads from HuggingFace (reference: matcha/vocos24k/config.yaml —
backbone dim 512, intermediate 1536, 8 ConvNeXt layers; ISTFT head with
n_fft=1024, hop=256, center padding).  Weights are ported from the torch
checkpoint with tools/convert_vocos.py; random init is used for tests.

TPU notes: the whole decode is convolutions + dense layers + one irfft —
everything XLA maps onto MXU/VPU.  Overlap-add exploits n_fft = 4*hop: each
frame is split into 4 hop-sized chunks scattered with static adds, avoiding
any gather/scatter with dynamic indices.

Layout is time-major (B, T, C) throughout.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from matcha_tpu.audio.mel import hann_window


@dataclass(frozen=True)
class VocosConfig:
    input_channels: int = 100
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    n_fft: int = 1024
    hop_length: int = 256
    sample_rate: int = 24000
    # activation dtype for the ConvNeXt backbone; the ISTFT head (mag/phase
    # → irfft → overlap-add) always runs fp32 for audio fidelity
    compute_dtype: str = "float32"


class ConvNeXtBlock(nn.Module):
    """Depthwise conv7 → LN → pointwise MLP (GELU) → layer-scale → residual."""

    dim: int
    intermediate_dim: int
    layer_scale_init: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Conv(
            self.dim, (7,), padding="SAME", feature_group_count=self.dim,
            name="dwconv", dtype=self.dtype,
        )(x)
        h = nn.LayerNorm(epsilon=1e-6, name="norm", dtype=self.dtype)(h)
        h = nn.Dense(self.intermediate_dim, name="pwconv1", dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, name="pwconv2", dtype=self.dtype)(h)
        gamma = self.param(
            "gamma",
            nn.initializers.constant(self.layer_scale_init),
            (self.dim,),
        )
        return x + gamma.astype(self.dtype) * h


class VocosBackbone(nn.Module):
    cfg: VocosConfig

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        """(B, T, n_mels) log-mel → (B, T, dim) features."""
        dtype = jnp.dtype(self.cfg.compute_dtype)
        h = nn.Conv(self.cfg.dim, (7,), padding="SAME", name="embed", dtype=dtype)(
            mel.astype(dtype)
        )
        h = nn.LayerNorm(epsilon=1e-6, name="norm", dtype=dtype)(h)
        for i in range(self.cfg.num_layers):
            h = ConvNeXtBlock(
                self.cfg.dim, self.cfg.intermediate_dim, dtype=dtype,
                name=f"convnext{i}",
            )(h)
        # final norm in fp32 — feeds the fp32 ISTFT head
        return nn.LayerNorm(epsilon=1e-6, name="final_layer_norm")(
            h.astype(jnp.float32)
        )


def overlap_add(frames: jax.Array, hop: int) -> jax.Array:
    """(B, T, n_fft) windowed frames → (B, (T-1)*hop + n_fft) signal.

    Requires n_fft to be a multiple of hop (1024 = 4·256 here); the OLA then
    becomes `ratio` static shifted adds over hop-sized chunks.
    """
    b, t, n_fft = frames.shape
    ratio = n_fft // hop
    assert ratio * hop == n_fft, "n_fft must be a multiple of hop"
    chunks = frames.reshape(b, t, ratio, hop)
    out = jnp.zeros((b, t + ratio - 1, hop), frames.dtype)
    for c in range(ratio):
        out = out.at[:, c : c + t].add(chunks[:, :, c])
    return out.reshape(b, (t + ratio - 1) * hop)


def istft_center(spec: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Inverse STFT with center padding removed (matches torch.istft).

    Args:
        spec: (B, T, n_fft//2 + 1) complex spectrum.
    Returns:
        (B, (T-1)*hop) waveform.
    """
    window = jnp.asarray(hann_window(n_fft))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window
    sig = overlap_add(frames, hop)
    env = overlap_add(
        jnp.broadcast_to(
            jnp.square(window)[None, None, :], (spec.shape[0], spec.shape[1], n_fft)
        ),
        hop,
    )
    sig = sig / jnp.maximum(env, 1e-11)
    pad = n_fft // 2
    return sig[:, pad:-pad]


class ISTFTHead(nn.Module):
    cfg: VocosConfig

    @nn.compact
    def __call__(self, h: jax.Array) -> jax.Array:
        """(B, T, dim) features → (B, (T-1)*hop) waveform."""
        n_fft = self.cfg.n_fft
        out = nn.Dense(n_fft + 2, name="out")(h)
        mag, phase = jnp.split(out, 2, axis=-1)
        # exp() of unconstrained magnitude, clipped for safety like vocos
        mag = jnp.exp(jnp.clip(mag, max=100.0))
        spec = mag * jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
        return istft_center(spec, n_fft, self.cfg.hop_length)


class Vocos(nn.Module):
    """Full vocoder: log-mel (B, T, n_mels) → waveform (B, (T-1)*hop)."""

    cfg: VocosConfig = VocosConfig()

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        h = VocosBackbone(self.cfg, name="backbone")(mel)
        return ISTFTHead(self.cfg, name="head")(h)


def init_vocos_params(rng: jax.Array, cfg: VocosConfig = VocosConfig()):
    model = Vocos(cfg)
    dummy = jnp.zeros((1, 16, cfg.input_channels))
    return model.init(rng, dummy)["params"]

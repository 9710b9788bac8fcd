"""Log-mel spectrogram extraction in pure JAX.

Numerically matches the Vocos-24k training extractor
(reference: matcha/vocos24k/mel_extractor.py:6-41, which wraps torchaudio
``MelSpectrogram(center=True, power=1, mel_scale="htk", norm=None)``):

  * waveform trimmed to a multiple of ``hop_length``
  * reflect-padded by ``n_fft//2`` on both sides (center framing)
  * periodic Hann window, magnitude (power=1) spectrum
  * HTK-scale triangular mel filterbank, no normalization
  * ``log(clamp(mel, 1e-7))``

The whole transform is jit-safe: framing is a static gather, the FFT is
``jnp.fft.rfft``, and the mel projection is a single (F, n_freqs) x
(n_freqs, n_mels) matmul that XLA places on the MXU.  The two-resolution
scheme (coarse hop=256 for the decoder/vocoder, fine hop=128 for the
encoder/MAS — reference: matcha/utils/precompute_mels.py:75-121) is just two
calls with different hops.

Output layout is time-major ``(..., frames, n_mels)`` — the framework's
internal convention (channels on the TPU lane dimension).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class MelConfig:
    sample_rate: int = 24000
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mels: int = 100
    f_min: float = 0.0
    f_max: float = 12000.0
    log_eps: float = 1e-7
    # "htk" (Vocos-24k production) or "slaney" (the reference's legacy
    # HiFiGAN-style extractor, matcha/utils/audio.py — librosa semantics:
    # slaney scale + slaney area normalization)
    mel_scale: str = "htk"

    @property
    def fine(self) -> "MelConfig":
        """Fine-resolution (hop/2) variant used by the encoder and MAS."""
        return replace(self, hop_length=self.hop_length // 2)


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (matches torch.hann_window(periodic=True))."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(np.float32)


def _hz_to_mel_htk(f: np.ndarray | float) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    mel = f / (200.0 / 3.0)
    log_region = f >= 1000.0
    mel = np.where(
        log_region, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / np.log(6.4) * 27.0, mel
    )
    return mel


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f = m * (200.0 / 3.0)
    log_region = m >= 15.0
    return np.where(log_region, 1000.0 * np.exp(np.log(6.4) / 27.0 * (m - 15.0)), f)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    f_min: float,
    f_max: float,
    mel_scale: str = "htk",
) -> np.ndarray:
    """(n_freqs, n_mels) triangular filterbank.

    ``htk``: torchaudio ``melscale_fbanks(mel_scale='htk', norm=None)``
    semantics — the Vocos-24k production basis.  ``slaney``: librosa-style
    slaney scale with slaney (2/bandwidth) area normalization — the
    reference's legacy HiFiGAN extractor (matcha/utils/audio.py:44-82).
    """
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    if mel_scale == "htk":
        to_mel, to_hz = _hz_to_mel_htk, _mel_to_hz_htk
    elif mel_scale == "slaney":
        to_mel, to_hz = _hz_to_mel_slaney, _mel_to_hz_slaney
    else:
        raise ValueError(f"Unknown mel_scale {mel_scale!r}")
    m_pts = np.linspace(to_mel(f_min), to_mel(f_max), n_mels + 2)
    f_pts = to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if mel_scale == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb *= enorm[None, :]
    return fb.astype(np.float32)


def _frame_indices(num_frames: int, hop_length: int, n_fft: int) -> jnp.ndarray:
    starts = jnp.arange(num_frames) * hop_length
    return starts[:, None] + jnp.arange(n_fft)[None, :]


def stft_magnitude(wav: jax.Array, cfg: MelConfig) -> jax.Array:
    """Magnitude STFT of a (..., T) waveform → (..., frames, n_freqs).

    Centered framing: reflect-pad by n_fft//2, frame count = 1 + T // hop.
    """
    pad = cfg.n_fft // 2
    wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)], mode="reflect")
    t = wav.shape[-1] - 2 * pad
    num_frames = 1 + t // cfg.hop_length
    idx = _frame_indices(num_frames, cfg.hop_length, cfg.n_fft)
    frames = wav[..., idx]  # (..., frames, n_fft)
    window = jnp.asarray(hann_window(cfg.win_length))
    if cfg.win_length < cfg.n_fft:
        lpad = (cfg.n_fft - cfg.win_length) // 2
        window = jnp.pad(window, (lpad, cfg.n_fft - cfg.win_length - lpad))
    spec = jnp.fft.rfft(frames * window, n=cfg.n_fft, axis=-1)
    return jnp.abs(spec)


def log_mel_spectrogram(wav: jax.Array, cfg: MelConfig) -> jax.Array:
    """(..., T) waveform → (..., frames, n_mels) log-mel features.

    The waveform is trimmed to a multiple of ``hop_length`` first, exactly as
    the Vocos-24k extractor does, giving frames = T//hop + 1.
    """
    t = (wav.shape[-1] // cfg.hop_length) * cfg.hop_length
    wav = wav[..., :t]
    mag = stft_magnitude(wav, cfg)
    fb = jnp.asarray(
        mel_filterbank(
            cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.f_min, cfg.f_max,
            cfg.mel_scale,
        )
    )
    mel = jnp.einsum(
        "...tf,fm->...tm", mag, fb, preferred_element_type=jnp.float32
    )
    return jnp.log(jnp.clip(mel, min=cfg.log_eps))


def legacy_hifigan_mel(
    wav: jax.Array,
    n_fft: int = 1024,
    num_mels: int = 80,
    sample_rate: int = 22050,
    hop_length: int = 256,
    win_length: int = 1024,
    f_min: float = 0.0,
    f_max: float = 8000.0,
) -> jax.Array:
    """Legacy HiFiGAN-style mel — the reference's ``utils/audio.py:44-82``.

    Semantics differ from the Vocos-24k production extractor on every axis:
    uncentered STFT after a manual reflect pad of (n_fft-hop)//2 per side,
    magnitude = sqrt(power + 1e-9), librosa slaney-scale/slaney-norm
    filterbank, and dynamic-range compression log(clamp(x, 1e-5)).  Unused
    by the production path (kept for older-checkpoint compatibility).

    (..., T) waveform → (..., frames, num_mels) log-mel.
    """
    pad = (n_fft - hop_length) // 2
    y = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)], mode="reflect")
    t = y.shape[-1]
    num_frames = 1 + (t - n_fft) // hop_length
    idx = _frame_indices(num_frames, hop_length, n_fft)
    frames = y[..., idx]
    window = jnp.asarray(hann_window(win_length))
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-9)
    fb = jnp.asarray(
        mel_filterbank(sample_rate, n_fft, num_mels, f_min, f_max, "slaney")
    )
    mel = jnp.einsum(
        "...tf,fm->...tm", mag, fb, preferred_element_type=jnp.float32
    )
    return jnp.log(jnp.clip(mel, min=1e-5))

"""Mel-cepstral distortion (MCD) with DTW alignment — self-contained.

The reference delegates MCD to the ``pymcd`` package (WORLD/SPTK cepstra;
reference: matcha/utils/mcd_validate.py, matcha/utils/compute_mcd.py).
That C tool isn't in this image, so MCD is implemented directly:

  waveform → log-mel (the framework's own extractor) → DCT-II → mel-cepstral
  coefficients c_1..c_K (c_0 excluded: energy) → DTW over frame pairs →
  MCD = (10/ln10)·√2 · mean ‖c_a - c_b‖₂ over the aligned path

Same structure as the standard MCD-DTW definition; absolute values are
comparable across this framework's own runs (the regression gate), though
offset from SPTK-based numbers by the cepstral basis difference.
"""

from __future__ import annotations

import numpy as np

from matcha_tpu.audio.mel import MelConfig, log_mel_spectrogram

MCD_CONST = 10.0 / np.log(10.0) * np.sqrt(2.0)


DYNAMIC_RANGE_NAT = 11.5  # ≈ 50 dB utterance-relative spectral floor
ENERGY_GATE_NAT = 6.9     # ≈ 30 dB below the loudest frame → dropped


def mel_cepstra(wav: np.ndarray, cfg: MelConfig | None = None, n_coeffs: int = 13) -> np.ndarray:
    """(T,) waveform → (frames, n_coeffs) cepstra (c_1..c_n, c_0 dropped).

    Two robustness measures mirror what WORLD/SPTK-based MCD (pymcd, the
    reference's metric) does implicitly:
      * the linear-mel floor is utterance-relative (max − ~50 dB), not the
        absolute 1e-7 training floor — otherwise near-silent frames compare
        log(1e-7) against log(noise) and dominate the distance;
      * frames more than ~30 dB below the loudest frame (pauses, trailing
        room tone) are excluded — cepstra of silence carry no speech detail.
    """
    import jax.numpy as jnp
    from scipy.fft import dct  # scipy ships with the image (via jax deps)

    cfg = cfg or MelConfig()
    mel = np.asarray(log_mel_spectrogram(jnp.asarray(wav), cfg))  # (T, C), ln
    floor = mel.max() - DYNAMIC_RANGE_NAT
    mel = np.maximum(mel, floor)
    frame_energy = mel.mean(axis=1)
    keep = frame_energy > frame_energy.max() - ENERGY_GATE_NAT
    ceps = dct(mel[keep], type=2, axis=-1, norm="ortho")
    return ceps[:, 1 : n_coeffs + 1]


def dtw_path_cost(a: np.ndarray, b: np.ndarray) -> float:
    """Mean per-step Euclidean distance along the optimal DTW path."""
    na, nb = len(a), len(b)
    dist = np.sqrt(
        np.maximum(
            np.sum(a * a, axis=1)[:, None]
            + np.sum(b * b, axis=1)[None, :]
            - 2.0 * (a @ b.T),
            0.0,
        )
    )
    acc = np.full((na + 1, nb + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, na + 1):
        row_prev = acc[i - 1]
        row = acc[i]
        d = dist[i - 1]
        for j in range(1, nb + 1):
            row[j] = d[j - 1] + min(row_prev[j], row[j - 1], row_prev[j - 1])
    # path length: backtrack count
    i, j, steps = na, nb, 0
    while i > 1 or j > 1:
        steps += 1
        choices = (
            (acc[i - 1, j - 1], i - 1, j - 1),
            (acc[i - 1, j], i - 1, j),
            (acc[i, j - 1], i, j - 1),
        )
        _, i, j = min(choices, key=lambda c: c[0])
    return float(acc[na, nb] / max(steps + 1, 1))


def mcd_dtw(
    wav_ref: np.ndarray,
    wav_syn: np.ndarray,
    cfg: MelConfig | None = None,
    trim_silence_db: float | None = None,
) -> float:
    """MCD (dB) between a reference and a synthesized waveform.

    Edge trimming is off by default: the utterance-relative energy gate in
    ``mel_cepstra`` already drops silence, and an absolute-dB trim would
    break the metric's gain invariance (c_0 is excluded, so MCD must not
    change under amplitude scaling).
    """
    if trim_silence_db is not None:
        wav_ref = _trim_edges(wav_ref, trim_silence_db)
        wav_syn = _trim_edges(wav_syn, trim_silence_db)
    ca = mel_cepstra(wav_ref, cfg)
    cb = mel_cepstra(wav_syn, cfg)
    if len(ca) == 0 or len(cb) == 0:
        return float("nan")
    return MCD_CONST * dtw_path_cost(ca, cb)


def _trim_edges(wav: np.ndarray, threshold_db: float) -> np.ndarray:
    from matcha_tpu.utils.silence import WINDOW_MS, silence_bounds

    sr = 24000
    win = int(WINDOW_MS / 1000.0 * sr)
    lead, trail = silence_bounds(wav, sr, threshold_db)
    end = len(wav) - trail * win
    return wav[lead * win : end]

"""Vocoder round-trip quality self-test.

CLI:  python -m matcha_tpu.vocoder.selftest --vocoder_path vocos.pkl \
          --wav_dir mcd_validation [--pattern 'original_*.wav']

For each wav: extract the log-mel with the framework's own extractor, run
the Vocos decode, and report MCD(original, vocoded) — the vocoder-only
quality floor, independent of the TTS model (reference:
matcha/vocos24k/vocos_wrapper.py:19-109, bands: <1.5 dB transparent,
1.5-2.5 production, >4 problematic).
"""

from __future__ import annotations

import argparse
import pickle
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from matcha_tpu.audio.mel import MelConfig, log_mel_spectrogram
from matcha_tpu.utils.audio_io import read_wav
from matcha_tpu.utils.mcd import mcd_dtw
from matcha_tpu.vocoder.vocos import Vocos, VocosConfig


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--vocoder_path", required=True)
    parser.add_argument("--wav_dir", required=True)
    parser.add_argument("--pattern", default="*.wav")
    args = parser.parse_args(argv)

    with open(args.vocoder_path, "rb") as f:
        params = pickle.load(f)
    cfg = VocosConfig()
    vocos = Vocos(cfg)
    mel_cfg = MelConfig()

    scores = []
    for wav_path in sorted(Path(args.wav_dir).glob(args.pattern)):
        wav, sr = read_wav(wav_path)
        if sr != cfg.sample_rate:
            print(f"[!] {wav_path.name}: skip (sr {sr})")
            continue
        mel = log_mel_spectrogram(jnp.asarray(wav), mel_cfg)[None]
        out = np.asarray(vocos.apply({"params": params}, mel))[0]
        score = mcd_dtw(wav, out)
        scores.append(score)
        print(f"{wav_path.name}: MCD {score:.2f} dB")
    if scores:
        avg = float(np.mean(scores))
        band = (
            "transparent" if avg < 1.5
            else "production" if avg < 2.5
            else "usable" if avg < 4.0
            else "problematic"
        )
        print(f"average vocoder MCD: {avg:.2f} dB ({band})")


if __name__ == "__main__":
    main()

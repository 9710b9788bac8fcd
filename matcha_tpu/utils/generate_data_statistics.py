"""Streaming corpus-wide mel mean/std (pre-normalization statistics).

CLI:  python -m matcha_tpu.utils.generate_data_statistics \
          --filelist train.csv --wav_dir wavs/

Computes E[x] and E[x²] over every (coarse) log-mel value in the corpus in
one pass, printing the ``data_statistics`` block for the training config.
Refuses to run against an existing mel cache — cached mels are already
normalized, so recomputing stats from them would be circular
(reference: matcha/utils/generate_data_statistics.py:179-184).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from matcha_tpu.audio.mel import MelConfig, log_mel_spectrogram
from matcha_tpu.data.dataset import parse_filelist
from matcha_tpu.utils.audio_io import read_wav


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--filelist", required=True, action="append")
    parser.add_argument("--wav_dir", required=True)
    parser.add_argument("--mel_dir", default=None, help="guard: refuse if cache exists")
    parser.add_argument("--sample_rate", type=int, default=24000)
    args = parser.parse_args(argv)

    if args.mel_dir and any(Path(args.mel_dir).rglob("*.npy")):
        raise SystemExit(
            "Mel cache already exists — its mels are normalized; statistics "
            "must come from raw audio. Delete the cache or omit --mel_dir."
        )

    cfg = MelConfig(sample_rate=args.sample_rate)
    total = 0
    s1 = 0.0
    s2 = 0.0
    for filelist in args.filelist:
        for row in parse_filelist(filelist, require_ids=False):
            wav, sr = read_wav(Path(args.wav_dir) / f"{row[0]}.wav")
            if sr != args.sample_rate:
                raise SystemExit(f"{row[0]}: sample rate {sr} != {args.sample_rate}")
            mel = np.asarray(log_mel_spectrogram(jnp.asarray(wav), cfg), np.float64)
            total += mel.size
            s1 += mel.sum()
            s2 += np.square(mel).sum()

    mean = s1 / total
    std = float(np.sqrt(s2 / total - mean * mean))
    print("data_statistics:")
    print(f"  mel_mean: {mean:.6f}")
    print(f"  mel_std: {std:.6f}")


if __name__ == "__main__":
    main()

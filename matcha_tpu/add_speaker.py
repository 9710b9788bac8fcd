"""Add a new speaker to a checkpoint via StyleEncoder-predicted embeddings.

CLI:  python -m matcha_tpu.add_speaker \
          --checkpoint_path <matcha ckpt> --style_params style_params.pkl \
          --wav_dir new_speaker_wavs/ --output <new ckpt dir>

Predicts (enc, dur) embeddings for every recording of the new speaker,
averages them, and appends a row to both speaker tables in a copied
checkpoint with n_spks bumped (reference: matcha/add_speaker.py:40-101).
"""

from __future__ import annotations

import argparse
import pickle
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from matcha_tpu.audio.mel import MelConfig, log_mel_spectrogram
from matcha_tpu.models.style_encoder import StyleEncoder
from matcha_tpu.train.checkpoint import (
    add_speaker_rows,
    load_checkpoint,
    save_checkpoint,
)
from matcha_tpu.utils.audio_io import read_wav
from matcha_tpu.utils.model_math import normalize


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint_path", required=True)
    parser.add_argument("--style_params", required=True)
    parser.add_argument("--wav_dir", required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args(argv)

    tree, cfg = load_checkpoint(args.checkpoint_path)
    with open(args.style_params, "rb") as f:
        style_params = pickle.load(f)
    style = StyleEncoder(spk_emb_dim=cfg.spk_emb_dim)

    # StyleEncoder consumes fine (hop-128) mels with the model's mel width
    mel_cfg = MelConfig(n_mels=cfg.n_feats).fine
    stats = cfg.data_statistics
    enc_rows, dur_rows = [], []
    wavs = sorted(Path(args.wav_dir).glob("*.wav"))
    if not wavs:
        raise SystemExit(f"No wavs in {args.wav_dir}")
    for wav_path in wavs:
        wav, sr = read_wav(wav_path)
        if sr != mel_cfg.sample_rate:
            raise SystemExit(f"{wav_path}: sample rate {sr} != {mel_cfg.sample_rate}")
        mel = log_mel_spectrogram(jnp.asarray(wav), mel_cfg)
        mel = normalize(mel, stats.mel_mean, stats.mel_std)[None]
        mask = jnp.ones(mel.shape[:2])
        enc, dur = style.apply({"params": style_params}, mel, mask)
        enc_rows.append(np.asarray(enc[0]))
        dur_rows.append(np.asarray(dur[0]))

    tree2, cfg2 = add_speaker_rows(
        tree, cfg, np.mean(enc_rows, axis=0), np.mean(dur_rows, axis=0)
    )
    save_checkpoint(args.output, tree2, cfg2)
    print(
        f"added speaker {cfg.n_spks} (from {len(wavs)} recordings) → {args.output}"
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env bash
# Interactive corpus-preparation orchestration (reference: prepare_corpus.sh):
#   validate IPA + write phoneme IDs → normalize silence → precompute mels.
set -euo pipefail

FILELIST=${1:?usage: prepare_corpus.sh <filelist.csv> <wav_dir> <mel_dir>}
WAV_DIR=${2:?usage: prepare_corpus.sh <filelist.csv> <wav_dir> <mel_dir>}
MEL_DIR=${3:?usage: prepare_corpus.sh <filelist.csv> <wav_dir> <mel_dir>}

confirm() {
    read -r -p "$1 [y/N] " reply
    [[ "$reply" =~ ^[Yy]$ ]]
}

if confirm "1/3 Validate IPA + write phoneme IDs into ${FILELIST}?"; then
    python -m matcha_tpu.utils.validate_corpus_ipa --filelist "$FILELIST"
fi

if confirm "2/3 Normalize silence in ${WAV_DIR} (in place)?"; then
    python -m matcha_tpu.utils.normalize_silence \
        --filelist "$FILELIST" --wav_dir "$WAV_DIR" --in_place
fi

if confirm "3/3 Precompute coarse+fine mels into ${MEL_DIR}?"; then
    python -m matcha_tpu.utils.precompute_mels \
        --filelist "$FILELIST" --wav_dir "$WAV_DIR" --mel_dir "$MEL_DIR"
fi

echo "Corpus preparation complete."

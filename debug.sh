#!/usr/bin/env bash
# Multi-language debug synthesis sweep (reference: debug.sh) — per-utterance
# debug TSVs + encoder-output wavs land next to the audio in $OUT.
set -euo pipefail

CHECKPOINT=${CHECKPOINT:-logs/train/v19/checkpoints/epoch_00994}
OUT=${OUT:-/tmp/matcha_debug}

python -m matcha_tpu.cli \
  --checkpoint_path "$CHECKPOINT" \
  --text "The rain continued its relentless assault against the windowpane, each drop a tiny, percussive reminder of the time slipping through his fingers." \
  --spk "0,1,2,3,4,5,6,10,11,12" \
  --output_dir "$OUT" \
  --debug

python -m matcha_tpu.cli \
  --checkpoint_path "$CHECKPOINT" \
  --text "Ploaia continua să cadă neîntrerupt peste oraș, fiecare picătură amintind de timpul care trece." \
  --spk "7" \
  --output_dir "$OUT" \
  --debug

python -m matcha_tpu.cli \
  --checkpoint_path "$CHECKPOINT" \
  --text "La pluie continuait son assaut implacable contre la vitre, chaque goutte un rappel du temps qui s'écoule." \
  --spk "8,9" \
  --output_dir "$OUT" \
  --debug

python -m matcha_tpu.cli \
  --checkpoint_path "$CHECKPOINT" \
  --text "La pioggia continuava il suo assalto incessante contro il vetro, ogni goccia un promemoria del tempo che scorre." \
  --spk "13,14" \
  --output_dir "$OUT" \
  --debug

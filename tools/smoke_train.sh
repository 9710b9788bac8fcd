#!/usr/bin/env bash
# End-to-end training smoke on real hardware with a synthetic corpus:
# wav generation → precompute_mels → matcha_tpu.train (2 epochs, production
# model widths, small batches) → checkpoint present.
set -euo pipefail
cd "$(dirname "$0")/.."

WORK=${1:-/tmp/matcha_smoke}
rm -rf "$WORK"
mkdir -p "$WORK/wavs/spk0" "$WORK/wavs/spk1"

python - "$WORK" <<'EOF'
import sys
from pathlib import Path
import numpy as np
sys.path.insert(0, ".")
from matcha_tpu.utils.audio_io import write_wav

work = Path(sys.argv[1])
rng = np.random.default_rng(0)
rows = []
for i in range(24):
    spk = i % 2
    rel = f"spk{spk}/u{i:02d}"
    dur = rng.uniform(0.8, 2.5)
    t = np.arange(int(dur * 24000)) / 24000
    f0 = 120 + 40 * spk + 10 * np.sin(2 * np.pi * 2.5 * t)
    wav = 0.4 * np.sin(2 * np.pi * np.cumsum(f0) / 24000)
    wav *= np.minimum(1, 10 * np.minimum(t, t[::-1]))  # fade edges
    write_wav(work / "wavs" / f"{rel}.wav", wav.astype(np.float32), 24000)
    ids = " ".join(str(v) for v in rng.integers(0, 600, rng.integers(20, 60)))
    rows.append(f"{rel}|{spk}|en-us|synthetic sample {i}|{ids}")
(work / "train.csv").write_text("\n".join(rows))
(work / "validate.csv").write_text("\n".join(rows[:4]))
print(f"corpus: {len(rows)} utterances")
EOF

python -m matcha_tpu.utils.precompute_mels \
    --filelist "$WORK/train.csv" --wav_dir "$WORK/wavs" --mel_dir "$WORK/mels"

python -m matcha_tpu.train \
    data.train_filelist_path="$WORK/train.csv" \
    data.valid_filelist_path="$WORK/validate.csv" \
    data.mel_dir="$WORK/mels" \
    data.n_spks=2 \
    data.max_frames_per_batch=2048 \
    trainer.max_epochs=2 \
    trainer.check_val_every_n_epoch=1 \
    trainer.checkpoint_every_n_epochs=1 \
    model.compute_dtype=bfloat16 \
    paths.output_dir="$WORK/run"

ls "$WORK/run/checkpoints/"

# learning gate: the per-epoch training loss must DESCEND on hardware
# (catches gradient sign/scale errors that forward-parity tests cannot see)
python - "$WORK" <<'EOF'
import json, sys
from pathlib import Path

lines = [
    json.loads(l)
    for l in (Path(sys.argv[1]) / "run" / "metrics.jsonl").read_text().splitlines()
]
epochs = [m["loss/train_epoch"] for m in lines if "loss/train_epoch" in m]
print("epoch losses:", " ".join(f"{v:.4f}" for v in epochs))
assert len(epochs) >= 2, "need at least 2 epochs to compare"
assert epochs[-1] < epochs[0], (
    f"training loss did not decrease: {epochs[0]:.4f} -> {epochs[-1]:.4f}"
)
EOF

echo "smoke train OK (loss descended)"

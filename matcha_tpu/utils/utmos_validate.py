"""Reference-free MOS prediction (UTMOS) per speaker.

CLI:  python -m matcha_tpu.utils.utmos_validate \
          --checkpoint_path ... --vocoder_path ... --filelist validate.csv \
          [--samples_per_speaker 20]

Synthesizes samples and scores them with the UTMOS predictor
(`tarepan/SpeechMOS` via torch.hub, exactly the model the reference uses —
matcha/utils/utmos_validate.py:99-122).  The predictor download needs
network access; in an air-gapped environment pre-seed the torch.hub cache
(~/.cache/torch/hub) or pass --hub_dir.
"""

from __future__ import annotations

import argparse
from collections import defaultdict

import numpy as np


def load_utmos(hub_dir: str | None = None):
    import torch

    if hub_dir:
        torch.hub.set_dir(hub_dir)
    try:
        return torch.hub.load(
            "tarepan/SpeechMOS:v1.2.0", "utmos22_strong", trust_repo=True
        )
    except Exception as exc:
        raise SystemExit(
            "UTMOS predictor unavailable (torch.hub load failed — this tool "
            f"needs network access or a pre-seeded hub cache): {exc}"
        )


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint_path", required=True)
    parser.add_argument("--vocoder_path", required=True)
    parser.add_argument("--filelist", required=True)
    parser.add_argument("--samples_per_speaker", type=int, default=20)
    parser.add_argument("--steps", type=int, default=4)
    parser.add_argument("--hub_dir", default=None)
    args = parser.parse_args(argv)

    import torch

    from matcha_tpu.cli import load_synthesizer
    from matcha_tpu.data.dataset import parse_filelist

    predictor = load_utmos(args.hub_dir)
    synth = load_synthesizer(args.checkpoint_path, args.vocoder_path)

    rows_by_spk = defaultdict(list)
    for row in parse_filelist(args.filelist):
        rows_by_spk[int(row[1])].append(row)

    all_scores = []
    for spk in sorted(rows_by_spk):
        scores = []
        for row in rows_by_spk[spk][: args.samples_per_speaker]:
            ids = [int(t) for t in row[4].split()]
            result = synth.synthesise_ids(ids, speaker=spk, n_timesteps=args.steps)
            wav = torch.tensor(result.wav)[None]
            score = float(predictor(wav, 24000))
            scores.append(score)
        avg = float(np.mean(scores))
        all_scores.extend(scores)
        print(f"speaker {spk:>3}: UTMOS {avg:.2f} (n={len(scores)})")
    print(f"average UTMOS: {np.mean(all_scores):.2f}")


if __name__ == "__main__":
    main()

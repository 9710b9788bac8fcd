"""Per-speaker leading/trailing silence statistics.

CLI:  python -m matcha_tpu.utils.measure_silence --filelist train.csv --wav_dir wavs
(reference: matcha/utils/measure_silence.py)
"""

from __future__ import annotations

import argparse
from collections import defaultdict
from pathlib import Path

import numpy as np

from matcha_tpu.data.dataset import parse_filelist
from matcha_tpu.utils.audio_io import read_wav
from matcha_tpu.utils.silence import WINDOW_MS, silence_bounds


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--filelist", required=True, action="append")
    parser.add_argument("--wav_dir", required=True)
    parser.add_argument("--threshold_db", type=float, default=-60.0)
    args = parser.parse_args(argv)

    stats = defaultdict(lambda: {"lead": [], "trail": []})
    for filelist in args.filelist:
        for row in parse_filelist(filelist, require_ids=False):
            wav, sr = read_wav(Path(args.wav_dir) / f"{row[0]}.wav")
            lead, trail = silence_bounds(wav, sr, args.threshold_db)
            stats[row[1]]["lead"].append(lead * WINDOW_MS)
            stats[row[1]]["trail"].append(trail * WINDOW_MS)

    print(f"threshold {args.threshold_db} dB, {WINDOW_MS:.0f} ms RMS windows")
    print(f"{'spk':>4} {'n':>6} {'lead p50':>9} {'lead p95':>9} {'trail p50':>10} {'trail p95':>10}")
    for spk in sorted(stats, key=int):
        lead = np.array(stats[spk]["lead"])
        trail = np.array(stats[spk]["trail"])
        print(
            f"{spk:>4} {len(lead):>6} {np.percentile(lead, 50):>8.0f}ms"
            f" {np.percentile(lead, 95):>8.0f}ms {np.percentile(trail, 50):>9.0f}ms"
            f" {np.percentile(trail, 95):>9.0f}ms"
        )


if __name__ == "__main__":
    main()

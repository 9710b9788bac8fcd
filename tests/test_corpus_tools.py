"""End-to-end corpus tooling tests: wavs → stats → mel caches → training-ready."""

import json

import numpy as np
import pytest

from matcha_tpu.utils.audio_io import write_wav

SR = 24000


@pytest.fixture(scope="module")
def wav_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("wavcorpus")
    wav_dir = root / "wavs"
    rng = np.random.default_rng(0)
    rows = []
    for i in range(4):
        rel = f"spk0/u{i}"
        (wav_dir / "spk0").mkdir(parents=True, exist_ok=True)
        dur = rng.uniform(0.3, 0.8)
        t = np.arange(int(dur * SR)) / SR
        wav = 0.4 * np.sin(2 * np.pi * (200 + 50 * i) * t).astype(np.float32)
        write_wav(wav_dir / f"{rel}.wav", wav, SR)
        ids = " ".join(str(v) for v in rng.integers(0, 600, 12))
        rows.append(f"{rel}|0|en-us|sample {i}|{ids}")
    filelist = root / "train.csv"
    filelist.write_text("\n".join(rows))
    return root, filelist, wav_dir


class TestPrecomputeMels:
    def test_writes_training_ready_cache(self, wav_corpus):
        from matcha_tpu.data.dataset import TextMelDataset
        from matcha_tpu.utils.precompute_mels import main as precompute

        root, filelist, wav_dir = wav_corpus
        mel_dir = root / "mels"
        precompute(
            [
                "--filelist", str(filelist),
                "--wav_dir", str(wav_dir),
                "--mel_dir", str(mel_dir),
            ]
        )
        meta = json.loads((mel_dir / "metadata.json").read_text())
        assert meta["hop_length"] == 256 and meta["fine_hop_length"] == 128
        assert not (mel_dir / "failures.txt").exists()

        # the cache must load through the actual training dataset
        ds = TextMelDataset(filelist, mel_dir)
        item = ds[0]
        assert item["y"].shape[1] == 100
        # fine/coarse frame-lockstep contract
        assert item["y_fine"].shape[0] == 2 * (item["y"].shape[0] - 1) + 1
        assert np.isfinite(item["y"]).all()

    def test_statistics_guard_refuses_cache(self, wav_corpus):
        from matcha_tpu.utils.generate_data_statistics import main as stats

        root, filelist, wav_dir = wav_corpus
        with pytest.raises(SystemExit, match="cache already exists"):
            stats(
                [
                    "--filelist", str(filelist),
                    "--wav_dir", str(wav_dir),
                    "--mel_dir", str(root / "mels"),
                ]
            )

    def test_statistics_from_raw_audio(self, wav_corpus, capsys):
        from matcha_tpu.utils.generate_data_statistics import main as stats

        root, filelist, wav_dir = wav_corpus
        stats(["--filelist", str(filelist), "--wav_dir", str(wav_dir)])
        out = capsys.readouterr().out
        assert "mel_mean" in out and "mel_std" in out


class TestDurationTools:
    def test_total_duration(self, wav_corpus, capsys):
        from matcha_tpu.utils.total_corpus_duration import main as total

        root, filelist, wav_dir = wav_corpus
        total(["--filelist", str(filelist), "--wav_dir", str(wav_dir)])
        out = capsys.readouterr().out
        assert "4 utterances" in out

    def test_filter_by_duration(self, wav_corpus, tmp_path):
        from matcha_tpu.utils.filter_by_wav_duration import main as filt

        root, filelist, wav_dir = wav_corpus
        copy = tmp_path / "copy.csv"
        copy.write_text(filelist.read_text())
        filt(["--filelist", str(copy), "--wav_dir", str(wav_dir), "--max_seconds", "0.5"])
        remaining = [l for l in copy.read_text().splitlines() if l.strip()]
        assert 0 < len(remaining) < 4

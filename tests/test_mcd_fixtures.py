"""The mcd_validation/ fidelity-anchor fixtures and the compute_mcd CLI.

The 10 ground-truth speaker wavs mirror the reference's fixture set
(reference: mcd_validation/, consumed by matcha/utils/compute_mcd.py:80-117).
They anchor objective fidelity measurement: after training/converting a
checkpoint, synthesize each speaker and run
``python -m matcha_tpu.utils.compute_mcd --dir mcd_validation``.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from matcha_tpu.utils.audio_io import read_wav, write_wav
from matcha_tpu.utils.compute_mcd import main as compute_mcd_main
from matcha_tpu.utils.mcd import mcd_dtw

FIXTURES = Path(__file__).resolve().parent.parent / "mcd_validation"

pytestmark = pytest.mark.skipif(
    not FIXTURES.is_dir(), reason="mcd_validation fixtures missing"
)


def test_fixture_inventory_and_format():
    wavs = sorted(FIXTURES.glob("original_speaker_*.wav"))
    assert len(wavs) == 10
    for w in wavs[:3]:
        audio, sr = read_wav(w)
        assert sr == 24000
        assert audio.ndim == 1 and len(audio) > sr // 2  # at least 0.5 s
        assert np.abs(audio).max() <= 1.0 + 1e-6


def test_mcd_metric_properties():
    """Identity ≈ 0, gain-invariant, monotone in distortion severity."""
    audio, sr = read_wav(FIXTURES / "original_speaker_000.wav")
    rng = np.random.default_rng(0)
    self_mcd = mcd_dtw(audio, audio.copy())
    gain_mcd = mcd_dtw(audio, (0.5 * audio).astype(np.float32))
    mild = np.clip(audio + 0.001 * rng.standard_normal(len(audio)), -1, 1)
    mild_mcd = mcd_dtw(audio, mild.astype(np.float32))
    other, _ = read_wav(FIXTURES / "original_speaker_001.wav")
    cross_mcd = mcd_dtw(audio, other)
    assert self_mcd < 0.05  # near-zero (float STFT path, not exactly 0)
    assert gain_mcd < 0.05  # c_0 dropped → amplitude-scale invariant
    assert self_mcd < mild_mcd < cross_mcd


def test_compute_mcd_cli_runs_on_fixture_dir(tmp_path, capsys):
    # synthesize "generated" wavs as mildly degraded originals
    rng = np.random.default_rng(1)
    for orig in sorted(FIXTURES.glob("original_speaker_*.wav"))[:3]:
        audio, sr = read_wav(orig)
        degraded = np.clip(audio + 0.005 * rng.standard_normal(len(audio)), -1, 1)
        write_wav(tmp_path / orig.name.replace("original_", "generated_"),
                  degraded.astype(np.float32), sr)
    compute_mcd_main(["--dir", str(FIXTURES), "--generated_dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert "average MCD" in out
    assert "over 3 pairs" in out


class TestSptkBasis:
    """The pymcd-family basis (22.05 kHz / 5 ms / alpha=0.65 mcep)."""

    def test_identity_zero_and_gain_invariant(self):
        audio, sr = read_wav(FIXTURES / "original_speaker_000.wav")
        audio = audio[: sr * 2]
        assert mcd_dtw(audio, audio, basis="sptk") < 1e-6
        # c0 excluded -> amplitude scaling must not move the metric
        d = mcd_dtw(audio, 0.5 * audio, basis="sptk")
        assert d < 0.2

    def test_monotone_in_distortion(self):
        audio, sr = read_wav(FIXTURES / "original_speaker_000.wav")
        audio = audio[: sr * 2]
        rng = np.random.default_rng(0)
        mild = audio + 0.01 * rng.standard_normal(len(audio))
        harsh = audio + 0.1 * rng.standard_normal(len(audio))
        d_mild = mcd_dtw(audio, mild, basis="sptk")
        d_harsh = mcd_dtw(audio, harsh, basis="sptk")
        assert 0 < d_mild < d_harsh

    def test_different_speakers_in_plausible_band(self):
        """Different speakers saying different things: pymcd-style numbers
        land roughly in the 5-15 dB range (same-content synthesis quality
        bands are ~3-5 dB, reference mcd_validate.py:7-9)."""
        a, sr = read_wav(FIXTURES / "original_speaker_000.wav")
        b, _ = read_wav(FIXTURES / "original_speaker_001.wav")
        d = mcd_dtw(a[: sr * 2], b[: sr * 2], basis="sptk")
        assert 3.0 < d < 20.0

    def test_auto_falls_back_to_sptk_without_pymcd(self):
        from matcha_tpu.utils import mcd as mcd_mod

        if mcd_mod.pymcd_available():
            pytest.skip("pymcd installed; auto uses it")
        a, sr = read_wav(FIXTURES / "original_speaker_000.wav")
        got = mcd_dtw(a[: sr], a[: sr], basis="auto")
        assert got < 1e-6

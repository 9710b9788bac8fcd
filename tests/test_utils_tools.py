"""Tests for host-side utility tools: audio IO, silence, MCD, configs."""

import numpy as np
import pytest

from matcha_tpu.utils.audio_io import duration_seconds, read_wav, write_wav
from matcha_tpu.utils.configs import compose, deep_merge, parse_override
from matcha_tpu.utils.mcd import dtw_path_cost, mcd_dtw
from matcha_tpu.utils.silence import normalize_silence, rms_windows, silence_bounds

SR = 24000


def speechlike(seconds=0.4, seed=0):
    rng = np.random.default_rng(seed)
    # tanh keeps everything inside [-0.35, 0.35] so 16-bit round-trips exactly
    return (0.35 * np.tanh(rng.standard_normal(int(seconds * SR)))).astype(np.float32)


class TestAudioIO:
    def test_roundtrip(self, tmp_path):
        wav = speechlike()
        path = tmp_path / "x.wav"
        write_wav(path, wav, SR)
        back, sr = read_wav(path)
        assert sr == SR
        # quantization + 32767/32768 scale asymmetry → ~1.5 LSB worst case
        np.testing.assert_allclose(back, wav, atol=1.5 / 32768)
        assert abs(duration_seconds(path) - 0.4) < 1e-3


class TestSilence:
    def test_bounds(self):
        wav = np.concatenate(
            [np.zeros(int(0.1 * SR), np.float32), speechlike(), np.zeros(int(0.2 * SR), np.float32)]
        )
        lead, trail = silence_bounds(wav, SR)
        assert 8 <= lead <= 11   # ~100ms of 10ms windows
        assert 18 <= trail <= 21

    def test_normalize_exact_padding(self):
        wav = np.concatenate(
            [np.zeros(int(0.05 * SR), np.float32), speechlike(), np.zeros(int(0.5 * SR), np.float32)]
        )
        out = normalize_silence(wav, SR, lead_ms=200, trail_ms=800)
        lead, trail = silence_bounds(out, SR)
        assert abs(lead * 10 - 200) <= 10
        assert abs(trail * 10 - 800) <= 10

    def test_idempotent(self):
        wav = np.concatenate([speechlike(), np.zeros(int(0.3 * SR), np.float32)])
        once = normalize_silence(wav, SR)
        twice = normalize_silence(once, SR)
        np.testing.assert_array_equal(once, twice)

    def test_rms_windows_shape(self):
        assert rms_windows(np.zeros(2400, np.float32), SR).shape == (10,)

    def test_all_silent_counts_as_leading(self):
        lead, trail = silence_bounds(np.zeros(int(0.1 * SR), np.float32), SR)
        assert (lead, trail) == (10, 0)

    def test_dual_threshold_measurement(self):
        """-90 dB counts only near-digital-zero windows; -60 dB also counts
        the faint-hiss region between them (reference: measure_silence.py
        measures both from one RMS grid)."""
        from matcha_tpu.utils.measure_silence import measure_silence_ms

        hiss = (1e-4 * np.ones(int(0.1 * SR))).astype(np.float32)  # ~-80 dB
        wav = np.concatenate(
            [np.zeros(int(0.1 * SR), np.float32), hiss, speechlike()]
        )
        le, la, te, ta = measure_silence_ms(wav, SR)
        assert abs(le - 200.0) <= 10.0  # zeros + hiss are both < -60 dB
        assert abs(la - 100.0) <= 10.0  # only the zeros are < -90 dB
        assert te <= 10.0 and ta <= 10.0

    def test_measure_silence_cli_single_file(self, tmp_path, capsys):
        from matcha_tpu.utils.measure_silence import main

        wav = np.concatenate(
            [np.zeros(int(0.1 * SR), np.float32), speechlike()]
        )
        write_wav(tmp_path / "x.wav", wav, SR)
        main(["--file", str(tmp_path / "x.wav")])
        out = capsys.readouterr().out
        assert "Leading  effective (-60.0 dB): 100.0 ms" in out
        assert "Leading  absolute  (-90.0 dB): 100.0 ms" in out

    def test_measure_silence_cli_corpus(self, tmp_path, capsys):
        from matcha_tpu.utils.measure_silence import main

        wavs = tmp_path / "wavs"
        wavs.mkdir()
        rows = []
        for i, lead_s in enumerate((0.1, 0.2)):
            wav = np.concatenate(
                [np.zeros(int(lead_s * SR), np.float32), speechlike(seed=i)]
            )
            write_wav(wavs / f"u{i}.wav", wav, SR)
            rows.append(f"u{i}|{i % 2}|en|hello|")
        (tmp_path / "list.csv").write_text("\n".join(rows) + "\n")
        main([
            "--filelist", str(tmp_path / "list.csv"), "--wav_dir", str(wavs)
        ])
        out = capsys.readouterr().out
        assert "Total files processed: 2" in out
        assert "Leading Silence Statistics" in out
        assert "Trailing Silence Statistics" in out
        assert "longest leading effective silence" in out
        assert "u1.wav" in out


class TestMcd:
    def test_identical_is_near_zero(self):
        wav = speechlike(0.3)
        # fp32 DCT noise leaves a tiny residual; anything < 0.01 dB is "same"
        assert mcd_dtw(wav, wav, trim_silence_db=None) < 0.01

    def test_different_signals_positive(self):
        a = speechlike(0.3, seed=1)
        b = speechlike(0.3, seed=2)
        assert mcd_dtw(a, b, trim_silence_db=None) > 1.0

    def test_dtw_handles_length_mismatch(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal((10, 4))
        # b = a with a repeated frame: DTW should absorb the stretch
        b = np.insert(a, 5, a[5], axis=0)
        assert dtw_path_cost(a, b) < 1e-7


class TestConfigs:
    def test_parse_override_types(self):
        assert parse_override("a.b=3") == ("a.b", 3)
        assert parse_override("x=1e-4") == ("x", 1e-4)
        assert parse_override("y=true") == ("y", True)
        assert parse_override("z=hello") == ("z", "hello")

    def test_deep_merge(self):
        base = {"a": {"b": 1, "c": 2}, "d": 3}
        out = deep_merge(base, {"a": {"b": 9}})
        assert out == {"a": {"b": 9, "c": 2}, "d": 3}
        assert base["a"]["b"] == 1  # no mutation

    def test_compose_with_experiment_and_override(self, tmp_path):
        (tmp_path / "base.yaml").write_text(
            "a: 1\nlr: 2\nnested:\n  x: ${a}\n"
        )
        exp = tmp_path / "experiment"
        exp.mkdir()
        (exp / "v1.yaml").write_text("lr: 99\n")
        cfg = compose(tmp_path / "base.yaml", ["experiment=v1", "a=7"])
        assert cfg["lr"] == 99
        assert cfg["a"] == 7
        assert cfg["nested"]["x"] == 7  # interpolation after overrides


class TestNestedModelOverlays:
    """Experiment overlays must reach nested model sections (the reference
    journal overlays override encoder/decoder/dp freely, e.g. v19's
    decoder widening; configs/experiment/*)."""

    def test_shipped_overlays_compose(self):
        from matcha_tpu.train.__main__ import build_model_config
        from matcha_tpu.utils.configs import compose

        cfg = compose("configs/train.yaml", ["experiment=v19-rescue"])
        m = build_model_config(cfg)
        assert m.decoder.channels == (384, 384)
        assert m.duration_predictor.filter_channels == 96
        assert m.encoder.prenet_kernel_size == 3

        cfg = compose("configs/train.yaml", ["experiment=late-finetune"])
        m = build_model_config(cfg)
        assert m.prior_loss is False and m.encoder.p_dropout == 0.0

    def test_unknown_keys_raise(self):
        import pytest

        from matcha_tpu.train.__main__ import build_model_config

        with pytest.raises(ValueError, match="unknown model"):
            build_model_config({"model": {"typo_key": 1}})
        with pytest.raises(ValueError, match="unknown model.encoder"):
            build_model_config({"model": {"encoder": {"n_chanels": 7}}})

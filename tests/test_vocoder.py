"""Vocos vocoder tests: ISTFT parity vs torch.istft, shape contracts."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from matcha_tpu.vocoder.vocos import (
    Vocos,
    VocosConfig,
    init_vocos_params,
    istft_center,
    overlap_add,
)


class TestOverlapAdd:
    def test_single_frame(self):
        frames = jnp.ones((1, 1, 8))
        out = overlap_add(frames, hop=2)
        assert out.shape == (1, 8)
        np.testing.assert_array_equal(np.asarray(out), np.ones((1, 8)))

    def test_two_frames_overlap(self):
        frames = jnp.ones((1, 2, 8))
        out = np.asarray(overlap_add(frames, hop=2))
        assert out.shape == (1, 10)
        # positions 2..7 get contributions from both frames
        np.testing.assert_array_equal(out[0, 2:8], np.full(6, 2.0))
        np.testing.assert_array_equal(out[0, :2], np.ones(2))
        np.testing.assert_array_equal(out[0, 8:], np.ones(2))


class TestIstft:
    def test_matches_torch_istft(self):
        """Round-trip torch.stft → our istft must match torch.istft."""
        n_fft, hop = 256, 64
        rng = np.random.default_rng(0)
        wav = rng.standard_normal(hop * 40).astype(np.float32)
        spec_t = torch.stft(
            torch.tensor(wav),
            n_fft=n_fft,
            hop_length=hop,
            window=torch.hann_window(n_fft),
            center=True,
            return_complex=True,
        )
        ref = torch.istft(
            spec_t,
            n_fft=n_fft,
            hop_length=hop,
            window=torch.hann_window(n_fft),
            center=True,
        ).numpy()
        spec = jnp.asarray(spec_t.numpy().T)[None]  # (1, T, F)
        ours = np.asarray(istft_center(spec, n_fft, hop))[0]
        n = min(len(ours), len(ref))
        np.testing.assert_allclose(ours[:n], ref[:n], atol=1e-4)


class TestVocosModule:
    def test_output_shape_and_finite(self):
        cfg = VocosConfig(dim=64, intermediate_dim=128, num_layers=2)
        params = init_vocos_params(jax.random.PRNGKey(0), cfg)
        mel = jnp.asarray(
            np.random.default_rng(1).standard_normal((2, 12, 100)), jnp.float32
        )
        wav = Vocos(cfg).apply({"params": params}, mel)
        assert wav.shape == (2, 11 * cfg.hop_length)
        assert np.isfinite(np.asarray(wav)).all()


class TestInferVocosConfig:
    def test_round_trips_nondefault_widths(self):
        """load_synthesizer reads the VocosConfig off the pickle's shapes —
        any-width vocoder params (tests, distilled variants) must load
        without a sidecar config."""
        from matcha_tpu.cli import infer_vocos_config

        cfg = VocosConfig(
            input_channels=100, dim=32, intermediate_dim=64, num_layers=3,
            n_fft=512,
        )
        params = init_vocos_params(jax.random.PRNGKey(0), cfg)
        got = infer_vocos_config(params)
        assert (
            got.input_channels, got.dim, got.intermediate_dim,
            got.num_layers, got.n_fft,
        ) == (100, 32, 64, 3, 512)

    def test_default_config_inferred_exactly(self):
        from matcha_tpu.cli import infer_vocos_config

        cfg = VocosConfig()
        params = init_vocos_params(jax.random.PRNGKey(0), cfg)
        assert infer_vocos_config(params) == cfg

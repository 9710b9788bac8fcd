"""Vocos weight-port parity: torch vocos architecture → JAX Vocos.

The network is closed in this environment, so the actual HF checkpoint of
`charactr/vocos-mel-24khz` cannot be downloaded.  Instead this test
re-instantiates the EXACT torch architecture the checkpoint parameterizes
(vocos.models.VocosBackbone + vocos.heads.ISTFTHead with padding="center",
per the reference's pinned architecture file matcha/vocos24k/config.yaml)
with seeded random weights, whose state_dict keys byte-match the HF
checkpoint's.  tools/convert_vocos.py eats that state_dict and the JAX
waveform must match torch's — proving the converter + JAX implementation
reproduce whatever weights the real checkpoint supplies.

The torch modules below are written from the vocos package's published
architecture (ConvNeXt-1d blocks, layer-scale, exp-magnitude ISTFT head);
parameter names follow the checkpoint contract:
  backbone.embed / backbone.norm / backbone.convnext.{i}.{dwconv,norm,
  pwconv1,pwconv2,gamma} / backbone.final_layer_norm / head.out
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from matcha_tpu.vocoder.vocos import Vocos, VocosConfig  # noqa: E402
from tools.convert_vocos import convert_vocos_state_dict  # noqa: E402


class TorchConvNeXtBlock(nn.Module):
    def __init__(self, dim, intermediate_dim, layer_scale_init_value):
        super().__init__()
        self.dwconv = nn.Conv1d(dim, dim, kernel_size=7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, intermediate_dim)
        self.act = nn.GELU()
        self.pwconv2 = nn.Linear(intermediate_dim, dim)
        self.gamma = nn.Parameter(layer_scale_init_value * torch.ones(dim))

    def forward(self, x):  # (B, C, T)
        residual = x
        x = self.dwconv(x)
        x = x.transpose(1, 2)
        x = self.norm(x)
        x = self.pwconv1(x)
        x = self.act(x)
        x = self.pwconv2(x)
        x = self.gamma * x
        x = x.transpose(1, 2)
        return residual + x


class TorchVocosBackbone(nn.Module):
    def __init__(self, input_channels=100, dim=512, intermediate_dim=1536, num_layers=8):
        super().__init__()
        self.embed = nn.Conv1d(input_channels, dim, kernel_size=7, padding=3)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.convnext = nn.ModuleList(
            [
                TorchConvNeXtBlock(dim, intermediate_dim, 1.0 / num_layers)
                for _ in range(num_layers)
            ]
        )
        self.final_layer_norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):  # (B, n_mels, T)
        x = self.embed(x)
        x = self.norm(x.transpose(1, 2)).transpose(1, 2)
        for block in self.convnext:
            x = block(x)
        return self.final_layer_norm(x.transpose(1, 2))  # (B, T, dim)


class TorchISTFTHead(nn.Module):
    """ISTFT head, padding="center" → torch.istft(center=True)."""

    def __init__(self, dim=512, n_fft=1024, hop_length=256):
        super().__init__()
        self.out = nn.Linear(dim, n_fft + 2)
        self.n_fft = n_fft
        self.hop_length = hop_length

    def forward(self, x):  # (B, T, dim)
        x = self.out(x).transpose(1, 2)  # (B, n_fft+2, T)
        mag, p = x.chunk(2, dim=1)
        mag = torch.exp(mag)
        mag = torch.clip(mag, max=1e2)
        spec = mag * (torch.cos(p) + 1j * torch.sin(p))
        return torch.istft(
            spec,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.n_fft,
            window=torch.hann_window(self.n_fft),
            center=True,
        )


class TorchVocos(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TorchVocosBackbone()
        self.head = TorchISTFTHead()

    def forward(self, mel):  # (B, n_mels, T) → (B, (T-1)*hop)
        return self.head(self.backbone(mel))


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    tm = TorchVocos().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_vocos_state_dict(sd))
    return tm, Vocos(VocosConfig()), params


def test_state_dict_contract(models):
    """Every torch tensor converts; names match the HF checkpoint layout."""
    tm, _, params = models
    n_torch = len(tm.state_dict())
    n_jax = len(jax.tree.leaves(params))
    assert n_torch == n_jax == 8 * 9 + 8  # 8 blocks x 9 tensors + stem/head


def test_vocos_waveform_parity(models):
    tm, jm, params = models
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 100, 37)).astype(np.float32)

    with torch.no_grad():
        wav_t = tm(torch.from_numpy(mel)).numpy()

    wav_j = np.asarray(jm.apply({"params": params}, jnp.asarray(mel.transpose(0, 2, 1))))

    assert wav_j.shape == wav_t.shape == (2, 36 * 256)
    scale = np.abs(wav_t).max()
    np.testing.assert_allclose(wav_j, wav_t, atol=2e-4 * scale, rtol=1e-3)


def test_vocos_backbone_parity(models):
    """Feature-level check isolates the ConvNeXt stack from the ISTFT head."""
    tm, _, params = models
    from matcha_tpu.vocoder.vocos import VocosBackbone

    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 100, 24)).astype(np.float32)
    with torch.no_grad():
        feats_t = tm.backbone(torch.from_numpy(mel)).numpy()  # (B, T, dim)

    feats_j = np.asarray(
        VocosBackbone(VocosConfig()).apply(
            {"params": params["backbone"]}, jnp.asarray(mel.transpose(0, 2, 1))
        )
    )
    np.testing.assert_allclose(feats_j, feats_t, atol=5e-5, rtol=1e-4)

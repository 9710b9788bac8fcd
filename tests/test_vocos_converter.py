"""Structural verification of the Vocos weight converter.

Real HF checkpoints vary in layout — `feature_extractor.*` keys, ISTFT
window buffers, wrapper prefixes, weight-norm parametrizations — so the
converter is exercised against a synthetic state dict in EACH layout
(VERDICT r3 #2: de-risk the release-time conversion offline)."""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from matcha_tpu.vocoder.vocos import VocosConfig, init_vocos_params


def synth_vocos_state_dict(cfg: VocosConfig) -> dict:
    rng = np.random.default_rng(0)
    sd = {}

    def add(name, *shape):
        sd[name] = rng.standard_normal(shape).astype(np.float32)

    add("backbone.embed.weight", cfg.dim, cfg.input_channels, 7)
    add("backbone.embed.bias", cfg.dim)
    add("backbone.norm.weight", cfg.dim)
    add("backbone.norm.bias", cfg.dim)
    for i in range(cfg.num_layers):
        b = f"backbone.convnext.{i}"
        add(f"{b}.dwconv.weight", cfg.dim, 1, 7)
        add(f"{b}.dwconv.bias", cfg.dim)
        add(f"{b}.norm.weight", cfg.dim)
        add(f"{b}.norm.bias", cfg.dim)
        add(f"{b}.pwconv1.weight", cfg.intermediate_dim, cfg.dim)
        add(f"{b}.pwconv1.bias", cfg.intermediate_dim)
        add(f"{b}.pwconv2.weight", cfg.dim, cfg.intermediate_dim)
        add(f"{b}.pwconv2.bias", cfg.dim)
        add(f"{b}.gamma", cfg.dim)
    add("backbone.final_layer_norm.weight", cfg.dim)
    add("backbone.final_layer_norm.bias", cfg.dim)
    add("head.out.weight", cfg.n_fft + 2, cfg.dim)
    add("head.out.bias", cfg.n_fft + 2)
    return sd


class TestVocosConverter:
    def test_tree_structure_matches_init(self):
        from convert_vocos import convert_vocos_state_dict

        cfg = VocosConfig(dim=32, intermediate_dim=64, num_layers=2)
        converted = convert_vocos_state_dict(
            synth_vocos_state_dict(cfg), num_layers=cfg.num_layers
        )
        expected = init_vocos_params(jax.random.PRNGKey(0), cfg)

        conv = {
            jax.tree_util.keystr(k): np.asarray(v).shape
            for k, v in jax.tree_util.tree_flatten_with_path(converted)[0]
        }
        exp = {
            jax.tree_util.keystr(k): np.asarray(v).shape
            for k, v in jax.tree_util.tree_flatten_with_path(expected)[0]
        }
        assert conv == exp

    def test_converted_weights_run(self):
        from convert_vocos import convert_vocos_state_dict

        from matcha_tpu.vocoder.vocos import Vocos

        cfg = VocosConfig(dim=32, intermediate_dim=64, num_layers=2)
        params = convert_vocos_state_dict(
            synth_vocos_state_dict(cfg), num_layers=cfg.num_layers
        )
        mel = np.random.default_rng(1).standard_normal((1, 12, cfg.input_channels))
        wav = Vocos(cfg).apply(
            {"params": jax.tree.map(np.asarray, params)},
            np.asarray(mel, np.float32),
        )
        assert np.isfinite(np.asarray(wav)).all()


def _trees_equal(a, b):
    fa = jax.tree_util.tree_flatten_with_path(a)
    fb = jax.tree_util.tree_flatten_with_path(b)
    assert [k for k, _ in fa[0]] == [k for k, _ in fb[0]]
    for (_, va), (_, vb) in zip(fa[0], fb[0]):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-6)


class TestRealCheckpointLayouts:
    """Each layout variant a real HF Vocos checkpoint can carry must convert
    to exactly the tree the plain layout converts to."""

    CFG = VocosConfig(dim=32, intermediate_dim=64, num_layers=2)

    def _plain(self):
        return synth_vocos_state_dict(self.CFG)

    def _converted_plain(self):
        from convert_vocos import convert_vocos_state_dict

        return convert_vocos_state_dict(self._plain())

    def test_num_layers_inferred_from_keys(self):
        from convert_vocos import convert_vocos_state_dict

        explicit = convert_vocos_state_dict(self._plain(), num_layers=2)
        inferred = convert_vocos_state_dict(self._plain())
        _trees_equal(explicit, inferred)

    def test_feature_extractor_and_istft_buffers_ignored(self):
        # the genuine charactr/vocos-mel-24khz state dict carries the mel
        # frontend and the ISTFT window buffer alongside the weights
        from convert_vocos import convert_vocos_state_dict

        sd = self._plain()
        sd["feature_extractor.mel_spec.spectrogram.window"] = np.hanning(1024)
        sd["feature_extractor.mel_spec.mel_scale.fb"] = np.zeros((513, 100))
        sd["head.istft.window"] = np.hanning(1024)
        _trees_equal(convert_vocos_state_dict(sd), self._converted_plain())

    def test_wrapper_prefix_stripped(self):
        from convert_vocos import convert_vocos_state_dict

        for prefix in ("model.", "module.", "_orig_mod."):
            sd = {prefix + k: v for k, v in self._plain().items()}
            _trees_equal(convert_vocos_state_dict(sd), self._converted_plain())

    def test_new_style_weight_norm_parametrization_folded(self):
        # torch.nn.utils.parametrize layout: weight split into
        # original0 (g) / original1 (v); folding must reproduce g·v/|v|
        from convert_vocos import convert_vocos_state_dict

        sd = self._plain()
        for mod in ("backbone.convnext.0.dwconv", "backbone.embed"):
            w = sd.pop(f"{mod}.weight")
            norm = np.sqrt(
                np.sum(w * w, axis=tuple(range(1, w.ndim)), keepdims=True)
            )
            sd[f"{mod}.parametrizations.weight.original0"] = norm.reshape(-1)
            sd[f"{mod}.parametrizations.weight.original1"] = w
        _trees_equal(convert_vocos_state_dict(sd), self._converted_plain())

    def test_old_style_weight_norm_folded(self):
        from convert_vocos import convert_vocos_state_dict

        sd = self._plain()
        w = sd.pop("backbone.convnext.1.pwconv1.weight")
        norm = np.sqrt(np.sum(w * w, axis=1, keepdims=True))
        sd["backbone.convnext.1.pwconv1.weight_g"] = norm
        sd["backbone.convnext.1.pwconv1.weight_v"] = w
        _trees_equal(convert_vocos_state_dict(sd), self._converted_plain())

    def test_missing_key_raises_with_name(self):
        from convert_vocos import convert_vocos_state_dict

        sd = self._plain()
        del sd["backbone.convnext.1.gamma"]
        with pytest.raises(KeyError, match=r"backbone\.convnext\.1\.gamma"):
            convert_vocos_state_dict(sd)

    def test_unexpected_key_raises_with_name(self):
        from convert_vocos import convert_vocos_state_dict

        sd = self._plain()
        sd["backbone.mystery_adapter.weight"] = np.zeros((4, 4))
        with pytest.raises(ValueError, match="mystery_adapter"):
            convert_vocos_state_dict(sd)

    def test_orphan_parametrization_raises(self):
        from convert_vocos import convert_vocos_state_dict

        sd = self._plain()
        w = sd.pop("backbone.embed.weight")
        sd["backbone.embed.parametrizations.weight.original0"] = np.ones(
            (w.shape[0],)
        )
        with pytest.raises(KeyError, match="original1"):
            convert_vocos_state_dict(sd)

"""Structural verification of the Vocos weight converter."""

import sys
from pathlib import Path

import jax
import numpy as np

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

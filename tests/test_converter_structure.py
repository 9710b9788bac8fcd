"""Structural verification of the torch→flax checkpoint converter.

Builds a synthetic reference state_dict (names/shapes per the reference
architecture at production config), converts it, and requires the result to
match the real flax init tree EXACTLY in structure and shapes — so every
converter mapping lands on a parameter the model actually has, and no model
parameter goes unfilled.  Marked slow: inits the full ~32M-param model.
"""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from matcha_tpu.models.config import MatchaConfig


def synth_reference_state_dict(cfg: MatchaConfig) -> dict:
    """Reference state_dict skeleton (torch layouts) for the prod config."""
    sd = {}
    rng = np.random.default_rng(0)

    def add(name, *shape):
        sd[name] = rng.standard_normal(shape).astype(np.float32)

    C = cfg.encoder.n_channels          # 192
    H = C + cfg.spk_emb_dim             # 288
    F = cfg.n_feats                     # 100
    FC = cfg.encoder.filter_channels    # 1152
    K = cfg.encoder.kernel_size         # 5
    DP = cfg.duration_predictor

    add("speaker_embeddings_enc.weight", cfg.n_spks, cfg.spk_emb_dim)
    add("speaker_embeddings_dur.weight", cfg.n_spks, cfg.spk_emb_dim)
    add("encoder.emb.weight", 600, C)

    pk = cfg.encoder.prenet_kernel_size
    for i in range(cfg.encoder.prenet_layers):
        add(f"encoder.prenet.conv_layers.{i}.weight", C, C, pk)
        add(f"encoder.prenet.conv_layers.{i}.bias", C)
        add(f"encoder.prenet.norm_layers.{i}.gamma", C)
        add(f"encoder.prenet.norm_layers.{i}.beta", C)
    add("encoder.prenet.proj.weight", C, C, 1)
    add("encoder.prenet.proj.bias", C)

    for i in range(cfg.encoder.n_layers):
        for proj in ("conv_q", "conv_k", "conv_v", "conv_o"):
            add(f"encoder.encoder.attn_layers.{i}.{proj}.weight", H, H, 1)
            add(f"encoder.encoder.attn_layers.{i}.{proj}.bias", H)
        for which in ("norm_layers_1", "norm_layers_2"):
            add(f"encoder.encoder.{which}.{i}.gamma", H)
            add(f"encoder.encoder.{which}.{i}.beta", H)
        add(f"encoder.encoder.ffn_layers.{i}.conv_1.weight", FC, H, K)
        add(f"encoder.encoder.ffn_layers.{i}.conv_1.bias", FC)
        add(f"encoder.encoder.ffn_layers.{i}.conv_2.weight", H, FC, K)
        add(f"encoder.encoder.ffn_layers.{i}.conv_2.bias", H)

    add("encoder.proj_m.0.weight", C, H, 1)
    add("encoder.proj_m.0.bias", C)
    add("encoder.proj_m.2.weight", F, C, 1)
    add("encoder.proj_m.2.bias", F)

    add("encoder.proj_w.spk_proj.weight", 2 * DP.filter_channels, cfg.spk_emb_dim)
    add("encoder.proj_w.spk_proj.bias", 2 * DP.filter_channels)
    in_ch = H
    for i in range(DP.n_layers):
        add(f"encoder.proj_w.conv_layers.{i}.weight", DP.filter_channels, in_ch, DP.kernel_size)
        add(f"encoder.proj_w.conv_layers.{i}.bias", DP.filter_channels)
        add(f"encoder.proj_w.norm_layers.{i}.gamma", DP.filter_channels)
        add(f"encoder.proj_w.norm_layers.{i}.beta", DP.filter_channels)
        in_ch = DP.filter_channels
    add("encoder.proj_w.proj.weight", 1, DP.filter_channels, 1)
    add("encoder.proj_w.proj.bias", 1)

    # --- decoder U-Net ---
    dec = cfg.decoder
    ted = dec.channels[0] * 4
    in_ch = 2 * F
    add("decoder.estimator.time_mlp.linear_1.weight", ted, in_ch)
    add("decoder.estimator.time_mlp.linear_1.bias", ted)
    add("decoder.estimator.time_mlp.linear_2.weight", ted, ted)
    add("decoder.estimator.time_mlp.linear_2.bias", ted)

    def resnet(base, din, dout):
        add(f"{base}.mlp.1.weight", dout, ted)
        add(f"{base}.mlp.1.bias", dout)
        add(f"{base}.block1.block.0.weight", dout, din, 3)
        add(f"{base}.block1.block.0.bias", dout)
        add(f"{base}.block1.block.1.weight", dout)
        add(f"{base}.block1.block.1.bias", dout)
        add(f"{base}.block2.block.0.weight", dout, dout, 3)
        add(f"{base}.block2.block.0.bias", dout)
        add(f"{base}.block2.block.1.weight", dout)
        add(f"{base}.block2.block.1.bias", dout)
        add(f"{base}.res_conv.weight", dout, din, 1)
        add(f"{base}.res_conv.bias", dout)

    def tblock(base, dim):
        inner = dec.num_heads * dec.attention_head_dim
        for norm in ("norm1", "norm3"):
            add(f"{base}.{norm}.weight", dim)
            add(f"{base}.{norm}.bias", dim)
        for proj in ("to_q", "to_k", "to_v"):
            add(f"{base}.attn1.{proj}.weight", inner, dim)
        add(f"{base}.attn1.to_out.0.weight", dim, inner)
        add(f"{base}.attn1.to_out.0.bias", dim)
        add(f"{base}.ff.net.0.proj.weight", dim * 4, dim)
        add(f"{base}.ff.net.0.proj.bias", dim * 4)
        add(f"{base}.ff.net.0.alpha", dim * 4)
        add(f"{base}.ff.net.0.beta", dim * 4)
        add(f"{base}.ff.net.2.weight", dim, dim * 4)
        add(f"{base}.ff.net.2.bias", dim)

    e = "decoder.estimator"
    out_ch = in_ch
    for i, ch in enumerate(dec.channels):
        resnet(f"{e}.down_blocks.{i}.0", out_ch, ch)
        out_ch = ch
        for b in range(dec.n_blocks):
            tblock(f"{e}.down_blocks.{i}.1.{b}", ch)
        if i < len(dec.channels) - 1:
            add(f"{e}.down_blocks.{i}.2.conv.weight", ch, ch, 3)
            add(f"{e}.down_blocks.{i}.2.conv.bias", ch)
        else:
            add(f"{e}.down_blocks.{i}.2.weight", ch, ch, 3)
            add(f"{e}.down_blocks.{i}.2.bias", ch)

    for i in range(dec.num_mid_blocks):
        resnet(f"{e}.mid_blocks.{i}.0", dec.channels[-1], dec.channels[-1])
        for b in range(dec.n_blocks):
            tblock(f"{e}.mid_blocks.{i}.1.{b}", dec.channels[-1])

    up_channels = dec.channels[::-1] + (dec.channels[0],)
    for i in range(len(up_channels) - 1):
        din, dout = up_channels[i], up_channels[i + 1]
        resnet(f"{e}.up_blocks.{i}.0", 2 * din, dout)
        for b in range(dec.n_blocks):
            tblock(f"{e}.up_blocks.{i}.1.{b}", dout)
        if i < len(up_channels) - 2:
            add(f"{e}.up_blocks.{i}.2.conv.weight", dout, dout, 4)  # ConvT (in,out,k)
            add(f"{e}.up_blocks.{i}.2.conv.bias", dout)
        else:
            add(f"{e}.up_blocks.{i}.2.weight", dout, dout, 3)
            add(f"{e}.up_blocks.{i}.2.bias", dout)

    add(f"{e}.final_block.block.0.weight", up_channels[-1], up_channels[-1], 3)
    add(f"{e}.final_block.block.0.bias", up_channels[-1])
    add(f"{e}.final_block.block.1.weight", up_channels[-1])
    add(f"{e}.final_block.block.1.bias", up_channels[-1])
    add(f"{e}.final_proj.weight", F, up_channels[-1], 1)
    add(f"{e}.final_proj.bias", F)
    return sd


@pytest.mark.slow
class TestConverterStructure:
    def test_full_config_tree_match(self):
        from convert_matcha_ckpt import convert_state_dict

        from matcha_tpu.models.matcha import init_params

        cfg = MatchaConfig()
        sd = synth_reference_state_dict(cfg)
        converted = convert_state_dict(sd)

        expected = init_params(cfg, jax.random.PRNGKey(0))
        conv_flat = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
        exp_flat = dict(jax.tree_util.tree_flatten_with_path(expected)[0])

        conv_keys = {jax.tree_util.keystr(k) for k in conv_flat}
        exp_keys = {jax.tree_util.keystr(k) for k in exp_flat}
        missing = exp_keys - conv_keys
        extra = conv_keys - exp_keys
        assert not missing, f"converter leaves {sorted(missing)[:8]} unfilled"
        assert not extra, f"converter invents {sorted(extra)[:8]}"

        for k, v in exp_flat.items():
            assert np.asarray(conv_flat[k]).shape == np.asarray(v).shape, (
                jax.tree_util.keystr(k)
            )

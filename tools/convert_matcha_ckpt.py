"""Convert a reference (PyTorch Lightning) Matcha-TTS-24k checkpoint into
this framework's JAX checkpoint format.

Usage:
    python tools/convert_matcha_ckpt.py --input checkpoint.ckpt --output ckpt_dir

Reads ``{"state_dict", "hyper_parameters"}`` (the reference's
hparams-in-checkpoint contract, matcha/inference.py:186-197), maps every
tensor into the flax param tree, and writes a standard framework checkpoint.

Layout rules (verified by tests/test_converters.py against torch oracles):
  torch Conv1d   (out, in, k)   → flax Conv kernel (k, in, out)
  torch Linear   (out, in)      → flax Dense kernel (in, out)
  torch Conv1x1  (out, in, 1)   → flax Dense kernel (in, out)   [q/k/v convs]
  torch ConvT1d  (in, out, k)   → flax ConvTranspose(transpose_kernel=True)
                                   kernel (k, out, in)
  torch Embedding (n, d)        → flax Embed embedding (n, d)
``_orig_mod.`` segments (torch.compile wrappers) are stripped.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def conv_k(w: np.ndarray) -> np.ndarray:
    """torch Conv1d (out, in, k) → flax (k, in, out)."""
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def dense_k(w: np.ndarray) -> np.ndarray:
    """torch Linear (out, in) → flax (in, out)."""
    return np.ascontiguousarray(w.T)


def conv1x1_to_dense(w: np.ndarray) -> np.ndarray:
    """torch Conv1d kernel-1 (out, in, 1) → flax Dense (in, out)."""
    return np.ascontiguousarray(w[:, :, 0].T)


def convT_k(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose1d (in, out, k) → flax transpose_kernel=True (k, out, in)."""
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def set_path(tree: dict, path: str, value: np.ndarray):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def convert_state_dict(sd: dict, n_layers_enc: int = 4, prenet_layers: int = 6,
                       dp_layers: int = 4, channels=(320, 320),
                       n_blocks: int = 2, num_mid_blocks: int = 2,
                       strict: bool = False) -> dict:
    """Map the reference state_dict to the flax param tree."""
    sd = {k.replace("._orig_mod", ""): np.asarray(v) for k, v in sd.items()}
    params: dict = {}
    consumed = set()

    def take(name):
        consumed.add(name)
        return sd[name]

    # --- speaker tables -------------------------------------------------
    for tab in ("speaker_embeddings_enc", "speaker_embeddings_dur"):
        set_path(params, f"{tab}/embedding", take(f"{tab}.weight"))

    # --- text encoder ----------------------------------------------------
    set_path(params, "encoder/emb/embedding", take("encoder.emb.weight"))

    for i in range(prenet_layers):
        base = f"encoder.prenet.conv_layers.{i}"
        set_path(params, f"encoder/prenet/Conv_{i}/kernel", conv_k(take(f"{base}.weight")))
        set_path(params, f"encoder/prenet/Conv_{i}/bias", take(f"{base}.bias"))
        nbase = f"encoder.prenet.norm_layers.{i}"
        set_path(params, f"encoder/prenet/ChannelLayerNorm_{i}/gamma", take(f"{nbase}.gamma"))
        set_path(params, f"encoder/prenet/ChannelLayerNorm_{i}/beta", take(f"{nbase}.beta"))
    set_path(params, f"encoder/prenet/Conv_{prenet_layers}/kernel",
             conv_k(take("encoder.prenet.proj.weight")))
    set_path(params, f"encoder/prenet/Conv_{prenet_layers}/bias",
             take("encoder.prenet.proj.bias"))

    for i in range(n_layers_enc):
        abase = f"encoder.encoder.attn_layers.{i}"
        tgt = f"encoder/encoder/RopeSelfAttention_{i}"
        for src, dst in (("conv_q", "q"), ("conv_k", "k"), ("conv_v", "v"), ("conv_o", "out")):
            set_path(params, f"{tgt}/{dst}/kernel", conv1x1_to_dense(take(f"{abase}.{src}.weight")))
            set_path(params, f"{tgt}/{dst}/bias", take(f"{abase}.{src}.bias"))
        for which, norm_idx in (("norm_layers_1", 2 * i), ("norm_layers_2", 2 * i + 1)):
            nbase = f"encoder.encoder.{which}.{i}"
            set_path(params, f"encoder/encoder/ChannelLayerNorm_{norm_idx}/gamma", take(f"{nbase}.gamma"))
            set_path(params, f"encoder/encoder/ChannelLayerNorm_{norm_idx}/beta", take(f"{nbase}.beta"))
        fbase = f"encoder.encoder.ffn_layers.{i}"
        set_path(params, f"encoder/encoder/ConvFFN_{i}/Conv_0/kernel", conv_k(take(f"{fbase}.conv_1.weight")))
        set_path(params, f"encoder/encoder/ConvFFN_{i}/Conv_0/bias", take(f"{fbase}.conv_1.bias"))
        set_path(params, f"encoder/encoder/ConvFFN_{i}/Conv_1/kernel", conv_k(take(f"{fbase}.conv_2.weight")))
        set_path(params, f"encoder/encoder/ConvFFN_{i}/Conv_1/bias", take(f"{fbase}.conv_2.bias"))

    set_path(params, "encoder/proj_m_hidden/kernel", conv_k(take("encoder.proj_m.0.weight")))
    set_path(params, "encoder/proj_m_hidden/bias", take("encoder.proj_m.0.bias"))
    set_path(params, "encoder/proj_m_out/kernel", conv_k(take("encoder.proj_m.2.weight")))
    set_path(params, "encoder/proj_m_out/bias", take("encoder.proj_m.2.bias"))

    set_path(params, "encoder/proj_w/spk_proj/kernel", dense_k(take("encoder.proj_w.spk_proj.weight")))
    set_path(params, "encoder/proj_w/spk_proj/bias", take("encoder.proj_w.spk_proj.bias"))
    for i in range(dp_layers):
        base = f"encoder.proj_w.conv_layers.{i}"
        set_path(params, f"encoder/proj_w/Conv_{i}/kernel", conv_k(take(f"{base}.weight")))
        set_path(params, f"encoder/proj_w/Conv_{i}/bias", take(f"{base}.bias"))
        nbase = f"encoder.proj_w.norm_layers.{i}"
        set_path(params, f"encoder/proj_w/ChannelLayerNorm_{i}/gamma", take(f"{nbase}.gamma"))
        set_path(params, f"encoder/proj_w/ChannelLayerNorm_{i}/beta", take(f"{nbase}.beta"))
    set_path(params, f"encoder/proj_w/Conv_{dp_layers}/kernel", conv_k(take("encoder.proj_w.proj.weight")))
    set_path(params, f"encoder/proj_w/Conv_{dp_layers}/bias", take("encoder.proj_w.proj.bias"))

    # --- decoder (CFM estimator U-Net) ----------------------------------
    dec = "decoder.estimator"
    set_path(params, "decoder/time_mlp/linear_1/kernel", dense_k(take(f"{dec}.time_mlp.linear_1.weight")))
    set_path(params, "decoder/time_mlp/linear_1/bias", take(f"{dec}.time_mlp.linear_1.bias"))
    set_path(params, "decoder/time_mlp/linear_2/kernel", dense_k(take(f"{dec}.time_mlp.linear_2.weight")))
    set_path(params, "decoder/time_mlp/linear_2/bias", take(f"{dec}.time_mlp.linear_2.bias"))

    def resnet(src_base: str, dst_base: str):
        set_path(params, f"{dst_base}/time_proj/kernel", dense_k(take(f"{src_base}.mlp.1.weight")))
        set_path(params, f"{dst_base}/time_proj/bias", take(f"{src_base}.mlp.1.bias"))
        for blk in ("block1", "block2"):
            set_path(params, f"{dst_base}/{blk}/Conv_0/kernel", conv_k(take(f"{src_base}.{blk}.block.0.weight")))
            set_path(params, f"{dst_base}/{blk}/Conv_0/bias", take(f"{src_base}.{blk}.block.0.bias"))
            set_path(params, f"{dst_base}/{blk}/GroupNorm_0/scale", take(f"{src_base}.{blk}.block.1.weight"))
            set_path(params, f"{dst_base}/{blk}/GroupNorm_0/bias", take(f"{src_base}.{blk}.block.1.bias"))
        set_path(params, f"{dst_base}/res_conv/kernel", conv_k(take(f"{src_base}.res_conv.weight")))
        set_path(params, f"{dst_base}/res_conv/bias", take(f"{src_base}.res_conv.bias"))

    def tblock(src_base: str, dst_base: str):
        for norm in ("norm1", "norm3"):
            set_path(params, f"{dst_base}/{norm}/scale", take(f"{src_base}.{norm}.weight"))
            set_path(params, f"{dst_base}/{norm}/bias", take(f"{src_base}.{norm}.bias"))
        for proj in ("to_q", "to_k", "to_v"):
            set_path(params, f"{dst_base}/{proj}/kernel", dense_k(take(f"{src_base}.attn1.{proj}.weight")))
        set_path(params, f"{dst_base}/to_out/kernel", dense_k(take(f"{src_base}.attn1.to_out.0.weight")))
        set_path(params, f"{dst_base}/to_out/bias", take(f"{src_base}.attn1.to_out.0.bias"))
        set_path(params, f"{dst_base}/ff/proj_in/kernel", dense_k(take(f"{src_base}.ff.net.0.proj.weight")))
        set_path(params, f"{dst_base}/ff/proj_in/bias", take(f"{src_base}.ff.net.0.proj.bias"))
        set_path(params, f"{dst_base}/ff/alpha", take(f"{src_base}.ff.net.0.alpha"))
        set_path(params, f"{dst_base}/ff/beta", take(f"{src_base}.ff.net.0.beta"))
        set_path(params, f"{dst_base}/ff/proj_out/kernel", dense_k(take(f"{src_base}.ff.net.2.weight")))
        set_path(params, f"{dst_base}/ff/proj_out/bias", take(f"{src_base}.ff.net.2.bias"))

    n_down = len(channels)
    for i in range(n_down):
        resnet(f"{dec}.down_blocks.{i}.0", f"decoder/down{i}_resnet")
        for b in range(n_blocks):
            tblock(f"{dec}.down_blocks.{i}.1.{b}", f"decoder/down{i}_tblock{b}")
        is_last = i == n_down - 1
        if not is_last:
            set_path(params, f"decoder/down{i}_downsample/Conv_0/kernel",
                     conv_k(take(f"{dec}.down_blocks.{i}.2.conv.weight")))
            set_path(params, f"decoder/down{i}_downsample/Conv_0/bias",
                     take(f"{dec}.down_blocks.{i}.2.conv.bias"))
        else:
            set_path(params, f"decoder/down{i}_conv/kernel",
                     conv_k(take(f"{dec}.down_blocks.{i}.2.weight")))
            set_path(params, f"decoder/down{i}_conv/bias",
                     take(f"{dec}.down_blocks.{i}.2.bias"))

    for i in range(num_mid_blocks):
        resnet(f"{dec}.mid_blocks.{i}.0", f"decoder/mid{i}_resnet")
        for b in range(n_blocks):
            tblock(f"{dec}.mid_blocks.{i}.1.{b}", f"decoder/mid{i}_tblock{b}")

    for i in range(n_down):
        resnet(f"{dec}.up_blocks.{i}.0", f"decoder/up{i}_resnet")
        for b in range(n_blocks):
            tblock(f"{dec}.up_blocks.{i}.1.{b}", f"decoder/up{i}_tblock{b}")
        is_last = i == n_down - 1
        if not is_last:
            set_path(params, f"decoder/up{i}_upsample/ConvTranspose_0/kernel",
                     convT_k(take(f"{dec}.up_blocks.{i}.2.conv.weight")))
            set_path(params, f"decoder/up{i}_upsample/ConvTranspose_0/bias",
                     take(f"{dec}.up_blocks.{i}.2.conv.bias"))
        else:
            set_path(params, f"decoder/up{i}_conv/kernel",
                     conv_k(take(f"{dec}.up_blocks.{i}.2.weight")))
            set_path(params, f"decoder/up{i}_conv/bias",
                     take(f"{dec}.up_blocks.{i}.2.bias"))

    set_path(params, "decoder/final_block/Conv_0/kernel", conv_k(take(f"{dec}.final_block.block.0.weight")))
    set_path(params, "decoder/final_block/Conv_0/bias", take(f"{dec}.final_block.block.0.bias"))
    set_path(params, "decoder/final_block/GroupNorm_0/scale", take(f"{dec}.final_block.block.1.weight"))
    set_path(params, "decoder/final_block/GroupNorm_0/bias", take(f"{dec}.final_block.block.1.bias"))
    set_path(params, "decoder/final_proj/kernel", conv_k(take(f"{dec}.final_proj.weight")))
    set_path(params, "decoder/final_proj/bias", take(f"{dec}.final_proj.bias"))

    leftovers = [
        k for k in sd
        if k not in consumed and not k.startswith(("mel_mean", "mel_std"))
    ]
    if leftovers:
        msg = f"{len(leftovers)} unconverted tensors (first 10): {leftovers[:10]}"
        if strict:
            raise ValueError(msg)
        print(f"[!] {msg}")
    return params


def convert_style_encoder_state_dict(sd: dict, n_layers: int = 4) -> dict:
    """Reference StyleEncoder state_dict → flax param tree.

    Layout (reference: matcha/models/style_encoder.py:49-57): ``convs.{i}``
    Conv1d(k=5) stack + ``proj_enc``/``proj_dur`` linear heads, mapping onto
    matcha_tpu.models.style_encoder.StyleEncoder's ``conv{i}`` /
    ``head_enc`` / ``head_dur``.  ``style_encoder.`` /  ``_orig_mod.``
    prefixes (LightningModule nesting, torch.compile) are stripped.
    """
    sd = {
        k.replace("._orig_mod", "").removeprefix("style_encoder."): np.asarray(v)
        for k, v in sd.items()
        if not k.startswith("matcha.")  # frozen MatchaTTS lives alongside
    }
    params: dict = {}
    for i in range(n_layers):
        set_path(params, f"conv{i}/kernel", conv_k(sd[f"convs.{i}.weight"]))
        set_path(params, f"conv{i}/bias", sd[f"convs.{i}.bias"])
    set_path(params, "head_enc/kernel", dense_k(sd["proj_enc.weight"]))
    set_path(params, "head_enc/bias", sd["proj_enc.bias"])
    set_path(params, "head_dur/kernel", dense_k(sd["proj_dur.weight"]))
    set_path(params, "head_dur/bias", sd["proj_dur.bias"])
    return params


def _get(obj, key, default=None):
    """Field access across the hyper_parameters representations Lightning
    checkpoints carry in the wild: plain dicts, argparse.Namespace-likes,
    and omegaconf DictConfigs (all attribute- or item-accessible)."""
    if obj is None:
        return default
    if isinstance(obj, dict):
        return obj.get(key, default)
    try:
        return getattr(obj, key)
    except AttributeError:
        try:
            return obj[key]
        except Exception:
            return default


def config_from_hparams(hp) -> "MatchaConfig":
    """Rebuild the FULL MatchaConfig from a checkpoint's ``hyper_parameters``.

    The reference rebuilds its model from these exact fields
    (matcha/inference.py:186-197 passes hparams straight into
    ``MatchaTTSInfer(**hparams)``; field names per matcha_tts.py:17-31 and
    configs/model/*), so a checkpoint trained at non-default widths must
    round-trip through here — NOT through hardcoded production defaults.
    """
    from matcha_tpu.models.config import (
        CFMConfig,
        DataStatistics,
        DecoderConfig,
        DurationPredictorConfig,
        EncoderConfig,
        MatchaConfig,
    )

    base = MatchaConfig()
    enc_wrap = _get(hp, "encoder")
    ep = _get(enc_wrap, "encoder_params")
    dpp = _get(enc_wrap, "duration_predictor_params")
    dec = _get(hp, "decoder")
    cfm = _get(hp, "cfm")
    stats = _get(hp, "data_statistics") or {}

    n_feats = int(_get(hp, "n_feats", base.n_feats))
    encoder = EncoderConfig(
        n_feats=int(_get(ep, "n_feats", n_feats)),
        n_channels=int(_get(ep, "n_channels", base.encoder.n_channels)),
        filter_channels=int(
            _get(ep, "filter_channels", base.encoder.filter_channels)
        ),
        n_heads=int(_get(ep, "n_heads", base.encoder.n_heads)),
        n_layers=int(_get(ep, "n_layers", base.encoder.n_layers)),
        kernel_size=int(_get(ep, "kernel_size", base.encoder.kernel_size)),
        p_dropout=float(_get(ep, "p_dropout", base.encoder.p_dropout)),
        prenet=bool(_get(ep, "prenet", True)),
        prenet_kernel_size=int(
            _get(ep, "prenet_kernel_size", base.encoder.prenet_kernel_size)
        ),
        # fixed at 6 in the reference (text_encoder.py:343)
        prenet_layers=base.encoder.prenet_layers,
    )
    duration_predictor = DurationPredictorConfig(
        filter_channels=int(
            _get(dpp, "filter_channels_dp", base.duration_predictor.filter_channels)
        ),
        kernel_size=int(
            _get(dpp, "kernel_size", base.duration_predictor.kernel_size)
        ),
        p_dropout=float(
            _get(dpp, "p_dropout", base.duration_predictor.p_dropout)
        ),
        n_layers=int(_get(dpp, "n_layers", base.duration_predictor.n_layers)),
    )
    decoder = DecoderConfig(
        channels=tuple(
            int(c) for c in (_get(dec, "channels") or base.decoder.channels)
        ),
        dropout=float(_get(dec, "dropout", base.decoder.dropout)),
        attention_head_dim=int(
            _get(dec, "attention_head_dim", base.decoder.attention_head_dim)
        ),
        n_blocks=int(_get(dec, "n_blocks", base.decoder.n_blocks)),
        num_mid_blocks=int(
            _get(dec, "num_mid_blocks", base.decoder.num_mid_blocks)
        ),
        num_heads=int(_get(dec, "num_heads", base.decoder.num_heads)),
    )
    cfm_cfg = CFMConfig(
        solver=str(_get(cfm, "solver", base.cfm.solver)),
        sigma_min=float(_get(cfm, "sigma_min", base.cfm.sigma_min)),
        use_mu_prior=bool(_get(cfm, "use_mu_prior", base.cfm.use_mu_prior)),
    )
    return MatchaConfig(
        n_spks=int(_get(hp, "n_spks", base.n_spks)),
        n_feats=n_feats,
        spk_emb_dim=int(_get(hp, "spk_emb_dim", base.spk_emb_dim)),
        encoder=encoder,
        duration_predictor=duration_predictor,
        decoder=decoder,
        cfm=cfm_cfg,
        data_statistics=DataStatistics(
            mel_mean=float(_get(stats, "mel_mean", -4.684777)),
            mel_std=float(_get(stats, "mel_std", 6.512275)),
        ),
        prior_loss=bool(_get(hp, "prior_loss", True)),
        prior_loss_threshold=float(
            _get(hp, "prior_loss_threshold", base.prior_loss_threshold)
        ),
        duration_loss_threshold=float(
            _get(hp, "duration_loss_threshold", base.duration_loss_threshold)
        ),
    )


def main(argv=None):
    import torch

    from matcha_tpu.train.checkpoint import save_checkpoint

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument(
        "--strict", action="store_true",
        help="fail on unconverted tensors instead of warning",
    )
    args = parser.parse_args(argv)

    ckpt = torch.load(args.input, map_location="cpu", weights_only=False)
    sd = {k: v.float().numpy() for k, v in ckpt["state_dict"].items()}
    cfg = config_from_hparams(ckpt.get("hyper_parameters", {}))
    params = convert_state_dict(
        sd,
        n_layers_enc=cfg.encoder.n_layers,
        prenet_layers=cfg.encoder.prenet_layers,
        dp_layers=cfg.duration_predictor.n_layers,
        channels=cfg.decoder.channels,
        n_blocks=cfg.decoder.n_blocks,
        num_mid_blocks=cfg.decoder.num_mid_blocks,
        strict=args.strict,
    )
    save_checkpoint(args.output, {"params": params, "step": 0}, cfg)
    print(
        f"converted → {args.output} "
        f"(enc {cfg.encoder.n_channels}ch×{cfg.encoder.n_layers}L, "
        f"dec {cfg.decoder.channels}, n_spks={cfg.n_spks})"
    )


if __name__ == "__main__":
    main()

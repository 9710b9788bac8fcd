"""Convert `charactr/vocos-mel-24khz` torch weights to JAX Vocos params.

Usage:
    python tools/convert_vocos.py --input pytorch_model.bin --output vocos.pkl

Input: the HF torch state dict (``Vocos.from_pretrained`` weights the
reference loads at runtime — matcha/vocos24k/vocos_wrapper.py:11).  Output:
a pickled flax param tree for matcha_tpu.vocoder.vocos.Vocos.

Layout rules are shared with tools/convert_matcha_ckpt.py and verified by
tests/test_converters.py.  The depthwise conv7 is the one special case:
torch stores (dim, 1, 7) groups=dim; flax feature_group_count=dim expects
kernel (7, 1, dim).
"""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

try:
    from tools.convert_matcha_ckpt import conv_k, dense_k, set_path
except ImportError:  # invoked as a script from inside tools/
    from convert_matcha_ckpt import conv_k, dense_k, set_path  # noqa: F401


def dwconv_k(w: np.ndarray) -> np.ndarray:
    """torch depthwise Conv1d (dim, 1, k) → flax (k, 1, dim)."""
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def convert_vocos_state_dict(sd: dict, num_layers: int = 8) -> dict:
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {}

    set_path(params, "backbone/embed/kernel", conv_k(sd["backbone.embed.weight"]))
    set_path(params, "backbone/embed/bias", sd["backbone.embed.bias"])
    set_path(params, "backbone/norm/scale", sd["backbone.norm.weight"])
    set_path(params, "backbone/norm/bias", sd["backbone.norm.bias"])
    for i in range(num_layers):
        src = f"backbone.convnext.{i}"
        dst = f"backbone/convnext{i}"
        set_path(params, f"{dst}/dwconv/kernel", dwconv_k(sd[f"{src}.dwconv.weight"]))
        set_path(params, f"{dst}/dwconv/bias", sd[f"{src}.dwconv.bias"])
        set_path(params, f"{dst}/norm/scale", sd[f"{src}.norm.weight"])
        set_path(params, f"{dst}/norm/bias", sd[f"{src}.norm.bias"])
        set_path(params, f"{dst}/pwconv1/kernel", dense_k(sd[f"{src}.pwconv1.weight"]))
        set_path(params, f"{dst}/pwconv1/bias", sd[f"{src}.pwconv1.bias"])
        set_path(params, f"{dst}/pwconv2/kernel", dense_k(sd[f"{src}.pwconv2.weight"]))
        set_path(params, f"{dst}/pwconv2/bias", sd[f"{src}.pwconv2.bias"])
        set_path(params, f"{dst}/gamma", sd[f"{src}.gamma"])
    set_path(params, "backbone/final_layer_norm/scale", sd["backbone.final_layer_norm.weight"])
    set_path(params, "backbone/final_layer_norm/bias", sd["backbone.final_layer_norm.bias"])
    set_path(params, "head/out/kernel", dense_k(sd["head.out.weight"]))
    set_path(params, "head/out/bias", sd["head.out.bias"])
    return params


def verify(pkl_path: str, atol: float = 1e-3) -> float:
    """Numerical release gate: JAX Vocos vs the REAL torch ``vocos`` package.

    Runs both on 4 random mels and returns max|Δ| over the waveforms.
    Requires the ``vocos`` pip package (network host only) — this is the one
    check the offline parity suite cannot perform (its torch oracle is
    hand-written; see RELEASE.md step 1).
    """
    import jax.numpy as jnp
    import torch
    from vocos import Vocos as TorchVocos

    from matcha_tpu.vocoder.vocos import Vocos, VocosConfig

    tv = TorchVocos.from_pretrained("charactr/vocos-mel-24khz").eval()
    with open(pkl_path, "rb") as f:
        params = pickle.load(f)

    rng = np.random.default_rng(0)
    worst = 0.0
    for _ in range(4):
        mel = rng.standard_normal((1, 100, 120)).astype(np.float32) * 2.0 - 4.0
        with torch.no_grad():
            ref = tv.decode(torch.from_numpy(mel)).numpy()
        out = np.asarray(
            Vocos(VocosConfig()).apply(
                {"params": params}, jnp.asarray(np.transpose(mel, (0, 2, 1)))
            )
        )
        worst = max(worst, float(np.abs(out[:, : ref.shape[-1]] - ref).max()))
    status = "OK" if worst < atol else "FAIL"
    print(f"verify vs torch vocos: max|Δ| = {worst:.2e} [{status}]")
    if worst >= atol:
        raise SystemExit(1)
    return worst


def main(argv=None):
    import torch

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", help="local HF torch state-dict file")
    parser.add_argument(
        "--pretrained",
        help="HF repo id to download instead of --input, "
        "e.g. charactr/vocos-mel-24khz (network host only)",
    )
    parser.add_argument("--output")
    parser.add_argument(
        "--verify",
        metavar="VOCOS_PKL",
        help="compare a converted pkl against the torch vocos package and exit",
    )
    args = parser.parse_args(argv)

    if args.verify:
        verify(args.verify)
        return
    if not args.output or not (args.input or args.pretrained):
        parser.error("--output plus one of --input/--pretrained is required")

    src = args.input
    if args.pretrained:
        from huggingface_hub import hf_hub_download

        src = hf_hub_download(repo_id=args.pretrained, filename="pytorch_model.bin")
    sd = torch.load(src, map_location="cpu", weights_only=True)
    params = convert_vocos_state_dict({k: v.float().numpy() for k, v in sd.items()})
    with open(args.output, "wb") as f:
        pickle.dump(params, f)
    print(f"converted vocos weights → {args.output}")


if __name__ == "__main__":
    main()

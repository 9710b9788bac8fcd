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
import difflib
import pickle
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

try:
    from tools.convert_matcha_ckpt import conv_k, dense_k, set_path
except ImportError:  # invoked as a script from inside tools/
    from convert_matcha_ckpt import conv_k, dense_k, set_path  # noqa: F401


def dwconv_k(w: np.ndarray) -> np.ndarray:
    """torch depthwise Conv1d (dim, 1, 7) → flax (7, 1, dim)."""
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


# keys that legitimately appear in real HF Vocos checkpoints but carry no
# learned backbone/head weights: the mel feature extractor (we have our own
# JAX mel frontend) and the ISTFT window buffer (recomputed at runtime)
_IGNORABLE_PREFIXES = ("feature_extractor.", "head.istft.")
# wrapper prefixes torch training/compilation utilities prepend to every key
_WRAPPER_PREFIXES = ("model.", "module.", "_orig_mod.")


def _strip_wrapper_prefixes(sd: dict) -> dict:
    """Strip `model.` / `module.` / `_orig_mod.` wrappers (DataParallel,
    torch.compile, lightning exports) when EVERY key carries one."""
    changed = True
    while changed:
        changed = False
        for p in _WRAPPER_PREFIXES:
            if sd and all(k.startswith(p) for k in sd):
                sd = {k[len(p):]: v for k, v in sd.items()}
                changed = True
    return sd


def _fold_weight_norm(sd: dict) -> dict:
    """Fold torch weight-norm layouts into plain ``<module>.weight`` keys.

    New-style (``torch.nn.utils.parametrize``):
        <m>.parametrizations.weight.original0  (g, the magnitude)
        <m>.parametrizations.weight.original1  (v, the direction)
    Old-style (``torch.nn.utils.weight_norm``): ``<m>.weight_g`` + ``<m>.weight_v``.

    Both mean weight = g * v / ||v|| with the norm over every dim but 0
    (weight_norm's default dim=0, which is what vocos' ConvNeXt uses).
    """

    def folded(g: np.ndarray, v: np.ndarray) -> np.ndarray:
        g = g.reshape(g.shape[0], *([1] * (v.ndim - 1)))
        norm = np.sqrt(np.sum(v * v, axis=tuple(range(1, v.ndim)), keepdims=True))
        return (g * v / norm).astype(v.dtype)

    out: dict = {}
    consumed: set[str] = set()
    for k, g in sd.items():
        m = re.match(r"(.+)\.parametrizations\.(\w+)\.original0$", k)
        if m:
            base, pname = m.groups()
            partner = f"{base}.parametrizations.{pname}.original1"
            if partner not in sd:
                raise KeyError(
                    f"weight-norm parametrization {k!r} has no {partner!r}"
                )
            out[f"{base}.{pname}"] = folded(g, sd[partner])
            consumed.update((k, partner))
            continue
        m = re.match(r"(.+)\.weight_g$", k)
        if m and f"{m.group(1)}.weight_v" in sd:
            out[f"{m.group(1)}.weight"] = folded(g, sd[f"{m.group(1)}.weight_v"])
            consumed.update((k, f"{m.group(1)}.weight_v"))
    for k, v in sd.items():
        if k not in consumed:
            out[k] = v
    return out


def convert_vocos_state_dict(sd: dict, num_layers: int | None = None) -> dict:
    """Torch Vocos state dict → flax param tree, tolerantly.

    Real HF checkpoints vary in layout: `feature_extractor.*` keys, the
    `head.istft.window` buffer, wrapper prefixes, and weight-norm
    parametrizations all occur in the wild — each is normalized or skipped
    here instead of dying at release time (the one remaining serving
    blocker, RELEASE.md §1).  ``num_layers=None`` infers the ConvNeXt depth
    from the keys.  Unknown leftover keys raise with their names so a
    genuine layout change is loud, not silently wrong.
    """
    sd = _strip_wrapper_prefixes({k: np.asarray(v) for k, v in sd.items()})
    sd = _fold_weight_norm(sd)

    if num_layers is None:
        idx = [
            int(m.group(1))
            for k in sd
            if (m := re.match(r"backbone\.convnext\.(\d+)\.", k))
        ]
        if not idx:
            raise KeyError(
                "no backbone.convnext.<i>.* keys found — is this a Vocos "
                f"state dict?  sample keys: {sorted(sd)[:5]}"
            )
        num_layers = max(idx) + 1

    used: set[str] = set()

    def take(key: str) -> np.ndarray:
        if key not in sd:
            near = difflib.get_close_matches(key, sd.keys(), n=3, cutoff=0.4)
            raise KeyError(
                f"state dict is missing {key!r}"
                + (f"; closest present keys: {near}" if near else "")
            )
        used.add(key)
        return sd[key]

    params: dict = {}
    set_path(params, "backbone/embed/kernel", conv_k(take("backbone.embed.weight")))
    set_path(params, "backbone/embed/bias", take("backbone.embed.bias"))
    set_path(params, "backbone/norm/scale", take("backbone.norm.weight"))
    set_path(params, "backbone/norm/bias", take("backbone.norm.bias"))
    for i in range(num_layers):
        src = f"backbone.convnext.{i}"
        dst = f"backbone/convnext{i}"
        set_path(params, f"{dst}/dwconv/kernel", dwconv_k(take(f"{src}.dwconv.weight")))
        set_path(params, f"{dst}/dwconv/bias", take(f"{src}.dwconv.bias"))
        set_path(params, f"{dst}/norm/scale", take(f"{src}.norm.weight"))
        set_path(params, f"{dst}/norm/bias", take(f"{src}.norm.bias"))
        set_path(params, f"{dst}/pwconv1/kernel", dense_k(take(f"{src}.pwconv1.weight")))
        set_path(params, f"{dst}/pwconv1/bias", take(f"{src}.pwconv1.bias"))
        set_path(params, f"{dst}/pwconv2/kernel", dense_k(take(f"{src}.pwconv2.weight")))
        set_path(params, f"{dst}/pwconv2/bias", take(f"{src}.pwconv2.bias"))
        set_path(params, f"{dst}/gamma", take(f"{src}.gamma"))
    set_path(params, "backbone/final_layer_norm/scale", take("backbone.final_layer_norm.weight"))
    set_path(params, "backbone/final_layer_norm/bias", take("backbone.final_layer_norm.bias"))
    set_path(params, "head/out/kernel", dense_k(take("head.out.weight")))
    set_path(params, "head/out/bias", take("head.out.bias"))

    leftover = sorted(
        k
        for k in sd
        if k not in used and not k.startswith(_IGNORABLE_PREFIXES)
    )
    if leftover:
        raise ValueError(
            "unexpected state-dict keys were not converted (Vocos layout "
            f"change?): {leftover[:10]}"
            + (f" … and {len(leftover) - 10} more" if len(leftover) > 10 else "")
        )
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

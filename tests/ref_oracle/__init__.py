"""Test oracle: run the ACTUAL reference PyTorch model code on CPU.

The reference (/root/reference, read-only) depends on packages that are not
installed in this image (lightning, diffusers, torchdiffeq, conformer,
super_monotonic_align).  ``stubs/`` provides minimal behaviour-faithful
substitutes for exactly the APIs the reference model code touches, so the
genuine reference modules (matcha/models/**.py — pure torch math) can be
imported and executed as a numerical oracle for parity tests.

Nothing here ships in the framework; it exists only so tests can prove
"convert_matcha_ckpt(reference state_dict) → JAX forward == torch forward".
"""

from __future__ import annotations

import sys
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")
STUBS = Path(__file__).resolve().parent / "stubs"

_loaded = None


def reference_available() -> bool:
    return (REFERENCE_ROOT / "matcha" / "models" / "matcha_tts.py").is_file()


def load_reference():
    """Import the reference matcha model modules (cached).

    Returns a namespace dict with the reference modules.  torch.compile is
    replaced by identity BEFORE import: the reference compiles its encoder and
    decoder-FF at module construction (text_encoder.py:357, transformer.py:219)
    and Inductor is unavailable/irrelevant on this CPU oracle path.  The only
    observable difference is the absence of the ``_orig_mod.`` state_dict
    prefix, which the converter strips anyway.
    """
    global _loaded
    if _loaded is not None:
        return _loaded

    import torch

    torch.compile = lambda model=None, **kw: model  # identity: oracle runs eager

    for p in (str(STUBS), str(REFERENCE_ROOT)):
        if p not in sys.path:
            sys.path.insert(0, p)

    import matcha.models.matcha_tts as ref_matcha_tts
    import matcha.models.components.decoder as ref_decoder
    import matcha.models.components.flow_matching as ref_flow_matching
    import matcha.models.components.text_encoder as ref_text_encoder
    import matcha.models.style_encoder as ref_style_encoder
    import matcha.utils.model as ref_model_utils

    _loaded = {
        "matcha_tts": ref_matcha_tts,
        "decoder": ref_decoder,
        "flow_matching": ref_flow_matching,
        "text_encoder": ref_text_encoder,
        "style_encoder": ref_style_encoder,
        "model_utils": ref_model_utils,
    }
    return _loaded

"""AdaLayerNorm variants: imported by the reference transformer module but
never instantiated (the production BasicTransformerBlock config passes
num_embeds_ada_norm=None → plain nn.LayerNorm; transformer.py:163-179)."""

import torch.nn as nn


class AdaLayerNorm(nn.Module):
    def __init__(self, *args, **kwargs):
        super().__init__()
        raise NotImplementedError("AdaLayerNorm stub: not used by the reference config")


class AdaLayerNormZero(nn.Module):
    def __init__(self, *args, **kwargs):
        super().__init__()
        raise NotImplementedError("AdaLayerNormZero stub: not used by the reference config")

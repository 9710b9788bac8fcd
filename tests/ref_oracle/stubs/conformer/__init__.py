"""Placeholder for lucidrains' conformer: the reference only touches it when
decoder block_type="conformer", which the production config never uses.  The
class must exist because ConformerWrapper subclasses it at import time
(matcha/models/components/decoder.py:163)."""

import torch.nn as nn


class ConformerBlock(nn.Module):
    def __init__(self, **kwargs):
        super().__init__()

    def forward(self, *args, **kwargs):
        raise NotImplementedError("conformer stub: not exercised by parity tests")

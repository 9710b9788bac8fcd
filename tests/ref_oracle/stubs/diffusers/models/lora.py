"""LoRACompatibleLinear behaves exactly like nn.Linear when no LoRA layer is
attached — which is always the case in the reference (transformer.py:45,112)."""

import torch.nn as nn


class LoRACompatibleLinear(nn.Linear):
    pass

"""Minimal lightning stub: just enough for BaseLightningClass to run as a
plain nn.Module oracle (save_hyperparameters + no-op logging)."""

import inspect

import torch.nn as nn


class _HParams(dict):
    """Dict with attribute access, like Lightning's AttributeDict."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e


class LightningModule(nn.Module):
    def save_hyperparameters(self, *args, logger=True, ignore=None):
        # capture the calling __init__'s arguments, like Lightning does
        frame = inspect.currentframe().f_back
        arg_names, _, _, values = inspect.getargvalues(frame)
        self._hparams = _HParams(
            {k: values[k] for k in arg_names if k not in ("self", "__class__")}
        )

    @property
    def hparams(self):
        return getattr(self, "_hparams", _HParams())

    # no-op logging surface
    def log(self, *args, **kwargs):
        pass

    def log_dict(self, *args, **kwargs):
        pass

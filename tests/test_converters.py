"""Weight-layout parity: flax modules loaded with converted torch weights
must reproduce torch outputs exactly (the converter's core contract)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
from flax import linen as nn

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from convert_matcha_ckpt import conv1x1_to_dense, conv_k, convT_k, dense_k

RNG = np.random.default_rng(0)


def t(a):
    return torch.tensor(a)


class TestConvLayout:
    def test_conv1d_same_padding(self):
        x = RNG.standard_normal((2, 16, 6)).astype(np.float32)  # (B, T, C)
        w = RNG.standard_normal((8, 6, 5)).astype(np.float32)  # torch (out, in, k)
        b = RNG.standard_normal(8).astype(np.float32)
        ref = F.conv1d(t(x).transpose(1, 2), t(w), t(b), padding=2).transpose(1, 2)
        mod = nn.Conv(8, (5,), padding="SAME")
        out = mod.apply({"params": {"kernel": jnp.asarray(conv_k(w)), "bias": jnp.asarray(b)}}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)

    def test_conv1d_stride2(self):
        x = RNG.standard_normal((1, 16, 4)).astype(np.float32)
        w = RNG.standard_normal((4, 4, 3)).astype(np.float32)
        b = np.zeros(4, np.float32)
        ref = F.conv1d(t(x).transpose(1, 2), t(w), t(b), stride=2, padding=1).transpose(1, 2)
        mod = nn.Conv(4, (3,), strides=(2,), padding=((1, 1),))
        out = mod.apply({"params": {"kernel": jnp.asarray(conv_k(w)), "bias": jnp.asarray(b)}}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)

    def test_dense(self):
        x = RNG.standard_normal((3, 6)).astype(np.float32)
        w = RNG.standard_normal((8, 6)).astype(np.float32)
        b = RNG.standard_normal(8).astype(np.float32)
        ref = F.linear(t(x), t(w), t(b))
        mod = nn.Dense(8)
        out = mod.apply({"params": {"kernel": jnp.asarray(dense_k(w)), "bias": jnp.asarray(b)}}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)

    def test_conv1x1_as_dense(self):
        x = RNG.standard_normal((2, 10, 6)).astype(np.float32)
        w = RNG.standard_normal((8, 6, 1)).astype(np.float32)
        b = RNG.standard_normal(8).astype(np.float32)
        ref = F.conv1d(t(x).transpose(1, 2), t(w), t(b)).transpose(1, 2)
        mod = nn.Dense(8)
        out = mod.apply(
            {"params": {"kernel": jnp.asarray(conv1x1_to_dense(w)), "bias": jnp.asarray(b)}},
            jnp.asarray(x),
        )
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)

    def test_conv_transpose_k4_s2_p1(self):
        """Upsample1D parity: torch ConvTranspose1d(4,2,1) == flax 'SAME'."""
        x = RNG.standard_normal((1, 8, 3)).astype(np.float32)
        w = RNG.standard_normal((3, 5, 4)).astype(np.float32)  # torch (in, out, k)
        b = RNG.standard_normal(5).astype(np.float32)
        ref = F.conv_transpose1d(
            t(x).transpose(1, 2), t(w), t(b), stride=2, padding=1
        ).transpose(1, 2)
        mod = nn.ConvTranspose(5, (4,), strides=(2,), padding="SAME", transpose_kernel=True)
        out = mod.apply(
            {"params": {"kernel": jnp.asarray(convT_k(w)), "bias": jnp.asarray(b)}},
            jnp.asarray(x),
        )
        assert out.shape == tuple(ref.shape)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)

    def test_groupnorm(self):
        x = RNG.standard_normal((2, 12, 8)).astype(np.float32)
        w = RNG.standard_normal(8).astype(np.float32)
        b = RNG.standard_normal(8).astype(np.float32)
        ref = F.group_norm(t(x).transpose(1, 2), 4, t(w), t(b)).transpose(1, 2)
        mod = nn.GroupNorm(num_groups=4)
        out = mod.apply({"params": {"scale": jnp.asarray(w), "bias": jnp.asarray(b)}}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)

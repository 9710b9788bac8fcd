"""Parity tests for shape/alignment math vs torch-CPU oracles.

torch (CPU) is available in the image, so we verify our JAX implementations
against independent torch formulations of the same math (avg_pool1d, cumsum
path trick) without importing any reference code.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from matcha_tpu.utils.model_math import (
    denormalize,
    downsample_time,
    fix_len_compatibility,
    generate_path,
    normalize,
    sequence_mask,
)


class TestSequenceMask:
    def test_basic(self):
        m = sequence_mask(jnp.array([1, 3, 0]), 4)
        expected = np.array(
            [[1, 0, 0, 0], [1, 1, 1, 0], [0, 0, 0, 0]], dtype=bool
        )
        np.testing.assert_array_equal(np.asarray(m), expected)


class TestFixLenCompatibility:
    @pytest.mark.parametrize("n,expected", [(1, 2), (2, 2), (3, 4), (100, 100), (101, 102)])
    def test_round_up_pow2(self, n, expected):
        assert fix_len_compatibility(n) == expected

    def test_more_downsamples(self):
        assert fix_len_compatibility(5, num_downsamples=2) == 8


class TestGeneratePath:
    def _torch_path(self, duration, mask):
        b, t_x, t_y = mask.shape
        cum = torch.cumsum(duration.long(), 1).view(b * t_x)
        path = (torch.arange(t_y)[None, :] < cum[:, None]).to(mask.dtype)
        path = path.view(b, t_x, t_y)
        path = path - F.pad(path, [0, 0, 1, 0, 0, 0])[:, :-1]
        return path * mask

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_torch_cumsum_trick(self, seed):
        rng = np.random.default_rng(seed)
        b, t_x = 3, 7
        dur = rng.integers(0, 4, size=(b, t_x))
        t_y = int(dur.sum(axis=1).max()) + 2
        mask = np.ones((b, t_x, t_y), dtype=np.float32)
        ours = np.asarray(generate_path(jnp.array(dur), jnp.array(mask)))
        theirs = self._torch_path(torch.tensor(dur), torch.tensor(mask)).numpy()
        np.testing.assert_array_equal(ours, theirs)

    def test_rows_partition_frames(self):
        dur = jnp.array([[2, 1, 3]])
        mask = jnp.ones((1, 3, 6))
        path = np.asarray(generate_path(dur, mask))
        # each frame is owned by exactly one token
        np.testing.assert_array_equal(path.sum(axis=1), np.ones((1, 6)))
        np.testing.assert_array_equal(path.sum(axis=2), np.array([[2, 1, 3]]))


class TestDownsample:
    @pytest.mark.parametrize("t", [6, 7, 64, 129])
    def test_matches_torch_avg_pool(self, t):
        rng = np.random.default_rng(t)
        x = rng.standard_normal((2, t, 5)).astype(np.float32)
        ours = np.asarray(downsample_time(jnp.array(x)))
        # torch operates channel-major (B, C, T)
        theirs = F.avg_pool1d(
            torch.tensor(x).transpose(1, 2), kernel_size=3, stride=2, padding=1
        ).transpose(1, 2).numpy()
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


class TestNormalize:
    def test_roundtrip(self):
        x = jnp.linspace(-10, 5, 32).reshape(4, 8)
        y = normalize(x, -4.68, 6.51)
        np.testing.assert_allclose(
            np.asarray(denormalize(y, -4.68, 6.51)), np.asarray(x), rtol=1e-6
        )

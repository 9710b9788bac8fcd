"""Property tests for TPU-native Monotonic Alignment Search."""

import jax.numpy as jnp
import numpy as np
import pytest

from matcha_tpu.ops.mas import maximum_path, maximum_path_numpy


def random_case(rng, t_x, t_y):
    # log-priors are non-positive in practice (-0.5 * ||y - mu||^2 form)
    return -np.abs(rng.standard_normal((t_x, t_y))).astype(np.float32)


class TestOracle:
    def test_trivial_one_token(self):
        v = random_case(np.random.default_rng(0), 1, 4)
        path = maximum_path_numpy(v, 1, 4)
        np.testing.assert_array_equal(path, np.ones((1, 4), np.float32))

    def test_diagonal_when_square(self):
        v = np.full((3, 3), -1.0, np.float32)
        path = maximum_path_numpy(v, 3, 3)
        np.testing.assert_array_equal(path, np.eye(3, dtype=np.float32))

    def test_path_is_valid(self):
        rng = np.random.default_rng(1)
        v = random_case(rng, 5, 12)
        path = maximum_path_numpy(v, 5, 12)
        # every frame assigned to exactly one token
        np.testing.assert_array_equal(path.sum(axis=0), np.ones(12))
        # monotone non-decreasing token index
        idx = path.argmax(axis=0)
        assert (np.diff(idx) >= 0).all() and (np.diff(idx) <= 1).all()
        assert idx[0] == 0 and idx[-1] == 4


class TestJaxMatchesOracle:
    @pytest.mark.parametrize("seed", range(5))
    def test_unpadded_batch(self, seed):
        rng = np.random.default_rng(seed)
        b, t_x, t_y = 3, 6, 15
        v = np.stack([random_case(rng, t_x, t_y) for _ in range(b)])
        got = np.asarray(
            maximum_path(jnp.asarray(v), jnp.full(b, t_x), jnp.full(b, t_y))
        )
        for k in range(b):
            expected = maximum_path_numpy(v[k], t_x, t_y)
            np.testing.assert_array_equal(got[k], expected, err_msg=f"batch {k}")

    @pytest.mark.parametrize("seed", range(5))
    def test_ragged_lengths(self, seed):
        rng = np.random.default_rng(100 + seed)
        b, t_x, t_y = 4, 8, 20
        v = np.stack([random_case(rng, t_x, t_y) for _ in range(b)])
        x_len = rng.integers(1, t_x + 1, size=b)
        # need y_len >= x_len for a feasible path
        y_len = np.array([rng.integers(xl, t_y + 1) for xl in x_len])
        got = np.asarray(
            maximum_path(jnp.asarray(v), jnp.asarray(x_len), jnp.asarray(y_len))
        )
        for k in range(b):
            expected = maximum_path_numpy(v[k], int(x_len[k]), int(y_len[k]))
            np.testing.assert_array_equal(got[k], expected, err_msg=f"batch {k}")
            # nothing outside the valid region
            assert got[k][x_len[k]:, :].sum() == 0
            assert got[k][:, y_len[k]:].sum() == 0

    def test_score_optimality(self):
        """The JAX path must achieve the same total score as the oracle."""
        rng = np.random.default_rng(7)
        t_x, t_y = 7, 18
        v = random_case(rng, t_x, t_y)
        got = np.asarray(
            maximum_path(jnp.asarray(v[None]), jnp.array([t_x]), jnp.array([t_y]))
        )[0]
        expected = maximum_path_numpy(v, t_x, t_y)
        assert np.isclose((got * v).sum(), (expected * v).sum())


class TestSegmentDP:
    """maximum_path_durations (token-scan formulation) vs the frame DP."""

    @pytest.mark.parametrize("seed", range(5))
    def test_matches_frame_dp(self, seed):
        from matcha_tpu.ops.mas import (
            durations_from_indices,
            maximum_path_durations,
            maximum_path_indices,
        )

        rng = np.random.default_rng(200 + seed)
        b, t_x, t_y = 4, 7, 19
        v = jnp.asarray(
            -np.abs(rng.standard_normal((b, t_x, t_y))).astype(np.float32)
        )
        x_len = rng.integers(1, t_x + 1, size=b)
        y_len = np.array([rng.integers(xl, t_y + 1) for xl in x_len])
        idx = maximum_path_indices(v, jnp.asarray(x_len), jnp.asarray(y_len))
        ref = np.asarray(durations_from_indices(idx, t_x)).astype(int)
        got = np.asarray(
            maximum_path_durations(v, jnp.asarray(x_len), jnp.asarray(y_len))
        )
        np.testing.assert_array_equal(got, ref)

    def test_durations_partition_frames(self):
        from matcha_tpu.ops.mas import maximum_path_durations

        rng = np.random.default_rng(42)
        v = jnp.asarray(
            -np.abs(rng.standard_normal((2, 5, 14))).astype(np.float32)
        )
        d = np.asarray(
            maximum_path_durations(v, jnp.asarray([5, 3]), jnp.asarray([14, 9]))
        )
        assert d[0].sum() == 14 and d[1].sum() == 9
        assert (d[0] >= 1).all() and (d[1][:3] >= 1).all()
        assert (d[1][3:] == 0).all()

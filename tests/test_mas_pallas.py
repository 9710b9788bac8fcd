"""Pallas MAS kernel vs the scan implementation (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from matcha_tpu.ops.mas import maximum_path_indices, maximum_path_numpy
from matcha_tpu.ops.mas_pallas import maximum_path_indices_pallas


class TestPallasMatchesScan:
    @pytest.mark.parametrize("seed", range(3))
    def test_random_ragged(self, seed):
        rng = np.random.default_rng(seed)
        b, t_x, t_y = 4, 8, 24
        v = jnp.asarray(
            -np.abs(rng.standard_normal((b, t_x, t_y))).astype(np.float32)
        )
        x_len = rng.integers(1, t_x + 1, size=b)
        y_len = np.array([rng.integers(xl, t_y + 1) for xl in x_len])
        ref = np.asarray(
            maximum_path_indices(v, jnp.asarray(x_len), jnp.asarray(y_len))
        )
        got = np.asarray(
            maximum_path_indices_pallas(
                v, jnp.asarray(x_len), jnp.asarray(y_len), interpret=True
            )
        )
        np.testing.assert_array_equal(got, ref)

    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(7)
        t_x, t_y = 6, 15
        v = -np.abs(rng.standard_normal((t_x, t_y))).astype(np.float32)
        oracle = maximum_path_numpy(v, t_x, t_y)
        got = np.asarray(
            maximum_path_indices_pallas(
                jnp.asarray(v[None]),
                jnp.asarray([t_x]),
                jnp.asarray([t_y]),
                interpret=True,
            )
        )[0]
        oracle_idx = oracle.argmax(axis=0)
        np.testing.assert_array_equal(got, oracle_idx)

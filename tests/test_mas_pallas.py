"""Pallas MAS kernel vs the scan implementation (interpret mode on CPU)."""

import jax
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


class TestOnDevice:
    """Compiled (non-interpret) Mosaic runs — only on real TPU hardware.

    Skipped on the hermetic CPU mesh; exercised when the suite runs on a TPU
    host (the kernel is the production MAS path there via
    `maximum_path_indices_auto`).
    """

    @pytest.mark.skipif(
        jax.default_backend() != "tpu", reason="needs real TPU (Mosaic)"
    )
    @pytest.mark.parametrize("shape", [(4, 48, 96), (8, 100, 256), (3, 57, 301)])
    def test_compiled_matches_scan(self, shape):
        b, t_x, t_y = shape
        rng = np.random.default_rng(b)
        v = jnp.asarray(rng.standard_normal((b, t_x, t_y)).astype(np.float32))
        x_len = rng.integers(2, t_x + 1, size=b)
        y_len = np.array([rng.integers(xl, t_y + 1) for xl in x_len])
        ref = np.asarray(
            maximum_path_indices(v, jnp.asarray(x_len), jnp.asarray(y_len))
        )
        got = np.asarray(
            maximum_path_indices_pallas(v, jnp.asarray(x_len), jnp.asarray(y_len))
        )
        np.testing.assert_array_equal(got, ref)


class TestDispatcher:
    def test_auto_matches_scan_on_any_backend(self):
        from matcha_tpu.ops.mas import maximum_path_indices_auto

        rng = np.random.default_rng(11)
        v = jnp.asarray(rng.standard_normal((2, 12, 40)).astype(np.float32))
        xl = jnp.asarray([12, 7])
        yl = jnp.asarray([40, 25])
        ref = np.asarray(maximum_path_indices(v, xl, yl))
        got = np.asarray(maximum_path_indices_auto(v, xl, yl))
        np.testing.assert_array_equal(got, ref)


class TestShardMapPallas:
    def test_sharded_matches_scan_on_mesh(self):
        """shard_map-wrapped Pallas MAS (interpret on CPU) over the 8-device
        mesh == the unsharded scan on the global batch."""
        from matcha_tpu.ops.mas_pallas import maximum_path_indices_pallas_sharded
        from matcha_tpu.parallel.mesh import make_mesh, shard_batch

        mesh = make_mesh(jax.devices()[:8])
        rng = np.random.default_rng(2)
        b, t_x, t_y = 16, 10, 30  # 2 samples per device
        v = rng.standard_normal((b, t_x, t_y)).astype(np.float32)
        xl = rng.integers(2, t_x + 1, size=b).astype(np.int32)
        yl = np.array([rng.integers(x, t_y + 1) for x in xl], np.int32)
        ref = np.asarray(
            maximum_path_indices(
                jnp.asarray(v), jnp.asarray(xl), jnp.asarray(yl)
            )
        )
        v_s, xl_s, yl_s = shard_batch(mesh, (v, xl, yl))
        got = np.asarray(
            maximum_path_indices_pallas_sharded(
                v_s, xl_s, yl_s, mesh, interpret=True
            )
        )
        np.testing.assert_array_equal(got, ref)

    def test_sharded_matches_scan_on_2d_tp_mesh(self):
        """Same kernel under a 2-D (data, model) tensor-parallel mesh: the
        model axis is unmentioned in the specs (replicated), so every
        model-rank computes its data shard identically — this is the mesh
        the trainer registers when tensor_parallel>1."""
        from matcha_tpu.ops.mas_pallas import maximum_path_indices_pallas_sharded
        from matcha_tpu.parallel.mesh import shard_batch
        from matcha_tpu.parallel.sharding import make_mesh_2d

        if len(jax.devices()) < 8:
            # the on-TPU tier (MATCHA_TESTS_TPU=1) runs on ONE real chip and
            # cannot form a dp=4×tp=2 mesh; the hermetic 8-device CPU mesh
            # covers this case on every test run
            pytest.skip("needs 8 devices for the dp=4×tp=2 mesh")
        mesh = make_mesh_2d(jax.devices()[:8], dp=4, tp=2)
        rng = np.random.default_rng(3)
        b, t_x, t_y = 8, 9, 25  # 2 samples per data-axis rank
        v = rng.standard_normal((b, t_x, t_y)).astype(np.float32)
        xl = rng.integers(2, t_x + 1, size=b).astype(np.int32)
        yl = np.array([rng.integers(x, t_y + 1) for x in xl], np.int32)
        ref = np.asarray(
            maximum_path_indices(
                jnp.asarray(v), jnp.asarray(xl), jnp.asarray(yl)
            )
        )
        v_s, xl_s, yl_s = shard_batch(mesh, (v, xl, yl))
        got = np.asarray(
            maximum_path_indices_pallas_sharded(
                v_s, xl_s, yl_s, mesh, interpret=True
            )
        )
        np.testing.assert_array_equal(got, ref)

    @pytest.mark.skipif(
        jax.default_backend() != "tpu", reason="needs real TPU (Mosaic)"
    )
    def test_sharded_compiled_single_chip_mesh(self):
        """Compiled (non-interpret) Mosaic kernel under shard_map on a
        1-device mesh — the combination the trainer now defaults to on TPU
        meshes (mas_backend='auto' → 'pallas_shard_map')."""
        from matcha_tpu.ops.mas_pallas import maximum_path_indices_pallas_sharded
        from matcha_tpu.parallel.mesh import make_mesh, shard_batch

        mesh = make_mesh(jax.devices()[:1])
        rng = np.random.default_rng(5)
        b, t_x, t_y = 4, 24, 80
        v = rng.standard_normal((b, t_x, t_y)).astype(np.float32)
        xl = rng.integers(2, t_x + 1, size=b).astype(np.int32)
        yl = np.array([rng.integers(x, t_y + 1) for x in xl], np.int32)
        ref = np.asarray(
            maximum_path_indices(jnp.asarray(v), jnp.asarray(xl), jnp.asarray(yl))
        )
        got = np.asarray(
            maximum_path_indices_pallas_sharded(
                *shard_batch(mesh, (v, xl, yl)), mesh
            )
        )
        np.testing.assert_array_equal(got, ref)

    @pytest.mark.skipif(
        jax.default_backend() != "tpu" or jax.device_count() < 2,
        reason="needs multi-chip TPU",
    )
    def test_sharded_compiled_on_tpu(self):
        from matcha_tpu.ops.mas_pallas import maximum_path_indices_pallas_sharded
        from matcha_tpu.parallel.mesh import make_mesh, shard_batch

        mesh = make_mesh(jax.devices())
        n = jax.device_count()
        rng = np.random.default_rng(3)
        b, t_x, t_y = 2 * n, 12, 40
        v = rng.standard_normal((b, t_x, t_y)).astype(np.float32)
        xl = np.full((b,), t_x, np.int32)
        yl = np.full((b,), t_y, np.int32)
        ref = np.asarray(
            maximum_path_indices(jnp.asarray(v), jnp.asarray(xl), jnp.asarray(yl))
        )
        got = np.asarray(
            maximum_path_indices_pallas_sharded(
                *shard_batch(mesh, (v, xl, yl)), mesh
            )
        )
        np.testing.assert_array_equal(got, ref)

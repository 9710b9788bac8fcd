"""Mixed-precision (bf16 activations, fp32 params + islands) tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matcha_tpu.models.config import tiny_config
from matcha_tpu.models.matcha import MatchaTTS, init_params

CFG16 = dataclasses.replace(tiny_config(), compute_dtype="bfloat16")


class TestBf16Model:
    @pytest.mark.slow
    def test_params_stay_fp32(self):
        params = init_params(CFG16, jax.random.PRNGKey(0))
        dtypes = {
            np.dtype(np.asarray(leaf).dtype)
            for leaf in jax.tree_util.tree_leaves(params)
        }
        assert dtypes == {np.dtype(np.float32)}

    def test_losses_finite_fp32_outputs(self):
        model = MatchaTTS(CFG16)
        params = init_params(CFG16, jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        b, tx, ty = 2, 10, 12
        losses = model.apply(
            {"params": params},
            jnp.asarray(rng.integers(0, 600, (b, tx)), jnp.int32),
            jnp.full((b,), tx),
            jnp.asarray(rng.standard_normal((b, ty, CFG16.n_feats)), jnp.float32),
            jnp.full((b,), ty),
            jnp.asarray(rng.standard_normal((b, 2 * ty, CFG16.n_feats)), jnp.float32),
            jnp.full((b,), 2 * ty),
            jnp.zeros((b,), jnp.int32),
            jax.random.PRNGKey(1),
            method=MatchaTTS.compute_losses,
            deterministic=True,
        )
        for key in ("diff_loss", "dur_loss", "prior_loss"):
            val = np.asarray(losses[key])
            assert val.dtype == np.float32
            assert np.isfinite(val)

    def test_bf16_close_to_fp32(self):
        """Same params, both dtypes: losses agree to bf16 tolerance."""
        cfg32 = tiny_config()
        params = init_params(cfg32, jax.random.PRNGKey(0))
        rng = np.random.default_rng(1)
        b, tx, ty = 2, 8, 8
        args = (
            jnp.asarray(rng.integers(0, 600, (b, tx)), jnp.int32),
            jnp.full((b,), tx),
            jnp.asarray(rng.standard_normal((b, ty, cfg32.n_feats)), jnp.float32),
            jnp.full((b,), ty),
            jnp.asarray(rng.standard_normal((b, 2 * ty, cfg32.n_feats)), jnp.float32),
            jnp.full((b,), 2 * ty),
            jnp.zeros((b,), jnp.int32),
            jax.random.PRNGKey(1),
        )
        out32 = MatchaTTS(cfg32).apply(
            {"params": params}, *args, method=MatchaTTS.compute_losses,
            deterministic=True,
        )
        out16 = MatchaTTS(CFG16).apply(
            {"params": params}, *args, method=MatchaTTS.compute_losses,
            deterministic=True,
        )
        np.testing.assert_allclose(
            float(out16["loss"]), float(out32["loss"]), rtol=0.05
        )

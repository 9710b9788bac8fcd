"""Model-core tests: shapes, loss finiteness, detach semantics, ODE solvers.

These are the tests the reference lacks entirely (SURVEY.md §4) — forward
shape contracts, gradient-flow (stop-gradient) semantics, and solver
equivalences, all on a tiny config so they run on the CPU test mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matcha_tpu.models.config import tiny_config
from matcha_tpu.models.flow_matching import odeint_fixed
from matcha_tpu.models.matcha import MatchaTTS, init_params

CFG = tiny_config()
B, TX, TY = 2, 12, 16


@pytest.fixture(scope="module")
def model_and_params():
    model = MatchaTTS(CFG)
    params = init_params(CFG, jax.random.PRNGKey(0))
    return model, params


def _batch(rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    x = rng.integers(0, 600, size=(B, TX)).astype(np.int32)
    x_lengths = np.array([TX, TX - 4], np.int32)
    y = rng.standard_normal((B, TY, CFG.n_feats)).astype(np.float32)
    y_lengths = np.array([TY, TY - 6], np.int32)
    y_fine = rng.standard_normal((B, 2 * TY, CFG.n_feats)).astype(np.float32)
    y_fine_lengths = 2 * y_lengths
    spks = np.array([0, 1], np.int32)
    return tuple(
        jnp.asarray(a) for a in (x, x_lengths, y, y_lengths, y_fine, y_fine_lengths, spks)
    )


class TestTrainingLosses:
    def test_losses_finite_and_scalar(self, model_and_params):
        model, params = model_and_params
        losses = model.apply(
            {"params": params},
            *_batch(),
            jax.random.PRNGKey(1),
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        for key in ("diff_loss", "dur_loss", "prior_loss", "loss"):
            val = np.asarray(losses[key])
            assert val.shape == (), key
            assert np.isfinite(val), key
        assert losses["loss"] > 0

    def test_decoder_gradients_do_not_reach_encoder(self, model_and_params):
        """The CFM prior is detached: diff_loss must not train the encoder."""
        model, params = model_and_params
        batch = _batch()

        def diff_only(p):
            out = model.apply(
                {"params": p},
                *batch,
                jax.random.PRNGKey(1),
                method=MatchaTTS.compute_losses,
                deterministic=True,
            )
            return out["diff_loss"]

        grads = jax.grad(diff_only)(params)
        enc_grad_norm = jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b)), grads["encoder"], 0.0
        )
        dec_grad_norm = jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b)), grads["decoder"], 0.0
        )
        assert float(enc_grad_norm) == 0.0
        assert float(dec_grad_norm) > 0.0

    def test_duration_branch_detached_from_acoustics(self, model_and_params):
        """dur_loss must only train the duration predictor + its spk table."""
        model, params = model_and_params
        batch = _batch()

        def dur_only(p):
            out = model.apply(
                {"params": p},
                *batch,
                jax.random.PRNGKey(1),
                method=MatchaTTS.compute_losses,
                deterministic=True,
            )
            return out["dur_loss"]

        grads = jax.grad(dur_only)(params)
        # transformer encoder body gets nothing through the stop_gradient
        body_norm = jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b)),
            grads["encoder"]["encoder"],
            0.0,
        )
        dp_norm = jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b)), grads["encoder"]["proj_w"], 0.0
        )
        assert float(body_norm) == 0.0
        assert float(dp_norm) > 0.0


class TestInference:
    def test_encode_shapes(self, model_and_params):
        model, params = model_and_params
        x, x_lengths, *_ = _batch()
        x_mask = (jnp.arange(TX)[None, :] < x_lengths[:, None]).astype(jnp.float32)
        spk = jnp.zeros((B, CFG.spk_emb_dim))
        mu_x, durations = model.apply(
            {"params": params}, x, x_mask, spk, spk, method=MatchaTTS.encode
        )
        assert mu_x.shape == (B, TX, CFG.n_feats)
        assert durations.shape == (B, TX)
        # padding rows produce zero duration
        assert float(jnp.abs(durations[1, TX - 4:]).max()) == 0.0

    def test_decode_deterministic(self, model_and_params):
        model, params = model_and_params
        mu_y = jnp.asarray(
            np.random.default_rng(3).standard_normal((1, TY, CFG.n_feats)),
            jnp.float32,
        )
        y_mask = jnp.ones((1, TY))
        out1 = model.apply(
            {"params": params}, mu_y, y_mask, 2, method=MatchaTTS.decode
        )
        out2 = model.apply(
            {"params": params}, mu_y, y_mask, 2, method=MatchaTTS.decode
        )
        assert out1.shape == (1, TY, CFG.n_feats)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


class TestOdeSolvers:
    """Fixed-grid solvers vs closed-form dx/dt = -x  (x(1) = x0·e^-1)."""

    X0 = jnp.ones((3,)) * 2.0

    def solve(self, solver, steps):
        t_span = jnp.linspace(0.0, 1.0, steps + 1)
        return odeint_fixed(lambda x, t: -x, self.X0, t_span, solver=solver)

    @pytest.mark.parametrize(
        "solver,steps,tol",
        [
            ("euler", 100, 5e-3),
            ("midpoint", 20, 5e-4),
            ("heun3", 10, 5e-4),
            ("rk4", 5, 5e-5),
        ],
    )
    def test_convergence(self, solver, steps, tol):
        got = np.asarray(self.solve(solver, steps))
        expected = 2.0 * np.exp(-1.0)
        np.testing.assert_allclose(got, expected, atol=tol)

    def test_order_ranking(self):
        """Higher-order solvers beat lower-order at equal step count."""
        errs = {
            s: abs(float(self.solve(s, 8)[0]) - 2.0 * np.exp(-1.0))
            for s in ("euler", "midpoint", "rk4")
        }
        assert errs["rk4"] < errs["midpoint"] < errs["euler"]

    def test_unknown_solver_raises(self):
        with pytest.raises(ValueError):
            self.solve("dopri5", 4)

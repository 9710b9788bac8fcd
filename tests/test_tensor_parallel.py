"""Tensor-parallel (2-D data x model mesh) training-step tests.

Runs on the hermetic 8-device virtual CPU mesh (tests/conftest.py).  The
TP step must produce the same losses/updates as the replicated DP step —
GSPMD only changes WHERE the matmuls run and inserts the collectives, not
what is computed (reference has no model parallelism at all: single-GPU
torch, SURVEY.md §2.8 — TP is a beyond-parity scaling lever).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from matcha_tpu.models.config import tiny_config
from matcha_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from matcha_tpu.parallel.sharding import (
    MODEL_AXIS,
    make_mesh_2d,
    shard_pytree,
    state_shardings,
    tp_param_specs,
)
from matcha_tpu.train.optim import OptimizerConfig, build_optimizer
from matcha_tpu.train.step import Batch, init_train_state, make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)


def _tiny_batch(cfg, b=8, tx=8, ty=8):
    rng = np.random.default_rng(0)
    return Batch(
        x=jnp.asarray(rng.integers(0, 600, (b, tx)), jnp.int32),
        x_lengths=jnp.full((b,), tx, jnp.int32),
        y=jnp.asarray(rng.standard_normal((b, ty, cfg.n_feats)), jnp.float32),
        y_lengths=jnp.full((b,), ty, jnp.int32),
        y_fine=jnp.asarray(
            rng.standard_normal((b, 2 * ty, cfg.n_feats)), jnp.float32
        ),
        y_fine_lengths=jnp.full((b,), 2 * ty, jnp.int32),
        spks=jnp.asarray(rng.integers(0, cfg.n_spks, (b,)), jnp.int32),
    )


class TestSpecs:
    def test_ffn_pair_column_then_row(self):
        cfg = tiny_config()
        tx_opt = build_optimizer(OptimizerConfig(lr=1e-4))
        state = jax.eval_shape(
            lambda: init_train_state(cfg, tx_opt, jax.random.PRNGKey(0))
        )
        specs = tp_param_specs(state.params, tp=2)
        tb = specs["decoder"]["mid0_tblock0"]
        assert tb["ff"]["proj_in"]["kernel"] == P(None, MODEL_AXIS)
        assert tb["ff"]["proj_in"]["bias"] == P(MODEL_AXIS)
        assert tb["ff"]["alpha"] == P(MODEL_AXIS)
        assert tb["ff"]["proj_out"]["kernel"] == P(MODEL_AXIS, None)
        assert tb["ff"]["proj_out"]["bias"] == P()
        assert tb["to_q"]["kernel"] == P(None, MODEL_AXIS)
        assert tb["to_out"]["kernel"] == P(MODEL_AXIS, None)
        # conv kernels are (k, in, out): column shards dim 2, row dim 1
        enc = specs["encoder"]["encoder"]
        assert enc["ConvFFN_0"]["Conv_0"]["kernel"] == P(
            None, None, MODEL_AXIS
        )
        assert enc["ConvFFN_0"]["Conv_1"]["kernel"] == P(
            None, MODEL_AXIS, None
        )
        # non-matmul leaves replicated
        assert specs["encoder"]["emb"]["embedding"] == P()
        assert specs["decoder"]["mid0_resnet"]["block1"]["Conv_0"][
            "kernel"
        ] == P()

    def test_indivisible_dims_stay_replicated(self):
        cfg = tiny_config()  # encoder attention q kernel is (24, 24)
        tx_opt = build_optimizer(OptimizerConfig(lr=1e-4))
        state = jax.eval_shape(
            lambda: init_train_state(cfg, tx_opt, jax.random.PRNGKey(0))
        )
        specs = tp_param_specs(state.params, tp=16)
        enc = specs["encoder"]["encoder"]
        assert enc["RopeSelfAttention_0"]["q"]["kernel"] == P()  # 24 % 16
        # decoder ff hidden is 128 -> still sharded at tp=16
        assert specs["decoder"]["mid0_tblock0"]["ff"]["proj_in"][
            "kernel"
        ] == P(None, MODEL_AXIS)

    def test_state_shardings_cover_adam_moments(self):
        cfg = tiny_config()
        tx_opt = build_optimizer(OptimizerConfig(lr=1e-4))
        state = jax.eval_shape(
            lambda: init_train_state(cfg, tx_opt, jax.random.PRNGKey(0))
        )
        mesh = make_mesh_2d(tp=2)
        specs = tp_param_specs(state.params, tp=2)
        sh = state_shardings(mesh, specs, state)
        flat_params = {
            tuple(str(getattr(e, "key", e)) for e in p): s
            for p, s in jax.tree_util.tree_flatten_with_path(sh.params)[0]
        }
        # every sharded param leaf has a matching sharded moment somewhere
        # in the optimizer state with the SAME spec
        n_sharded_params = sum(
            1 for s in flat_params.values() if MODEL_AXIS in str(s.spec)
        )
        assert n_sharded_params > 0
        opt_leaves = jax.tree_util.tree_flatten(sh.opt_state)[0]
        n_sharded_opt = sum(
            1 for s in opt_leaves if MODEL_AXIS in str(s.spec)
        )
        # Adam carries mu and nu -> at least 2 sharded copies per param
        assert n_sharded_opt >= 2 * n_sharded_params
        assert str(sh.step.spec) == str(P())


class TestTPStep:
    def _run(self, mesh, tp):
        cfg = tiny_config()
        tx_opt = build_optimizer(OptimizerConfig(lr=1e-4))
        state = init_train_state(cfg, tx_opt, jax.random.PRNGKey(0))
        batch = _tiny_batch(cfg)
        if tp == 0:  # single-device baseline
            step, _ = make_train_step(cfg, tx_opt)
            state, metrics = step(state, batch, jax.random.PRNGKey(1))
            return state, metrics
        if tp == 1:
            with mesh:
                state = replicate(mesh, state)
                step, _ = make_train_step(cfg, tx_opt, mesh=mesh)
                state, metrics = step(
                    state, shard_batch(mesh, batch), jax.random.PRNGKey(1)
                )
            return state, metrics
        specs = tp_param_specs(state.params, tp=tp)
        sh = state_shardings(mesh, specs, state)
        with mesh:
            state = shard_pytree(mesh, specs, state)
            step, _ = make_train_step(
                cfg, tx_opt, mesh=mesh, state_sharding=sh
            )
            state, metrics = step(
                state, shard_batch(mesh, batch), jax.random.PRNGKey(1)
            )
        return state, metrics

    def test_tp_matches_dp_and_single_device(self):
        _, m_single = self._run(None, 0)
        mesh_dp = make_mesh(jax.devices()[:8])
        _, m_dp = self._run(mesh_dp, 1)
        mesh_tp = make_mesh_2d(jax.devices()[:8], dp=4, tp=2)
        state_tp, m_tp = self._run(mesh_tp, 2)

        loss0 = float(np.asarray(m_single["loss"]))
        assert abs(float(np.asarray(m_dp["loss"])) - loss0) < 1e-4
        assert abs(float(np.asarray(m_tp["loss"])) - loss0) < 1e-3
        for k in ("sub_loss/diff", "sub_loss/dur", "sub_loss/prior"):
            assert abs(
                float(np.asarray(m_tp[k])) - float(np.asarray(m_single[k]))
            ) < 1e-3, k

        # parameters are REALLY distributed: a column-parallel kernel's
        # per-device shard is 1/tp of the full hidden dim
        kern = state_tp.params["decoder"]["mid0_tblock0"]["ff"]["proj_in"][
            "kernel"
        ]
        assert MODEL_AXIS in str(kern.sharding.spec)
        local = kern.addressable_shards[0].data.shape
        assert local[-1] * 2 == kern.shape[-1]

    def test_tp_updated_params_match_single_device(self):
        state_s, _ = self._run(None, 0)
        mesh_tp = make_mesh_2d(jax.devices()[:8], dp=4, tp=2)
        state_tp, _ = self._run(mesh_tp, 2)
        for path in (
            ("decoder", "mid0_tblock0", "ff", "proj_in", "kernel"),
            ("encoder", "emb", "embedding"),
        ):
            a = state_s.params
            b = state_tp.params
            for k in path:
                a, b = a[k], b[k]
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(jax.device_get(b)), atol=2e-5
            ), path

    def test_tp_step_with_shard_map_mas(self):
        """TP (2-D mesh) train step with mas_backend='pallas_shard_map' —
        the backend a real TPU mesh trainer selects by default — matches
        the single-device scan-MAS loss.  The kernel runs per data-axis
        shard inside shard_map (interpret on CPU); the model axis is
        replicated for MAS."""
        from matcha_tpu.ops import mas as mas_mod
        from matcha_tpu.ops.mas import set_mas_shard_mesh

        cfg = dataclasses.replace(
            tiny_config(), mas_backend="pallas_shard_map"
        )
        tx_opt = build_optimizer(OptimizerConfig(lr=1e-4))
        mesh_tp = make_mesh_2d(jax.devices()[:8], dp=4, tp=2)
        prev = mas_mod._SHARD_MESH, mas_mod._SHARD_AXIS
        set_mas_shard_mesh(mesh_tp)  # before init: init traces the losses
        try:
            state = init_train_state(cfg, tx_opt, jax.random.PRNGKey(0))
            batch = _tiny_batch(cfg)
            specs = tp_param_specs(state.params, tp=2)
            sh = state_shardings(mesh_tp, specs, state)
            with mesh_tp:
                state = shard_pytree(mesh_tp, specs, state)
                step, _ = make_train_step(
                    cfg, tx_opt, mesh=mesh_tp, state_sharding=sh
                )
                _, m_tp = step(
                    state, shard_batch(mesh_tp, batch), jax.random.PRNGKey(1)
                )
        finally:
            set_mas_shard_mesh(prev[0], prev[1])
        _, m_single = self._run(None, 0)
        assert abs(
            float(np.asarray(m_tp["loss"]))
            - float(np.asarray(m_single["loss"]))
        ) < 1e-3

    def test_trainer_wires_tensor_parallel(self, tmp_path):
        """Trainer(tensor_parallel=2) builds the 2-D mesh, shards the
        state, and completes a real epoch end-to-end."""
        from matcha_tpu.data.dataset import TextMelDataset
        from matcha_tpu.train.trainer import Trainer, TrainerConfig

        cfg = tiny_config()
        mel_dir = tmp_path / "mels"
        rng = np.random.default_rng(0)
        rows = []
        for i in range(8):
            rel = f"s/u{i}"
            frames = 16
            (mel_dir / "s").mkdir(parents=True, exist_ok=True)
            np.save(
                mel_dir / f"{rel}.npy",
                rng.standard_normal((cfg.n_feats, frames)).astype(np.float32),
            )
            np.save(
                mel_dir / f"{rel}.fine.npy",
                rng.standard_normal((cfg.n_feats, 2 * frames)).astype(
                    np.float32
                ),
            )
            ids = " ".join(str(v) for v in rng.integers(0, 600, 8))
            rows.append(f"{rel}|{i % cfg.n_spks}|en-us|text {i}|{ids}")
        (mel_dir / "metadata.json").write_text(
            '{"n_mels": %d}' % cfg.n_feats
        )
        filelist = tmp_path / "train.csv"
        filelist.write_text("\n".join(rows))
        ds = TextMelDataset(filelist, mel_dir)

        tr = Trainer(
            model_cfg=cfg,
            opt_cfg=OptimizerConfig(lr=1e-4),
            trainer_cfg=TrainerConfig(
                output_dir=str(tmp_path / "out"),
                max_epochs=1,
                check_val_every_n_epoch=10,
                log_every_n_steps=1,
                use_mesh=True,
                tensor_parallel=2,
            ),
            train_dataset=ds,
            max_frames_per_batch=256,
            len_bucket=16,
            text_bucket=16,
        )
        assert dict(tr.mesh.shape) == {"data": 4, "model": 2}
        state = tr.fit()
        assert int(state.step) > 0
        kern = state.params["decoder"]["mid0_tblock0"]["ff"]["proj_in"][
            "kernel"
        ]
        assert MODEL_AXIS in str(kern.sharding.spec)

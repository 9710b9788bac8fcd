"""Training-step tests: single-device + 8-device data-parallel mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matcha_tpu.models.config import tiny_config
from matcha_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from matcha_tpu.train.optim import OptimizerConfig, build_optimizer, decay_mask
from matcha_tpu.train.step import Batch, init_train_state, make_train_step

CFG = tiny_config()
B, TX, TY = 8, 10, 12


def make_batch(seed=0) -> Batch:
    rng = np.random.default_rng(seed)
    return Batch(
        x=jnp.asarray(rng.integers(0, 600, (B, TX)), jnp.int32),
        x_lengths=jnp.asarray(rng.integers(4, TX + 1, (B,)), jnp.int32),
        y=jnp.asarray(rng.standard_normal((B, TY, CFG.n_feats)), jnp.float32),
        y_lengths=jnp.asarray(rng.integers(8, TY + 1, (B,)), jnp.int32),
        y_fine=jnp.asarray(
            rng.standard_normal((B, 2 * TY, CFG.n_feats)), jnp.float32
        ),
        y_fine_lengths=jnp.asarray(rng.integers(16, 2 * TY + 1, (B,)), jnp.int32),
        spks=jnp.asarray(rng.integers(0, CFG.n_spks, (B,)), jnp.int32),
    )


class TestDecayMask:
    def test_kernels_decay_embeddings_do_not(self):
        from matcha_tpu.models.matcha import init_params

        params = init_params(CFG, jax.random.PRNGKey(0))
        mask = decay_mask(params)
        assert mask["speaker_embeddings_enc"]["embedding"] is False
        enc = mask["encoder"]["emb"]["embedding"]
        assert enc is False
        flat = jax.tree_util.tree_flatten_with_path(mask)[0]
        kernels = [v for k, v in flat if k[-1].key == "kernel"]
        non_kernels = [v for k, v in flat if k[-1].key != "kernel"]
        assert all(kernels) and len(kernels) > 10
        assert not any(non_kernels)


class TestTrainStepSingleDevice:
    @pytest.mark.slow
    def test_loss_decreases_params_change(self):
        tx = build_optimizer(OptimizerConfig(lr=1e-3))
        state = init_train_state(CFG, tx, jax.random.PRNGKey(0))
        train_step, eval_step = make_train_step(CFG, tx)
        batch = make_batch()
        rng = jax.random.PRNGKey(42)

        p0 = jax.tree.map(np.asarray, state.params)
        metrics = None
        for _ in range(3):
            state, metrics = train_step(state, batch, rng)
        assert np.isfinite(np.asarray(metrics["loss"]))
        assert int(state.step) == 3
        changed = jax.tree_util.tree_reduce(
            lambda acc, pair: acc or pair,
            jax.tree.map(
                lambda a, b: bool(np.any(np.asarray(a) != b)), state.params, p0
            ),
            False,
        )
        assert changed

        ev = eval_step(state.params, batch, rng)
        assert np.isfinite(np.asarray(ev["loss"]))


class TestRematDecoder:
    def test_remat_grads_match_exactly(self):
        """decoder.remat=True (jax.checkpoint per U-Net block) must be a pure
        memory/FLOPs trade: identical param tree, identical loss, identical
        gradients — including through dropout (rngs replay on recompute) and
        the MAS stop-gradient islands."""
        import dataclasses

        from matcha_tpu.models.matcha import MatchaTTS, init_params

        cfg_r = dataclasses.replace(
            CFG, decoder=dataclasses.replace(CFG.decoder, remat=True)
        )
        params = init_params(CFG, jax.random.PRNGKey(0))
        params_r = init_params(cfg_r, jax.random.PRNGKey(0))
        assert jax.tree_util.tree_structure(params) == (
            jax.tree_util.tree_structure(params_r)
        )

        batch = make_batch(3)
        rng = jax.random.PRNGKey(7)

        def loss_of(cfg):
            model = MatchaTTS(cfg)

            def f(p):
                out = model.apply(
                    {"params": p},
                    batch.x, batch.x_lengths, batch.y, batch.y_lengths,
                    batch.y_fine, batch.y_fine_lengths, batch.spks, rng,
                    method=MatchaTTS.compute_losses,
                    deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(11)},
                )
                return out["loss"]

            return f

        l0, g0 = jax.value_and_grad(loss_of(CFG))(params)
        l1, g1 = jax.value_and_grad(loss_of(cfg_r))(params)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5
            )


class TestTrainStepMesh:
    @pytest.mark.slow
    def test_eight_device_dp(self):
        assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
        mesh = make_mesh(jax.devices()[:8])
        tx = build_optimizer(OptimizerConfig(lr=1e-3))
        state = init_train_state(CFG, tx, jax.random.PRNGKey(0))
        state = jax.device_put(state, None) if False else state
        with mesh:
            state = replicate(mesh, state)
            train_step, _ = make_train_step(CFG, tx, mesh=mesh)
            batch = shard_batch(mesh, make_batch())
            state2, metrics = train_step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(metrics["loss"]))
        assert int(state2.step) == 1

    @pytest.mark.slow
    def test_dp_matches_single_device(self):
        """Same batch, same seed → DP-8 loss == single-device loss."""
        mesh = make_mesh(jax.devices()[:8])
        tx = build_optimizer(OptimizerConfig(lr=1e-3))
        state_s = init_train_state(CFG, tx, jax.random.PRNGKey(0))
        batch = make_batch(3)
        rng = jax.random.PRNGKey(9)

        step_s, _ = make_train_step(CFG, tx)
        _, m_single = step_s(state_s, batch, rng)

        state_m = init_train_state(CFG, tx, jax.random.PRNGKey(0))
        with mesh:
            state_m = replicate(mesh, state_m)
            step_m, _ = make_train_step(CFG, tx, mesh=mesh)
            _, m_mesh = step_m(state_m, shard_batch(mesh, batch), rng)

        np.testing.assert_allclose(
            np.asarray(m_single["loss"]), np.asarray(m_mesh["loss"]), rtol=2e-5
        )


class TestCheckpointSurgery:
    def test_expand_speaker_tables(self):
        from matcha_tpu.train.checkpoint import expand_speaker_tables

        tx = build_optimizer(OptimizerConfig())
        state = init_train_state(CFG, tx, jax.random.PRNGKey(0))
        tree = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": 0,
        }
        tree2, cfg2 = expand_speaker_tables(tree, CFG, CFG.n_spks + 3)
        assert cfg2.n_spks == CFG.n_spks + 3
        emb = tree2["params"]["speaker_embeddings_enc"]["embedding"]
        assert emb.shape[0] == CFG.n_spks + 3
        np.testing.assert_array_equal(emb[CFG.n_spks:], 0.0)
        # old rows preserved
        np.testing.assert_array_equal(
            emb[: CFG.n_spks],
            np.asarray(state.params["speaker_embeddings_enc"]["embedding"]),
        )

    def test_average_checkpoints(self):
        from matcha_tpu.train.checkpoint import average_checkpoints

        t1 = {"params": {"w": np.ones((2, 2), np.float32)}}
        t2 = {"params": {"w": np.full((2, 2), 3.0, np.float32)}}
        avg = average_checkpoints([t1, t2])
        np.testing.assert_array_equal(avg["params"]["w"], np.full((2, 2), 2.0))

    def test_transplant_speaker(self):
        from matcha_tpu.train.checkpoint import transplant_speaker

        rng = np.random.default_rng(0)
        mk = lambda: {
            "params": {
                "speaker_embeddings_enc": {"embedding": rng.standard_normal((4, 8))},
                "speaker_embeddings_dur": {"embedding": rng.standard_normal((4, 8))},
            }
        }
        dst, src = mk(), mk()
        src_row = np.asarray(src["params"]["speaker_embeddings_enc"]["embedding"][2])
        out = transplant_speaker(dst, src, dst_id=1, src_id=2)
        np.testing.assert_array_equal(
            out["params"]["speaker_embeddings_enc"]["embedding"][1], src_row
        )


class TestOptimizerFeatures:
    @pytest.mark.slow
    def test_grad_accumulation(self):
        import optax

        from matcha_tpu.models.matcha import init_params

        cfg = OptimizerConfig(lr=1e-3, accumulate_grad_batches=2)
        tx = build_optimizer(cfg)
        params = init_params(CFG, jax.random.PRNGKey(0))
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        # first micro-step: accumulation only, no update applied
        updates, state = tx.update(grads, state, params)
        assert float(optax.global_norm(updates)) == 0.0
        # second micro-step: the averaged update lands
        updates, state = tx.update(grads, state, params)
        assert float(optax.global_norm(updates)) > 0.0

    def test_nonfinite_grads_are_skipped(self):
        import optax

        from matcha_tpu.models.matcha import init_params

        tx = build_optimizer(OptimizerConfig(lr=1e-3))
        params = init_params(CFG, jax.random.PRNGKey(0))
        state = tx.init(params)
        bad = jax.tree.map(lambda p: jnp.full_like(p, jnp.nan), params)
        updates, state = tx.update(bad, state, params)
        assert float(optax.global_norm(updates)) == 0.0  # no-op step
        good = jax.tree.map(jnp.ones_like, params)
        updates, state = tx.update(good, state, params)
        assert float(optax.global_norm(updates)) > 0.0
        assert np.isfinite(
            np.asarray(jax.tree_util.tree_leaves(updates)[0])
        ).all()


class TestMasBackendGating:
    def test_mesh_trainer_resolves_auto_backend(self, tmp_path):
        """A mesh trainer must not leave MAS on the bare Pallas kernel: a
        pallas_call inside the GSPMD-sharded step has no batch partitioning
        rule.  'auto' resolves to the shard_map kernel on TPU and to the
        portable scan on this CPU test backend (MatchaConfig.mas_backend)."""
        import numpy as np

        from matcha_tpu.data.dataset import TextMelDataset
        from matcha_tpu.models.config import tiny_config
        from matcha_tpu.train.optim import OptimizerConfig
        from matcha_tpu.train.trainer import Trainer, TrainerConfig

        cfg = tiny_config()
        mel_dir = tmp_path / "mels"
        (mel_dir / "s").mkdir(parents=True)
        rng = np.random.default_rng(0)
        rows = []
        for i in range(4):
            rel = f"s/u{i}"
            np.save(mel_dir / f"{rel}.npy",
                    rng.standard_normal((cfg.n_feats, 16)).astype(np.float32))
            np.save(mel_dir / f"{rel}.fine.npy",
                    rng.standard_normal((cfg.n_feats, 32)).astype(np.float32))
            ids = " ".join(str(v) for v in rng.integers(0, 600, 8))
            rows.append(f"{rel}|{i % cfg.n_spks}|en-us|t{i}|{ids}")
        (mel_dir / "metadata.json").write_text('{"n_mels": %d}' % cfg.n_feats)
        fl = tmp_path / "t.csv"
        fl.write_text("\n".join(rows))
        ds = TextMelDataset(fl, mel_dir)

        for use_mesh, expect in [(True, "scan"), (False, "auto")]:
            tr = Trainer(
                model_cfg=cfg,
                opt_cfg=OptimizerConfig(),
                trainer_cfg=TrainerConfig(
                    output_dir=str(tmp_path / f"o{use_mesh}"), use_mesh=use_mesh
                ),
                train_dataset=ds,
                max_frames_per_batch=256, len_bucket=16, text_bucket=16,
            )
            assert tr.model_cfg.mas_backend == expect


class TestShardMapMasTraining:
    def test_mesh_step_with_pallas_shard_map_matches_scan(self):
        """A full mesh train step with mas_backend='pallas_shard_map'
        (interpret kernel per shard) produces the same loss/grads as the
        scan backend — the opt-in path for Pallas MAS on real pods."""
        import dataclasses

        from matcha_tpu.models.config import tiny_config
        from matcha_tpu.ops.mas import set_mas_shard_mesh
        from matcha_tpu.parallel.mesh import make_mesh, shard_batch
        from matcha_tpu.train.optim import OptimizerConfig, build_optimizer
        from matcha_tpu.train.step import Batch, init_train_state, make_train_step

        mesh = make_mesh(jax.devices()[:8])
        set_mas_shard_mesh(mesh)
        rng = np.random.default_rng(0)
        b, tx, yf = 8, 12, 32
        batch_np = Batch(
            x=rng.integers(0, 600, (b, tx)).astype(np.int32),
            x_lengths=np.full((b,), tx, np.int32),
            y=rng.standard_normal((b, yf // 2, 8)).astype(np.float32),
            y_lengths=np.full((b,), yf // 2, np.int32),
            y_fine=rng.standard_normal((b, yf, 8)).astype(np.float32),
            y_fine_lengths=np.full((b,), yf, np.int32),
            spks=rng.integers(0, 4, (b,)).astype(np.int32),
        )
        key = jax.random.PRNGKey(1)
        losses = {}
        for backend in ("scan", "pallas_shard_map"):
            cfg = dataclasses.replace(tiny_config(), mas_backend=backend)
            tx_opt = build_optimizer(OptimizerConfig(), cfg)
            state = init_train_state(cfg, tx_opt, jax.random.PRNGKey(0))
            step, _ = make_train_step(cfg, tx_opt, mesh=mesh)
            batch = Batch(*shard_batch(mesh, tuple(batch_np)))
            _, m = step(state, batch, key)
            losses[backend] = float(np.asarray(m["loss"]))
        assert abs(losses["scan"] - losses["pallas_shard_map"]) < 1e-5, losses


class TestRepeatFillNeutrality:
    """Repeat-filled rows (sampler under-full buckets) carry loss weight 0:
    the filled batch must produce EXACTLY the losses and parameter gradients
    of the unfilled batch — the reference never duplicates samples
    (text_mel_datamodule.py:111-133), so neither may our gradients."""

    def _losses_and_grads(self, params, batch, t_noise, weights):
        from matcha_tpu.models.matcha import MatchaTTS

        model = MatchaTTS(CFG)

        def loss_fn(p):
            losses = model.apply(
                {"params": p},
                batch.x,
                batch.x_lengths,
                batch.y,
                batch.y_lengths,
                batch.y_fine,
                batch.y_fine_lengths,
                batch.spks,
                jax.random.PRNGKey(0),
                deterministic=True,
                cfm_t_noise=t_noise,
                row_weights=weights,
                method=MatchaTTS.compute_losses,
            )
            return losses["loss"], losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return losses, grads

    def test_filled_batch_matches_unfilled(self):
        from matcha_tpu.models.matcha import init_params

        params = init_params(CFG, jax.random.PRNGKey(0))
        rng = np.random.default_rng(3)
        b_real, b_full, tx, ty = 2, 4, 10, 12
        x = rng.integers(0, 600, (b_real, tx)).astype(np.int32)
        x_lengths = rng.integers(4, tx + 1, (b_real,)).astype(np.int32)
        y = rng.standard_normal((b_real, ty, CFG.n_feats)).astype(np.float32)
        y_lengths = rng.integers(8, ty + 1, (b_real,)).astype(np.int32)
        y_fine = rng.standard_normal((b_real, 2 * ty, CFG.n_feats)).astype(
            np.float32
        )
        y_fine_lengths = (2 * y_lengths).astype(np.int32)
        spks = rng.integers(0, CFG.n_spks, (b_real,)).astype(np.int32)
        t = rng.uniform(0.1, 0.9, (b_real, 1, 1)).astype(np.float32)
        noise = rng.standard_normal((b_real, ty, CFG.n_feats)).astype(np.float32)

        real = Batch(x, x_lengths, y, y_lengths, y_fine, y_fine_lengths, spks)
        # fill rows repeat the real prefix (exactly what _finalize emits)
        fill = lambda a: np.concatenate([a, a[: b_full - b_real]], axis=0)
        filled = Batch(*[fill(np.asarray(f)) for f in tuple(real)[:7]])
        w = np.asarray([1.0] * b_real + [0.0] * (b_full - b_real), np.float32)

        losses_a, grads_a = self._losses_and_grads(
            params, real, (t, noise), np.ones((b_real,), np.float32)
        )
        losses_b, grads_b = self._losses_and_grads(
            params, filled, (fill(t), fill(noise)), w
        )

        for k in ("loss", "diff_loss", "dur_loss", "prior_loss"):
            np.testing.assert_allclose(
                np.asarray(losses_a[k]), np.asarray(losses_b[k]),
                rtol=1e-5, atol=1e-6, err_msg=k,
            )
        flat_a = jax.tree_util.tree_leaves(grads_a)
        flat_b = jax.tree_util.tree_leaves(grads_b)
        for ga, gb in zip(flat_a, flat_b):
            np.testing.assert_allclose(
                np.asarray(ga), np.asarray(gb), rtol=2e-4, atol=1e-6
            )

    def test_unweighted_repeat_fill_is_biased(self):
        """Sanity: WITHOUT the weights the filled batch does NOT match —
        i.e. the weighting is load-bearing, not vacuous."""
        from matcha_tpu.models.matcha import init_params

        params = init_params(CFG, jax.random.PRNGKey(0))
        rng = np.random.default_rng(3)
        b_real, b_full, tx, ty = 2, 4, 10, 12
        x = rng.integers(0, 600, (b_real, tx)).astype(np.int32)
        x_lengths = rng.integers(4, tx + 1, (b_real,)).astype(np.int32)
        y = rng.standard_normal((b_real, ty, CFG.n_feats)).astype(np.float32)
        y_lengths = rng.integers(8, ty + 1, (b_real,)).astype(np.int32)
        y_fine = rng.standard_normal((b_real, 2 * ty, CFG.n_feats)).astype(
            np.float32
        )
        y_fine_lengths = (2 * y_lengths).astype(np.int32)
        spks = rng.integers(0, CFG.n_spks, (b_real,)).astype(np.int32)
        t = rng.uniform(0.1, 0.9, (b_real, 1, 1)).astype(np.float32)
        noise = rng.standard_normal((b_real, ty, CFG.n_feats)).astype(np.float32)

        real = Batch(x, x_lengths, y, y_lengths, y_fine, y_fine_lengths, spks)
        # duplicate ONLY row 0 (unequal duplication): without weights its
        # loss contribution is double-counted, shifting every mean
        fill = lambda a: np.concatenate([a, a[:1]], axis=0)
        filled = Batch(*[fill(np.asarray(f)) for f in tuple(real)[:7]])

        losses_a, _ = self._losses_and_grads(
            params, real, (t, noise), np.ones((b_real,), np.float32)
        )
        losses_b, _ = self._losses_and_grads(
            params, filled, (fill(t), fill(noise)), None
        )
        assert abs(
            float(losses_a["loss"]) - float(losses_b["loss"])
        ) > 1e-4

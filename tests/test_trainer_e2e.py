"""End-to-end Trainer test: synthetic corpus → fit → checkpoint → resume."""

import dataclasses
import json

import numpy as np
import pytest

from matcha_tpu.data.dataset import TextMelDataset
from matcha_tpu.models.config import tiny_config
from matcha_tpu.train.optim import OptimizerConfig
from matcha_tpu.train.trainer import Trainer, TrainerConfig

CFG = tiny_config()


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("traincorpus")
    mel_dir = root / "mels"
    rng = np.random.default_rng(0)
    rows = []
    for i in range(12):
        rel = f"s/u{i}"
        frames = int(rng.integers(12, 40))
        (mel_dir / "s").mkdir(parents=True, exist_ok=True)
        np.save(
            mel_dir / f"{rel}.npy",
            rng.standard_normal((CFG.n_feats, frames)).astype(np.float32),
        )
        np.save(
            mel_dir / f"{rel}.fine.npy",
            rng.standard_normal((CFG.n_feats, 2 * frames)).astype(np.float32),
        )
        ids = " ".join(str(v) for v in rng.integers(0, 600, rng.integers(5, 15)))
        rows.append(f"{rel}|{i % CFG.n_spks}|en-us|text {i}|{ids}")
    (mel_dir / "metadata.json").write_text('{"n_mels": %d}' % CFG.n_feats)
    filelist = root / "train.csv"
    filelist.write_text("\n".join(rows))
    return root, filelist, mel_dir


def make_trainer(corpus, out_name, **overrides):
    root, filelist, mel_dir = corpus
    ds = TextMelDataset(filelist, mel_dir)
    tcfg = TrainerConfig(
        output_dir=str(root / out_name),
        max_epochs=overrides.pop("max_epochs", 2),
        check_val_every_n_epoch=1,
        checkpoint_every_n_epochs=1,
        keep_last_checkpoints=2,
        log_every_n_steps=1,
        use_mesh=overrides.pop("use_mesh", False),
    )
    return Trainer(
        model_cfg=CFG,
        opt_cfg=OptimizerConfig(lr=1e-3),
        trainer_cfg=tcfg,
        train_dataset=ds,
        valid_dataset=ds,
        max_frames_per_batch=256,
        len_bucket=16,
        text_bucket=16,
        **overrides,
    )


class TestTrainerEndToEnd:
    def test_fit_checkpoints_and_metrics(self, corpus):
        root, _, _ = corpus
        trainer = make_trainer(corpus, "run1")
        state = trainer.fit()
        assert int(state.step) > 0

        ckpts = sorted((root / "run1" / "checkpoints").glob("epoch_*"))
        assert 1 <= len(ckpts) <= 2  # keep-last pruning
        metrics = [
            json.loads(line)
            for line in open(root / "run1" / "metrics.jsonl")
        ]
        keys = set().union(*(m.keys() for m in metrics))
        assert "loss/train_epoch" in keys
        assert "loss/val" in keys
        assert "model/params_total" in keys

    def test_resume_from_checkpoint(self, corpus):
        root, _, _ = corpus
        ckpt = sorted((root / "run1" / "checkpoints").glob("epoch_*"))[-1]
        trainer = make_trainer(corpus, "run2", max_epochs=1)
        state = trainer.fit(resume_from=str(ckpt))
        assert int(state.step) > 0

    def test_mesh_training(self, corpus):
        trainer = make_trainer(corpus, "run3", use_mesh=True, max_epochs=1)
        state = trainer.fit()
        assert int(state.step) > 0

    def test_resume_expands_speakers_and_honors_new_lr(self, corpus):
        """Reference load hooks (baselightningmodule.py:89-131): resuming a
        4-speaker checkpoint into a 6-speaker config zero-extends both
        embedding tables + Adam moments, and the new config's lr governs the
        resumed updates."""
        root, filelist, mel_dir = corpus
        ckpt = sorted((root / "run1" / "checkpoints").glob("epoch_*"))[-1]

        ds = TextMelDataset(filelist, mel_dir)
        big_cfg = dataclasses.replace(CFG, n_spks=CFG.n_spks + 2)
        tcfg = TrainerConfig(
            output_dir=str(root / "run4"), max_epochs=1,
            check_val_every_n_epoch=100, checkpoint_every_n_epochs=1,
            log_every_n_steps=1, use_mesh=False,
        )
        trainer = Trainer(
            model_cfg=big_cfg,
            opt_cfg=OptimizerConfig(lr=5e-4),  # new lr on resume
            trainer_cfg=tcfg,
            train_dataset=ds,
            max_frames_per_batch=256, len_bucket=16, text_bucket=16,
        )
        state = trainer.init_state(resume_from=str(ckpt))

        emb = np.asarray(state.params["speaker_embeddings_enc"]["embedding"])
        assert emb.shape[0] == big_cfg.n_spks
        assert np.allclose(emb[CFG.n_spks:], 0.0)  # new rows zero-initialized
        # Adam moments expanded alongside (find mu inside the optax chain)
        mus = [
            np.asarray(leaf)
            for path, leaf in __import__("jax").tree_util.tree_flatten_with_path(
                state.opt_state
            )[0]
            if "speaker_embeddings_enc" in __import__("jax").tree_util.keystr(path)
        ]
        assert mus and all(m.shape[0] == big_cfg.n_spks for m in mus)

        # one real training step on the expanded state
        state2 = trainer.fit(resume_from=str(ckpt), max_steps=int(state.step) + 1)
        assert int(state2.step) == int(state.step) + 1

        # lr is live from the new config: a param actually moved by the step
        d = np.abs(
            np.asarray(state2.params["encoder"]["emb"]["embedding"])
            - np.asarray(state.params["encoder"]["emb"]["embedding"])
        ).max()
        assert d > 0


class TestPrefetch:
    def test_order_and_error_propagation(self, corpus):
        root, filelist, mel_dir = corpus
        ds = TextMelDataset(filelist, mel_dir)
        tcfg = TrainerConfig(
            output_dir=str(root / "pf"), max_epochs=1, use_mesh=False,
            check_val_every_n_epoch=100, checkpoint_every_n_epochs=100,
            log_every_n_steps=1,
        )
        trainer = Trainer(
            model_cfg=CFG, opt_cfg=OptimizerConfig(), trainer_cfg=tcfg,
            train_dataset=ds, max_frames_per_batch=256, len_bucket=16,
            text_bucket=16,
        )
        # order preserved
        items = list(trainer._prefetch(iter([1, 2, 3, 4])))
        assert items == [1, 2, 3, 4]

        # a worker exception surfaces in the consumer
        def boom():
            yield 1
            raise ValueError("collate failed")

        import pytest

        gen = trainer._prefetch(boom())
        assert next(gen) == 1
        with pytest.raises(ValueError, match="collate failed"):
            list(gen)


class TestFinetuneSpeakerCli:
    @pytest.mark.slow
    def test_cli_updates_only_target_speaker_rows(self, corpus):
        """python -m matcha_tpu.finetune_speaker end-to-end: only the target
        speaker's embedding rows move; every other parameter is untouched
        (reference: matcha/finetune_speaker.py:32-55)."""
        import dataclasses as dc

        from matcha_tpu.finetune_speaker import main as finetune_main
        from matcha_tpu.train.checkpoint import load_checkpoint

        root, filelist, mel_dir = corpus
        base_dir = root / "ft_base" / "checkpoints"
        if not base_dir.is_dir():  # self-sufficient when run in isolation
            make_trainer(corpus, "ft_base", max_epochs=1).fit()
        ckpt = sorted(base_dir.glob("epoch_*"))[-1]
        before, _ = load_checkpoint(str(ckpt))

        cfg = {
            "run_name": "ft",
            "seed": 7,
            "data": {
                "train_filelist_path": str(filelist),
                "mel_dir": str(mel_dir),
                "max_frames_per_batch": 256,
                "len_bucket": 16,
                "text_bucket": 16,
            },
            "model": dc.asdict(CFG),
            "optimizer": {"lr": 1e-2, "weight_decay": 0.0},
            "trainer": {
                "max_epochs": 1,
                "check_val_every_n_epoch": 100,
                "checkpoint_every_n_epochs": 1,
                "log_every_n_steps": 1,
            },
            "paths": {"output_dir": str(root / "ft_out")},
            "ckpt_path": str(ckpt),
        }
        cfg_path = root / "ft.yaml"
        cfg_path.write_text(json.dumps(cfg))

        target = 1
        finetune_main(["--config", str(cfg_path), "--target_speaker", str(target)])

        out_ckpts = sorted((root / "ft_out" / "checkpoints").glob("epoch_*"))
        assert out_ckpts
        after, _ = load_checkpoint(str(out_ckpts[-1]))

        for tab in ("speaker_embeddings_enc", "speaker_embeddings_dur"):
            b = np.asarray(before["params"][tab]["embedding"])
            a = np.asarray(after["params"][tab]["embedding"])
            moved = np.abs(a - b).max(axis=1)
            assert moved[target] > 0, f"{tab}: target row did not move"
            others = np.delete(moved, target)
            assert np.all(others == 0), f"{tab}: non-target rows moved"

        # everything outside the two tables is bit-identical
        import jax

        flat_b = jax.tree_util.tree_flatten_with_path(before["params"])[0]
        flat_a = dict(jax.tree_util.tree_flatten_with_path(after["params"])[0])
        for path, leaf in flat_b:
            key = jax.tree_util.keystr(path)
            if "speaker_embeddings" in key:
                continue
            np.testing.assert_array_equal(
                np.asarray(leaf), np.asarray(flat_a[path]), err_msg=key
            )


class TestCheckpointBoundaries:
    """Exact checkpoint set for a fit run: one save per boundary, and the
    final-epoch save never duplicates an in-loop save (the old modulo test
    re-saved when ``done`` fired off a checkpoint boundary)."""

    def _fit_with_recorder(self, corpus, name, max_epochs, every, max_steps=None):
        trainer = make_trainer(corpus, name, max_epochs=max_epochs)
        trainer.cfg.checkpoint_every_n_epochs = every
        trainer.cfg.check_val_every_n_epoch = 10**6
        trainer.cfg.keep_last_checkpoints = 100
        saved = []
        trainer.save = lambda state, epoch: saved.append(epoch)
        # stub the jitted step: boundary logic is host-side control flow
        from matcha_tpu.train.step import TrainState

        def fake_step(state, batch, rng):
            return (
                TrainState(state.params, state.opt_state, state.step + 1),
                {"loss": np.zeros(())},
            )

        trainer.train_step = fake_step
        trainer.fit(max_steps=max_steps)
        trainer.close()
        return saved

    def test_every_epoch_no_final_duplicate(self, corpus):
        saved = self._fit_with_recorder(corpus, "cb1", max_epochs=3, every=1)
        assert saved == [0, 1, 2]

    def test_max_steps_stop_on_boundary_saves_once(self, corpus):
        saved = self._fit_with_recorder(
            corpus, "cb2", max_epochs=10, every=5, max_steps=1
        )
        assert saved == [0]

    def test_off_boundary_end_gets_final_save(self, corpus):
        saved = self._fit_with_recorder(corpus, "cb3", max_epochs=3, every=2)
        assert saved == [1, 2]

    def test_logger_closes(self, corpus):
        trainer = make_trainer(corpus, "cb4", max_epochs=1)
        with trainer:
            pass
        assert trainer.logger.jsonl.closed
        assert trainer.logger.tb is None

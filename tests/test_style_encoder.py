"""StyleEncoder forward/loss tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tpu.models.config import tiny_config
from matcha_tpu.models.matcha import init_params
from matcha_tpu.models.style_encoder import (
    StyleEncoder,
    init_style_params,
    style_encoder_loss,
)
from matcha_tpu.train.step import Batch

CFG = tiny_config()


def make_batch(b=2, tx=8, ty=10):
    rng = np.random.default_rng(0)
    return Batch(
        x=jnp.asarray(rng.integers(0, 600, (b, tx)), jnp.int32),
        x_lengths=jnp.full((b,), tx, jnp.int32),
        y=jnp.asarray(rng.standard_normal((b, ty, CFG.n_feats)), jnp.float32),
        y_lengths=jnp.full((b,), ty, jnp.int32),
        y_fine=jnp.asarray(rng.standard_normal((b, 2 * ty, CFG.n_feats)), jnp.float32),
        y_fine_lengths=jnp.full((b,), 2 * ty, jnp.int32),
        spks=jnp.asarray([0, 1], jnp.int32),
    )


class TestStyleEncoder:
    def test_forward_shapes(self):
        params = init_style_params(CFG, jax.random.PRNGKey(0))
        mel = jnp.zeros((3, 12, CFG.n_feats))
        mask = jnp.ones((3, 12))
        enc, dur = StyleEncoder(spk_emb_dim=CFG.spk_emb_dim).apply(
            {"params": params}, mel, mask
        )
        assert enc.shape == (3, CFG.spk_emb_dim)
        assert dur.shape == (3, CFG.spk_emb_dim)

    def test_masked_pooling_ignores_padding(self):
        params = init_style_params(CFG, jax.random.PRNGKey(0))
        rng = np.random.default_rng(1)
        mel = jnp.asarray(rng.standard_normal((1, 12, CFG.n_feats)), jnp.float32)
        mask_short = jnp.asarray([[1.0] * 6 + [0.0] * 6])
        # mutate the padding region — output must not change
        mel2 = mel.at[:, 6:].set(99.0)
        e1, _ = StyleEncoder(spk_emb_dim=CFG.spk_emb_dim).apply(
            {"params": params}, mel, mask_short
        )
        e2, _ = StyleEncoder(spk_emb_dim=CFG.spk_emb_dim).apply(
            {"params": params}, mel2, mask_short
        )
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)

    def test_loss_finite_and_trains_only_style(self):
        matcha_params = init_params(CFG, jax.random.PRNGKey(0))
        style_params = init_style_params(CFG, jax.random.PRNGKey(1))
        batch = make_batch()

        def loss_fn(sp):
            loss, _ = style_encoder_loss(sp, matcha_params, CFG, batch)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(style_params)
        assert np.isfinite(float(loss))
        gnorm = jax.tree_util.tree_reduce(
            lambda a, b: a + float(jnp.sum(jnp.abs(b))), grads, 0.0
        )
        assert gnorm > 0.0


class TestAddSpeakerCli:
    def test_cli_appends_predicted_rows(self, tmp_path):
        """python -m matcha_tpu.add_speaker end-to-end on a tiny checkpoint:
        the output checkpoint gains one row in both tables (predicted by the
        StyleEncoder from the new speaker's wavs) and n_spks is bumped
        (reference: matcha/add_speaker.py:40-101)."""
        import pickle

        from matcha_tpu.add_speaker import main as add_speaker_main
        from matcha_tpu.train.checkpoint import load_checkpoint, save_checkpoint

        params = init_params(CFG, jax.random.PRNGKey(0))
        save_checkpoint(
            tmp_path / "base", {"params": params, "step": 0, "epoch": 0}, CFG
        )
        style_params = init_style_params(CFG, jax.random.PRNGKey(1))
        with open(tmp_path / "style.pkl", "wb") as f:
            pickle.dump(jax.device_get(style_params), f)

        import wave as wave_mod

        wav_dir = tmp_path / "newspk"
        wav_dir.mkdir()
        rng = np.random.default_rng(2)
        for k in range(2):
            pcm = (rng.uniform(-0.3, 0.3, 24000) * 32767).astype("<i2")
            with wave_mod.open(str(wav_dir / f"rec{k}.wav"), "wb") as f:
                f.setnchannels(1)
                f.setsampwidth(2)
                f.setframerate(24000)
                f.writeframes(pcm.tobytes())

        add_speaker_main([
            "--checkpoint_path", str(tmp_path / "base"),
            "--style_params", str(tmp_path / "style.pkl"),
            "--wav_dir", str(wav_dir),
            "--output", str(tmp_path / "out"),
        ])

        tree2, cfg2 = load_checkpoint(str(tmp_path / "out"))
        assert cfg2.n_spks == CFG.n_spks + 1
        for tab in ("speaker_embeddings_enc", "speaker_embeddings_dur"):
            old = np.asarray(params[tab]["embedding"])
            new = np.asarray(tree2["params"][tab]["embedding"])
            assert new.shape == (CFG.n_spks + 1, CFG.spk_emb_dim)
            np.testing.assert_array_equal(new[:-1], old)
            assert np.isfinite(new[-1]).all() and np.abs(new[-1]).max() > 0


class TestTrainStyleEncoderCli:
    def test_cli_trains_and_saves_params(self, tmp_path):
        """python -m matcha_tpu.train_style_encoder end-to-end: one epoch on
        a synthetic corpus against a frozen tiny checkpoint produces a
        loadable style_params.pkl with finite loss."""
        import json as json_mod
        import pickle

        from matcha_tpu.train.checkpoint import save_checkpoint
        from matcha_tpu.train_style_encoder import main as tse_main

        params = init_params(CFG, jax.random.PRNGKey(0))
        save_checkpoint(
            tmp_path / "base", {"params": params, "step": 0, "epoch": 0}, CFG
        )

        mel_dir = tmp_path / "mels"
        (mel_dir / "s").mkdir(parents=True)
        rng = np.random.default_rng(0)
        rows = []
        for i in range(6):
            rel = f"s/u{i}"
            frames = int(rng.integers(12, 30))
            np.save(mel_dir / f"{rel}.npy",
                    rng.standard_normal((CFG.n_feats, frames)).astype(np.float32))
            np.save(mel_dir / f"{rel}.fine.npy",
                    rng.standard_normal((CFG.n_feats, 2 * frames)).astype(np.float32))
            ids = " ".join(str(v) for v in rng.integers(0, 600, 8))
            rows.append(f"{rel}|{i % CFG.n_spks}|en-us|t{i}|{ids}")
        (mel_dir / "metadata.json").write_text('{"n_mels": %d}' % CFG.n_feats)
        filelist = tmp_path / "train.csv"
        filelist.write_text("\n".join(rows))

        cfg = {
            "seed": 3,
            "data": {
                "train_filelist_path": str(filelist),
                "mel_dir": str(mel_dir),
                "max_frames_per_batch": 256,
                "len_bucket": 16,
                "text_bucket": 16,
            },
            "paths": {"output_dir": str(tmp_path / "style_out")},
            "ckpt_path": str(tmp_path / "base"),
        }
        cfg_path = tmp_path / "cfg.yaml"
        cfg_path.write_text(json_mod.dumps(cfg))

        tse_main(["--config", str(cfg_path), "--max_epochs", "1"])

        out = tmp_path / "style_out" / "style_params.pkl"
        assert out.exists()
        with open(out, "rb") as f:
            sp = pickle.load(f)
        assert all(np.isfinite(l).all() for l in jax.tree_util.tree_leaves(sp))
        metrics = [
            json_mod.loads(l)
            for l in (tmp_path / "style_out" / "metrics.jsonl").read_text().splitlines()
        ]
        assert metrics and np.isfinite(metrics[-1]["loss"])

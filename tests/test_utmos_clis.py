"""UTMOS CLI structure tests with a stubbed predictor.

The real `tarepan/SpeechMOS` predictor needs a torch.hub download (network),
so these tests stub `load_utmos` and run everything else for real: tiny
checkpoint from disk via load_synthesizer, per-speaker / per-(lang,bucket)
grouping, synthesis, score aggregation, report format.  The live-predictor
path stays a release-gate step (RELEASE.md).
"""

from __future__ import annotations

import numpy as np
import pytest


class FakePredictor:
    """Mimics utmos22_strong: (wav[1,T] tensor, sr) -> 0-dim tensor score."""

    def __init__(self):
        self.calls = 0

    def __call__(self, wav, sr):
        import torch

        assert sr == 24000
        assert wav.ndim == 2 and wav.shape[0] == 1
        self.calls += 1
        return torch.tensor(3.5 + 0.1 * (self.calls % 3))


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import jax

    from matcha_tpu.models.config import tiny_config
    from matcha_tpu.models.matcha import init_params
    from matcha_tpu.train.checkpoint import save_checkpoint

    root = tmp_path_factory.mktemp("utmos")
    cfg = tiny_config()
    params = jax.tree.map(
        np.asarray, init_params(cfg, jax.random.PRNGKey(0))
    )
    path = root / "ckpt"
    save_checkpoint(path, {"params": params, "step": np.asarray(0)}, cfg)

    rng = np.random.default_rng(0)
    rows = []
    for i in range(6):
        ids = " ".join(str(v) for v in rng.integers(0, 600, 8 + i))
        lang = "en-us" if i % 2 == 0 else "ro"
        text = "short text" if i < 3 else "a much longer sentence " * 3
        rows.append(f"s/u{i}|{i % 2}|{lang}|{text}|{ids}")
    filelist = root / "validate.csv"
    filelist.write_text("\n".join(rows))
    return path, filelist


def test_utmos_validate_reports_per_speaker(ckpt, capsys, monkeypatch):
    from matcha_tpu.utils import utmos_validate as cli

    fake = FakePredictor()
    monkeypatch.setattr(cli, "load_utmos", lambda hub_dir=None: fake)
    path, filelist = ckpt
    cli.main(
        [
            "--checkpoint_path", str(path),
            "--vocoder_path", "",
            "--filelist", str(filelist),
            "--samples_per_speaker", "2",
            "--steps", "2",
        ]
    )
    out = capsys.readouterr().out
    assert "speaker   0: UTMOS" in out
    assert "speaker   1: UTMOS" in out
    assert "average UTMOS:" in out
    assert fake.calls == 4  # 2 speakers x 2 samples


def test_utmos_short_utterances_buckets_by_lang_and_length(
    ckpt, capsys, monkeypatch
):
    from matcha_tpu.utils import utmos_short_utterances as cli

    fake = FakePredictor()
    monkeypatch.setattr(cli, "load_utmos", lambda hub_dir=None: fake)
    path, filelist = ckpt
    cli.main(
        [
            "--checkpoint_path", str(path),
            "--vocoder_path", "",
            "--filelist", str(filelist),
            "--short_chars", "25",
            "--steps", "2",
        ]
    )
    out = capsys.readouterr().out
    # corpus above has en-us/ro in both short and long buckets
    for lang in ("en-us", "ro"):
        assert f"{lang:>6} short: UTMOS" in out
        assert f"{lang:>6}  long: UTMOS" in out
    assert fake.calls == 6  # every row scored exactly once

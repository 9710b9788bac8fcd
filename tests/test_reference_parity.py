"""End-to-end numerical parity against the ACTUAL reference PyTorch model.

These tests instantiate the genuine reference model code from
/root/reference/matcha/models (via tests/ref_oracle's dependency stubs), run
``tools/convert_matcha_ckpt.convert_state_dict`` on its real ``state_dict()``,
and assert the JAX side reproduces the torch numerics:

  * encoder outputs mu_x / logw            (reference text_encoder.py:375-406)
  * the three training losses incl. MAS    (reference matcha_tts.py:64-164)
  * every fixed-grid ODE solver            (reference flow_matching.py:60-63)
  * a full synthesise() mel + the < 0.1 dB MCD north star
                                           (reference inference.py:78-183)

Scope note — the reference decoder passes a FLOAT 1/0 attention mask into
SDPA (additive-bias semantics, transformer.py:253-258): with no padding that
is a softmax no-op; with padding it lets valid frames attend to padding junk.
This framework uses exact boolean masking (required for padded-bucket
serving), so decoder-side comparisons run on padding-free shapes, where both
semantics provably coincide.  Encoder comparisons additionally cover padded
batches (the reference encoder masks correctly via a bool mask,
text_encoder.py:299-316).
"""

from __future__ import annotations

import sys
from pathlib import Path
from types import SimpleNamespace as NS

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent))

from ref_oracle import load_reference, reference_available  # noqa: E402

if not reference_available():
    pytest.skip("/root/reference not present", allow_module_level=True)

import jax.numpy as jnp  # noqa: E402

from matcha_tpu.models.config import (  # noqa: E402
    DataStatistics,
    DecoderConfig,
    DurationPredictorConfig,
    EncoderConfig,
    MatchaConfig,
)
from matcha_tpu.models.matcha import MatchaTTS as JaxMatchaTTS  # noqa: E402
from matcha_tpu.utils.model_math import (  # noqa: E402
    denormalize,
    downsample_time,
    generate_path,
    sequence_mask,
)
from tools.convert_matcha_ckpt import (  # noqa: E402
    convert_state_dict,
    convert_style_encoder_state_dict,
)

# ---------------------------------------------------------------------------
# model pair construction
# ---------------------------------------------------------------------------

SMALL = dict(
    n_spks=4, n_feats=16, spk_emb_dim=16,
    enc=dict(n_channels=32, filter_channels=64, n_heads=3, n_layers=2,
             kernel_size=3, prenet_kernel_size=3),
    dp=dict(filter_channels=24, kernel_size=3, n_layers=2),
    dec=dict(channels=(48, 48), attention_head_dim=16, n_blocks=1,
             num_mid_blocks=1, num_heads=3),
)

PROD = dict(
    n_spks=16, n_feats=100, spk_emb_dim=96,
    enc=dict(n_channels=192, filter_channels=1152, n_heads=6, n_layers=4,
             kernel_size=5, prenet_kernel_size=3),
    dp=dict(filter_channels=128, kernel_size=5, n_layers=4),
    dec=dict(channels=(320, 320), attention_head_dim=64, n_blocks=2,
             num_mid_blocks=2, num_heads=5),
)

MEL_MEAN, MEL_STD = -4.684777, 6.512275


def build_torch_model(spec, seed=0):
    ref = load_reference()
    enc_cfg = NS(
        encoder_params=NS(
            n_feats=spec["n_feats"], prenet=True, p_dropout=0.1, **spec["enc"]
        ),
        duration_predictor_params=NS(
            filter_channels_dp=spec["dp"]["filter_channels"],
            kernel_size=spec["dp"]["kernel_size"],
            p_dropout=0.1,
            n_layers=spec["dp"]["n_layers"],
        ),
    )
    dec_params = dict(
        channels=list(spec["dec"]["channels"]),
        dropout=0.05,
        attention_head_dim=spec["dec"]["attention_head_dim"],
        n_blocks=spec["dec"]["n_blocks"],
        num_mid_blocks=spec["dec"]["num_mid_blocks"],
        num_heads=spec["dec"]["num_heads"],
    )
    cfm_params = NS(name="CFM", solver="midpoint", sigma_min=1e-4, use_mu_prior=True)
    torch.manual_seed(seed)
    model = ref["matcha_tts"].MatchaTTS(
        n_spks=spec["n_spks"],
        n_feats=spec["n_feats"],
        encoder=enc_cfg,
        decoder=dec_params,
        cfm=cfm_params,
        data_statistics={"mel_mean": MEL_MEAN, "mel_std": MEL_STD},
        spk_emb_dim=spec["spk_emb_dim"],
        optimizer=None,
        scheduler=None,
        prior_loss=True,
        prior_loss_threshold=0.03,
        duration_loss_threshold=1.0,
    )
    model.eval()
    model.batch_idx = 1  # skip the batch-0 quantile diagnostics
    return model


def build_jax_config(spec) -> MatchaConfig:
    return MatchaConfig(
        n_spks=spec["n_spks"],
        n_feats=spec["n_feats"],
        spk_emb_dim=spec["spk_emb_dim"],
        encoder=EncoderConfig(n_feats=spec["n_feats"], p_dropout=0.1, **spec["enc"]),
        duration_predictor=DurationPredictorConfig(p_dropout=0.1, **spec["dp"]),
        decoder=DecoderConfig(**spec["dec"]),
        data_statistics=DataStatistics(mel_mean=MEL_MEAN, mel_std=MEL_STD),
    )


def convert(torch_model, spec):
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params = convert_state_dict(
        sd,
        n_layers_enc=spec["enc"]["n_layers"],
        prenet_layers=6,  # hardcoded in the reference (text_encoder.py:343)
        dp_layers=spec["dp"]["n_layers"],
        channels=spec["dec"]["channels"],
        n_blocks=spec["dec"]["n_blocks"],
        num_mid_blocks=spec["dec"]["num_mid_blocks"],
        strict=True,  # every reference tensor must be consumed
    )
    return jax.tree.map(jnp.asarray, params)


@pytest.fixture(scope="module")
def pair():
    tm = build_torch_model(SMALL)
    cfg = build_jax_config(SMALL)
    return NS(
        torch_model=tm,
        cfg=cfg,
        jax_model=JaxMatchaTTS(cfg),
        params=convert(tm, SMALL),
    )


def t2n(x):
    return x.detach().cpu().numpy()


def spk_embs(pair, spks):
    enc = pair.params["speaker_embeddings_enc"]["embedding"][np.asarray(spks)]
    dur = pair.params["speaker_embeddings_dur"]["embedding"][np.asarray(spks)]
    return jnp.asarray(enc), jnp.asarray(dur)


# ---------------------------------------------------------------------------
# encoder parity
# ---------------------------------------------------------------------------


def run_torch_encoder(pair, x, x_lengths, spks):
    m = pair.torch_model
    with torch.no_grad():
        se = m.speaker_embeddings_enc(torch.as_tensor(spks))
        sd = m.speaker_embeddings_dur(torch.as_tensor(spks))
        mu_x, logw, x_mask = m.encoder(
            torch.as_tensor(x), torch.as_tensor(x_lengths), se, sd
        )
    return t2n(mu_x), t2n(logw), t2n(x_mask)


def run_jax_encoder(pair, x, x_lengths, spks):
    x_mask = sequence_mask(jnp.asarray(x_lengths), x.shape[1]).astype(jnp.float32)
    se, sd = spk_embs(pair, spks)
    mu_x, logw = pair.jax_model.apply(
        {"params": pair.params},
        jnp.asarray(x),
        x_mask,
        se,
        sd,
        method=JaxMatchaTTS.encoder_forward,
    )
    return np.asarray(mu_x), np.asarray(logw), np.asarray(x_mask)


def test_encoder_parity_unpadded(pair):
    rng = np.random.default_rng(1)
    b, tx = 2, 12
    x = rng.integers(1, 500, (b, tx)).astype(np.int64)
    xl = np.array([tx, tx])
    spks = np.array([0, 2])

    mu_t, logw_t, _ = run_torch_encoder(pair, x, xl, spks)
    mu_j, logw_j, _ = run_jax_encoder(pair, x, xl, spks)

    np.testing.assert_allclose(mu_j, mu_t.transpose(0, 2, 1), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(logw_j, logw_t[:, 0, :], atol=2e-5, rtol=1e-4)


def test_encoder_padded_batch_matches_per_sample_reference(pair):
    """A padded JAX batch must equal per-sample (unpadded) reference runs.

    This proves the framework's boolean padding masks are exact: padding in
    the bucketed batch changes nothing on valid positions.  (The torch side
    runs B=1 because SDPA's CPU math backend NaNs on fully-masked rows.)
    """
    rng = np.random.default_rng(2)
    lengths = [12, 9]
    tx = max(lengths)
    x = rng.integers(1, 500, (2, tx)).astype(np.int64)
    x[1, lengths[1]:] = 0
    spks = np.array([1, 3])

    mu_j, logw_j, _ = run_jax_encoder(pair, x, np.array(lengths), spks)

    for i, L in enumerate(lengths):
        mu_t, logw_t, _ = run_torch_encoder(
            pair, x[i : i + 1, :L], np.array([L]), spks[i : i + 1]
        )
        np.testing.assert_allclose(
            mu_j[i, :L], mu_t[0].transpose(1, 0), atol=2e-5, rtol=1e-4
        )
        np.testing.assert_allclose(logw_j[i, :L], logw_t[0, 0], atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# training losses parity (incl. MAS)
# ---------------------------------------------------------------------------


def test_losses_parity(pair):
    rng = np.random.default_rng(3)
    b, tx, ty = 2, 10, 24
    C = pair.cfg.n_feats
    x = rng.integers(1, 500, (b, tx)).astype(np.int64)
    xl = np.full((b,), tx)
    y = rng.standard_normal((b, C, ty)).astype(np.float32)
    yl = np.full((b,), ty)
    yf = rng.standard_normal((b, C, 2 * ty)).astype(np.float32)
    yfl = np.full((b,), 2 * ty)
    spks = np.array([0, 1])

    # fixed CFM randomness, injected into BOTH frameworks
    t_fix = rng.uniform(0.1, 0.9, (b, 1, 1)).astype(np.float32)
    noise_fix = rng.standard_normal((b, C, ty)).astype(np.float32)

    m = pair.torch_model
    orig_rand, orig_randn_like = torch.rand, torch.randn_like
    torch.rand = lambda *a, **k: torch.from_numpy(t_fix)
    torch.randn_like = lambda ref, **k: torch.from_numpy(noise_fix)
    try:
        with torch.no_grad():
            diff_t, dur_t, prior_t = m(
                torch.as_tensor(x), torch.as_tensor(xl),
                torch.from_numpy(y), torch.as_tensor(yl),
                torch.from_numpy(yf), torch.as_tensor(yfl),
                torch.as_tensor(spks),
            )
    finally:
        torch.rand, torch.randn_like = orig_rand, orig_randn_like

    losses = pair.jax_model.apply(
        {"params": pair.params},
        jnp.asarray(x), jnp.asarray(xl),
        jnp.asarray(y.transpose(0, 2, 1)), jnp.asarray(yl),
        jnp.asarray(yf.transpose(0, 2, 1)), jnp.asarray(yfl),
        jnp.asarray(spks),
        jax.random.PRNGKey(0),
        method=JaxMatchaTTS.compute_losses,
        deterministic=True,
        cfm_t_noise=(jnp.asarray(t_fix), jnp.asarray(noise_fix.transpose(0, 2, 1))),
    )

    # dur/prior go through MAS: equality here also proves the lax.scan MAS
    # finds the reference's alignment path
    np.testing.assert_allclose(float(losses["dur_loss"]), float(dur_t), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(float(losses["prior_loss"]), float(prior_t), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(float(losses["diff_loss"]), float(diff_t), atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# ODE solver parity (every fixed-grid method the reference exposes)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("solver,steps", [
    ("euler", 4), ("midpoint", 4), ("rk4", 3), ("heun3", 3),
])
def test_ode_solver_parity(pair, solver, steps):
    rng = np.random.default_rng(4)
    b, ty = 1, 16
    C = pair.cfg.n_feats
    mu = rng.standard_normal((b, C, ty)).astype(np.float32)
    noise = rng.standard_normal((b, C, ty)).astype(np.float32)

    m = pair.torch_model
    with torch.no_grad():
        z = torch.from_numpy(mu + noise)
        t_span = torch.linspace(0, 1, steps + 1)
        mask = torch.ones((b, 1, ty))
        m.decoder.solver = solver
        out_t = t2n(m.decoder.solve(z, t_span=t_span, mu=torch.from_numpy(mu), mask=mask))

    out_j = pair.jax_model.apply(
        {"params": pair.params},
        jnp.asarray(mu.transpose(0, 2, 1)),
        jnp.ones((b, ty), jnp.float32),
        steps,
        solver,
        jnp.asarray(noise.transpose(0, 2, 1)),
        method=JaxMatchaTTS.decode,
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.transpose(0, 2, 1), atol=5e-5, rtol=1e-4
    )


# ---------------------------------------------------------------------------
# full synthesise() parity + the MCD north star
# ---------------------------------------------------------------------------


def mcd_db(m1: np.ndarray, m2: np.ndarray, n_coeffs: int = 13) -> float:
    """Mel-cepstral distortion (dB) between two aligned log-mels (T, C)."""
    c = m1.shape[1]
    k = np.arange(n_coeffs + 1)[:, None]  # c0..c13
    basis = np.cos(np.pi * k * (2 * np.arange(c)[None, :] + 1) / (2 * c))
    c1 = m1 @ basis.T
    c2 = m2 @ basis.T
    d = c1[:, 1:] - c2[:, 1:]  # drop c0 (energy), standard MCD
    return float(np.mean(np.sqrt(2.0 * np.sum(d * d, axis=1))) * 10.0 / np.log(10.0))


def synthesise_pair(spec, pair, seed=5, scale=3.3, steps=4, solver="midpoint"):
    """Run the reference synthesise() orchestration (inference.py:78-183) on
    the torch side and this framework's equivalent on the JAX side, with the
    same injected ODE noise, on padding-free shapes (see module docstring).
    Returns (torch mel, jax mel, torch durations, jax durations)."""
    ref = load_reference()
    rmu = ref["model_utils"]
    rng = np.random.default_rng(seed)
    tx = 12
    x = rng.integers(1, 500, (1, tx)).astype(np.int64)
    xl = np.array([tx])
    spks = np.array([2 % spec["n_spks"]])

    m = pair.torch_model
    with torch.no_grad():
        se = m.speaker_embeddings_enc(torch.as_tensor(spks))
        sd = m.speaker_embeddings_dur(torch.as_tensor(spks))
        mu_x, logw, x_mask = m.encoder(torch.as_tensor(x), torch.as_tensor(xl), se, sd)
        # duration undo + scale + round/clamp (reference inference.py:126-143)
        d = (torch.exp(logw) - 2.0) * x_mask
        d = (d.squeeze(1) * scale).round().clamp(min=1) * x_mask.squeeze(1)
        # pad the last token so total frames are U-Net compatible without any
        # padded buffer (the reference instead over-pads to fix_len*2)
        total = int(d.sum())
        d[0, -1] += (-total) % 4
        dur_t = d.clone()
        y_fine_len = int(d.sum())

        y_fine_mask = rmu.sequence_mask(
            torch.tensor([y_fine_len]), y_fine_len
        ).unsqueeze(1).to(x_mask.dtype)
        attn_mask = x_mask.unsqueeze(-1) * y_fine_mask.unsqueeze(2)
        attn = rmu.generate_path(d, attn_mask.squeeze(1))
        mu_y_fine = torch.matmul(mu_x.float(), attn.float())
        mu_y = rmu.downsample(mu_y_fine)
        ty = y_fine_len // 2

        noise = rng.standard_normal((1, mu_y.shape[1], ty)).astype(np.float32)
        z = mu_y + torch.from_numpy(noise)
        m.decoder.solver = solver
        out = m.decoder.solve(
            z, t_span=torch.linspace(0, 1, steps + 1),
            mu=mu_y, mask=torch.ones((1, 1, ty)),
        )
        mel_t = t2n(rmu.denormalize(out, m.mel_mean, m.mel_std))[0].T  # (T, C)

    # --- JAX side: same pipeline through this framework's ops ---
    x_mask_j = sequence_mask(jnp.asarray(xl), tx).astype(jnp.float32)
    se_j, sd_j = spk_embs(pair, spks)
    mu_x_j, d_raw = pair.jax_model.apply(
        {"params": pair.params}, jnp.asarray(x), x_mask_j, se_j, sd_j,
        method=JaxMatchaTTS.encode,
    )
    d_j = jnp.clip(jnp.round(d_raw * scale), 1) * x_mask_j
    d_j = d_j.at[0, -1].add((-jnp.sum(d_j)) % 4)
    attn_j = generate_path(
        d_j, jnp.ones((1, tx, y_fine_len), jnp.float32)
    )  # (B, Tx, Ty_fine)
    mu_y_fine_j = jnp.einsum("bij,bic->bjc", attn_j, mu_x_j.astype(jnp.float32))
    mu_y_j = downsample_time(mu_y_fine_j)
    mel_j = pair.jax_model.apply(
        {"params": pair.params},
        mu_y_j,
        jnp.ones((1, ty), jnp.float32),
        steps,
        solver,
        jnp.asarray(noise.transpose(0, 2, 1)),
        method=JaxMatchaTTS.decode,
    )
    mel_j = np.asarray(denormalize(mel_j, MEL_MEAN, MEL_STD))[0]  # (T, C)
    return mel_t, mel_j, t2n(dur_t)[0], np.asarray(d_j)[0]


def test_synthesise_parity(pair):
    mel_t, mel_j, dur_t, dur_j = synthesise_pair(SMALL, pair)
    # host duration logic must agree to the integer
    np.testing.assert_array_equal(dur_j.astype(np.int64), dur_t.astype(np.int64))
    np.testing.assert_allclose(mel_j, mel_t, atol=2e-4, rtol=1e-3)
    assert mcd_db(mel_j, mel_t) < 0.1  # the BASELINE.json north star


# ---------------------------------------------------------------------------
# StyleEncoder parity (reference style_encoder.py:42-72 forward, :119-170 losses)
# ---------------------------------------------------------------------------


class TestStyleEncoderParity:
    def test_forward_parity_padded(self):
        """Converted reference StyleEncoder weights produce identical (enc,
        dur) embedding predictions, including under padding, at non-default
        widths (hidden 24, 3 layers)."""
        from matcha_tpu.models.style_encoder import StyleEncoder as JaxStyle

        ref = load_reference()
        torch.manual_seed(9)
        tse = ref["style_encoder"].StyleEncoder(
            n_feats=16, hidden_channels=24, n_layers=3, spk_emb_dim=16
        ).eval()
        params = jax.tree.map(
            jnp.asarray,
            convert_style_encoder_state_dict(
                {k: v.numpy() for k, v in tse.state_dict().items()}, n_layers=3
            ),
        )

        rng = np.random.default_rng(10)
        b, c, t = 2, 16, 20
        mel = rng.standard_normal((b, c, t)).astype(np.float32)
        lengths = np.array([t, 13])
        mask = np.asarray(
            sequence_mask(jnp.asarray(lengths), t), np.float32
        )

        with torch.no_grad():
            enc_t, dur_t = tse(
                torch.from_numpy(mel), torch.from_numpy(mask[:, None, :])
            )
        enc_j, dur_j = JaxStyle(spk_emb_dim=16, hidden=24, n_layers=3).apply(
            {"params": params},
            jnp.asarray(mel.transpose(0, 2, 1)),
            jnp.asarray(mask),
        )
        np.testing.assert_allclose(np.asarray(enc_j), t2n(enc_t), atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(dur_j), t2n(dur_t), atol=2e-5, rtol=1e-4)

    def test_training_losses_parity(self, pair):
        """acoustic/rhythm smooth-L1 losses equal the reference's
        ``StyleEncoderLightningModule._compute_losses`` run on the SAME
        frozen MatchaTTS — anchoring add_speaker's embedding predictions."""
        from matcha_tpu.models.style_encoder import style_encoder_loss
        from matcha_tpu.train.step import Batch

        ref = load_reference()
        # feed the oracle Lightning module our frozen SMALL torch model
        ref["style_encoder"].MatchaTTS.load_from_checkpoint = classmethod(
            lambda cls, *a, **k: pair.torch_model
        )
        torch.manual_seed(13)
        selm = ref["style_encoder"].StyleEncoderLightningModule(
            matcha_checkpoint_path="<patched>",
            n_feats=SMALL["n_feats"],
            ase_hidden_channels=256,  # production widths (configs/model/
            ase_n_layers=4,           # style_encoder/default.yaml:15-16)
            spk_emb_dim=SMALL["spk_emb_dim"],
        ).eval()

        style_params = jax.tree.map(
            jnp.asarray,
            convert_style_encoder_state_dict(
                {k: v.numpy() for k, v in selm.style_encoder.state_dict().items()}
            ),
        )

        rng = np.random.default_rng(11)
        b, tx, tf = 2, 10, 24
        c = SMALL["n_feats"]
        x = rng.integers(1, 500, (b, tx)).astype(np.int64)
        xl = np.full((b,), tx)
        y_fine = rng.standard_normal((b, c, tf)).astype(np.float32)
        yfl = np.array([tf, 17])
        spks = np.array([0, 3])

        with torch.no_grad():
            total_t, acoustic_t, rhythm_t, _, _ = selm._compute_losses(
                {
                    "x": torch.as_tensor(x),
                    "x_lengths": torch.as_tensor(xl),
                    "y_fine": torch.from_numpy(y_fine),
                    "y_fine_lengths": torch.as_tensor(yfl),
                    "spks": torch.as_tensor(spks),
                },
                batch_idx=1,  # skip the batch-0 quantile diagnostics
            )

        ty = tf // 2
        batch = Batch(
            x=jnp.asarray(x), x_lengths=jnp.asarray(xl),
            y=jnp.zeros((b, ty, c), jnp.float32),
            y_lengths=jnp.full((b,), ty, jnp.int32),
            y_fine=jnp.asarray(y_fine.transpose(0, 2, 1)),
            y_fine_lengths=jnp.asarray(yfl),
            spks=jnp.asarray(spks),
        )
        total_j, parts = style_encoder_loss(
            style_params, pair.params, pair.cfg, batch
        )
        np.testing.assert_allclose(
            float(parts["acoustic"]), float(acoustic_t), atol=1e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            float(parts["rhythm"]), float(rhythm_t), atol=1e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            float(total_j), float(total_t), atol=2e-5, rtol=1e-4
        )


def test_decode_padded_bucket_matches_reference_exact_length(pair):
    """Bucketed serving vs the reference's exact-length inference, DIRECTLY.

    The reference synthesises unpadded (B=1, exact Ty); this framework decodes
    at padded mel buckets.  GroupNorm reduces over time, so plain statistics
    would make the valid region depend on the pad amount — masked_norm=True
    (the decode default) computes the statistics over valid frames only, which
    must reproduce the reference's exact-length numbers at ANY bucket.  Pad
    the injected noise with huge garbage past Ty to prove nothing leaks from
    padding (not NaN: masking works by multiplication and 0*NaN is NaN).
    """
    ref = load_reference()
    rmu = ref["model_utils"]
    rng = np.random.default_rng(11)
    ty = 24
    c = SMALL["n_feats"]
    mu = rng.standard_normal((1, c, ty)).astype(np.float32)
    noise = rng.standard_normal((1, c, ty)).astype(np.float32)

    m = pair.torch_model
    with torch.no_grad():
        m.decoder.solver = "midpoint"
        out = m.decoder.solve(
            torch.from_numpy(mu + noise),
            t_span=torch.linspace(0, 1, 5),
            mu=torch.from_numpy(mu),
            mask=torch.ones((1, 1, ty)),
        )
        mel_t = t2n(out)[0].T  # (Ty, C)

    pad_ty = ty + 40  # a strictly larger bucket than the utterance needs
    mu_j = np.zeros((1, pad_ty, c), np.float32)
    mu_j[:, :ty] = mu.transpose(0, 2, 1)
    noise_j = np.full((1, pad_ty, c), 1e6, np.float32)
    noise_j[:, :ty] = noise.transpose(0, 2, 1)
    mask_j = sequence_mask(jnp.asarray([ty]), pad_ty).astype(jnp.float32)
    mel_j = pair.jax_model.apply(
        {"params": pair.params},
        jnp.asarray(mu_j),
        mask_j,
        4,
        "midpoint",
        jnp.asarray(noise_j),
        method=JaxMatchaTTS.decode,
    )
    mel_j = np.asarray(mel_j)[0]
    np.testing.assert_allclose(mel_j[:ty], mel_t, atol=2e-4, rtol=1e-3)
    assert mcd_db(mel_j[:ty], mel_t) < 0.1


@pytest.mark.slow
def test_synthesise_parity_production_size(pair):
    """Same end-to-end check at full production widths (192/1152 encoder,
    320-channel U-Net, 4+2+2 blocks) — the configuration real checkpoints
    ship with."""
    tm = build_torch_model(PROD, seed=7)
    cfg = build_jax_config(PROD)
    prod_pair = NS(
        torch_model=tm, cfg=cfg, jax_model=JaxMatchaTTS(cfg),
        params=convert(tm, PROD),
    )
    mel_t, mel_j, dur_t, dur_j = synthesise_pair(PROD, prod_pair, seed=8)
    np.testing.assert_array_equal(dur_j.astype(np.int64), dur_t.astype(np.int64))
    np.testing.assert_allclose(mel_j, mel_t, atol=5e-4, rtol=1e-3)
    assert mcd_db(mel_j, mel_t) < 0.1

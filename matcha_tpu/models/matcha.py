"""MatchaTTS-24k: the flagship model (encoder + MAS + CFM decoder).

Training computes three losses (reference: matcha/models/matcha_tts.py:64-163):

  1. duration loss — Huber on log(2 + d) between the duration predictor and
     MAS-extracted durations, normalized by total token count
  2. prior loss    — Huber between the MAS-assembled encoder prior mu_y_fine
     and the fine (hop-128) ground-truth mel, normalized by frame count
  3. CFM loss      — masked MSE on the coarse (hop-256) mel with the prior
     stop-gradient'ed so decoder gradients never shape the encoder

The two-resolution scheme: encoder/MAS/prior operate at hop 128 (5 ms frames
— fine enough for stop consonants under the (pre, P, post) tokenization),
decoder/vocoder at hop 256; `downsample_time` bridges them
(reference: matcha/utils/precompute_mels.py:75-121, utils/model.py:57-68).

MAS and the prior matmuls run in fp32 islands: bf16 cannot separate
near-tied alignment paths and training destabilizes after ~100 epochs
(reference: matcha_tts.py:97-106).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from matcha_tpu.models.config import MatchaConfig
from matcha_tpu.models.decoder import Decoder
from matcha_tpu.models.flow_matching import cfm_loss, cfm_synthesise
from matcha_tpu.models.text_encoder import TextEncoder
from matcha_tpu.ops.mas import durations_from_indices, maximum_path_indices_auto
from matcha_tpu.text.symbols import N_VOCAB
from matcha_tpu.utils.model_math import downsample_time, sequence_mask


def log_prior_scores(mu_x: jax.Array, y_fine: jax.Array) -> jax.Array:
    """(B,Tx,C) x (B,Ty,C) → (B,Tx,Ty) Gaussian log-prior -||y-mu||²/2.

    Expanded into y², mu·y, mu² terms so the cross term is one MXU matmul
    (reference: matcha_tts.py:184-201).  Inputs must be fp32.

    precision=HIGHEST is load-bearing, not cosmetic: at JAX's DEFAULT
    precision a TPU fp32 matmul truncates its inputs to single-pass bf16
    on the MXU — exactly the "bf16 matmuls caused prior loss explosions"
    failure the reference pins to highest matmul precision (reference:
    documentation/PROBLEMS.md item 1, prior_problem.md).  HIGHEST makes
    the MXU compose full-fp32 products; the matmul is tiny next to the
    U-Net so the cost is noise.
    """
    y_sq = -0.5 * jnp.sum(jnp.square(y_fine), axis=-1)  # (B, Ty)
    mu_sq = -0.5 * jnp.sum(jnp.square(mu_x), axis=-1)  # (B, Tx)
    cross = jnp.einsum(
        "bic,bjc->bij", mu_x, y_fine,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return y_sq[:, None, :] + cross + mu_sq[:, :, None]


class MatchaTTS(nn.Module):
    """Flagship TTS model.  All public methods are jit-safe."""

    cfg: MatchaConfig

    def setup(self):
        cfg = self.cfg
        self.speaker_embeddings_enc = nn.Embed(
            cfg.n_spks, cfg.spk_emb_dim, name="speaker_embeddings_enc"
        )
        self.speaker_embeddings_dur = nn.Embed(
            cfg.n_spks, cfg.spk_emb_dim, name="speaker_embeddings_dur"
        )
        dtype = jnp.dtype(cfg.compute_dtype)
        self.encoder = TextEncoder(
            cfg=cfg.encoder,
            dp_cfg=cfg.duration_predictor,
            n_vocab=N_VOCAB,
            spk_emb_dim=cfg.spk_emb_dim,
            dtype=dtype,
            attn_backend=cfg.attention_backend,
            name="encoder",
        )
        self.decoder = Decoder(
            cfg=cfg.decoder,
            out_channels=cfg.n_feats,
            dtype=dtype,
            attn_backend=cfg.attention_backend,
            name="decoder",
        )

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------

    def __call__(self, x, x_lengths, y, y_lengths, y_fine, y_fine_lengths, spks, rng):
        return self.compute_losses(
            x, x_lengths, y, y_lengths, y_fine, y_fine_lengths, spks, rng
        )

    def compute_losses(
        self,
        x: jax.Array,            # (B, Tx) int phoneme IDs
        x_lengths: jax.Array,    # (B,)
        y: jax.Array,            # (B, Ty, C) coarse mel (hop 256)
        y_lengths: jax.Array,    # (B,)
        y_fine: jax.Array,       # (B, 2*Ty, C) fine mel (hop 128)
        y_fine_lengths: jax.Array,  # (B,)
        spks: jax.Array,         # (B,) speaker IDs
        rng: jax.Array,
        *,
        deterministic: bool = False,
        cfm_t_noise: tuple[jax.Array, jax.Array] | None = None,
        row_weights: jax.Array | None = None,
    ) -> dict[str, jax.Array]:
        """``row_weights``: optional (B,) per-row loss weights.  The sampler
        repeat-fills under-full buckets to hit the static batch shape; those
        fill rows arrive with weight 0 so every loss normalizes over genuine
        rows only (exact gradient neutrality — the reference never
        duplicates samples, text_mel_datamodule.py:111-133)."""
        cfg = self.cfg
        w = (
            jnp.ones((x.shape[0],), jnp.float32)
            if row_weights is None
            else row_weights.astype(jnp.float32)
        )
        x_mask = sequence_mask(x_lengths, x.shape[1]).astype(jnp.float32)
        y_mask = sequence_mask(y_lengths, y.shape[1]).astype(jnp.float32)
        y_fine_mask = sequence_mask(y_fine_lengths, y_fine.shape[1]).astype(
            jnp.float32
        )

        spk_enc = self.speaker_embeddings_enc(spks)
        spk_dur = self.speaker_embeddings_dur(spks)

        mu_x, logw = self.encoder(
            x, x_mask, spk_enc, spk_dur, deterministic=deterministic
        )

        # ---- MAS alignment (fp32, no gradients) ----
        mu_x32 = mu_x.astype(jnp.float32)
        y_fine32 = y_fine.astype(jnp.float32)
        log_prior = log_prior_scores(
            jax.lax.stop_gradient(mu_x32), y_fine32
        )
        # (B, Ty_fine) frame→token indices; -1 on padding frames
        idx = jax.lax.stop_gradient(
            maximum_path_indices_auto(
                log_prior, x_lengths, y_fine_lengths, backend=cfg.mas_backend
            )
        )

        # ---- duration loss ----
        mas_durations = durations_from_indices(idx, x.shape[1])  # (B, Tx)
        # +2 pushes log targets above 1 where the loss is less forgiving,
        # which markedly helps the duration predictor (reference:
        # matcha_tts.py:113-121); inference subtracts it back.
        logw_target = jnp.log(2.0 + mas_durations) * x_mask
        dur_loss = jnp.sum(
            optax.losses.huber_loss(
                logw, logw_target, delta=cfg.duration_loss_threshold
            )
            * w[:, None]
        ) / jnp.sum(x_lengths * w)

        # ---- prior loss (fine resolution, fp32) ----
        # prior assembly is a gather, not a dense-path matmul: O(B·Ty·C)
        mu_y_fine = jnp.take_along_axis(
            mu_x32, jnp.clip(idx, 0)[:, :, None], axis=1
        ) * y_fine_mask[..., None]  # (B, Ty_fine, C)
        if cfg.prior_loss:
            m = y_fine_mask[..., None]
            prior_loss = jnp.sum(
                optax.losses.huber_loss(
                    mu_y_fine * m, y_fine32 * m, delta=cfg.prior_loss_threshold
                )
                * w[:, None, None]
            ) / jnp.sum(y_fine_mask * w[:, None])
        else:
            prior_loss = jnp.asarray(0.0, jnp.float32)

        # ---- CFM loss (coarse resolution, prior detached) ----
        mu_y = downsample_time(mu_y_fine)[:, : y.shape[1]]
        mu_y = jax.lax.stop_gradient(mu_y)

        def estimator(xt, mask, mu, t):
            return self.decoder(xt, mask, mu, t, deterministic=deterministic)

        diff_loss = cfm_loss(
            estimator,
            x1=y,
            mask=y_mask,
            mu=mu_y,
            rng=rng,
            sigma_min=cfg.cfm.sigma_min,
            use_mu_prior=cfg.cfm.use_mu_prior,
            t_noise=cfm_t_noise,
            row_weights=w,
        )

        # abs-error quantile diagnostics, logged at epoch starts to tune the
        # Huber thresholds (reference: matcha_tts.py:166-182)
        qs = jnp.asarray([0.5, 0.9, 0.99])
        dur_err = jnp.abs(logw - logw_target)
        dur_err = jnp.where(x_mask > 0, dur_err, 0.0)
        prior_err = jnp.abs(mu_y_fine - y_fine32) * y_fine_mask[..., None]
        diagnostics = {
            f"abs_error_quantiles/duration_{q}": v
            for q, v in zip((0.5, 0.9, 0.99), jnp.quantile(dur_err, qs))
        }
        diagnostics.update(
            {
                f"abs_error_quantiles/prior_{q}": v
                for q, v in zip((0.5, 0.9, 0.99), jnp.quantile(prior_err, qs))
            }
        )

        return {
            "diff_loss": diff_loss,
            "dur_loss": dur_loss,
            "prior_loss": prior_loss,
            "loss": diff_loss + dur_loss + prior_loss,
            # diagnostics used for Huber-threshold tuning
            "mas_frames": jnp.sum(mas_durations * x_mask),
            **diagnostics,
        }

    # ------------------------------------------------------------------
    # inference (split so the host can pick the mel bucket in between)
    # ------------------------------------------------------------------

    def encoder_forward(self, x, x_mask, spk_enc, spk_dur):
        """Raw encoder pass: (mu_x, logw) without the duration transform.

        Used by the StyleEncoder training loop, which penalizes log-space
        duration differences directly.
        """
        return self.encoder(x, x_mask, spk_enc, spk_dur, deterministic=True)

    def encode(self, x, x_mask, spk_enc, spk_dur):
        """Text → (mu_x, durations).  First stage of synthesis.

        Returns raw (pre-rounding) per-token durations in fine frames;
        exp(logw) - 2 undoes the training-time +2 shift
        (reference: matcha/inference.py:126-128).
        """
        mu_x, logw = self.encoder(x, x_mask, spk_enc, spk_dur, deterministic=True)
        durations = (jnp.exp(logw) - 2.0) * x_mask
        return mu_x, durations

    def decode(
        self,
        mu_y,
        y_mask,
        n_timesteps: int,
        solver: str | None = None,
        noise: jax.Array | None = None,
        masked_norm: bool = True,
    ):
        """Prior → mel via the CFM ODE.  Second stage of synthesis.

        ``masked_norm=True`` (default) computes the U-Net's GroupNorm
        statistics over valid frames only, which reproduces the reference's
        unpadded exact-length inference (matcha/models/matcha_tts.py
        synthesise runs B=1 with no padding) at our padded buckets — the
        output becomes invariant to bucket choice and batch composition.
        Training keeps unmasked stats to match the reference's padded
        training batches (see Block1D).
        """

        def estimator(xt, mask, mu, t):
            return self.decoder(
                xt, mask, mu, t, deterministic=True, masked_norm=masked_norm
            )

        return cfm_synthesise(
            estimator,
            mu_y,
            y_mask,
            n_timesteps,
            solver=solver or self.cfg.cfm.solver,
            use_mu_prior=self.cfg.cfm.use_mu_prior,
            noise=noise,
        )

    def speaker_embeddings(self, spks):
        return self.speaker_embeddings_enc(spks), self.speaker_embeddings_dur(spks)


def init_params(cfg: MatchaConfig, rng: jax.Array):
    """Initialize a parameter pytree with tiny dummy shapes."""
    model = MatchaTTS(cfg)
    b, tx, ty = 2, 8, 16
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        jnp.zeros((b, tx), jnp.int32),
        jnp.full((b,), tx),
        jnp.zeros((b, ty, cfg.n_feats)),
        jnp.full((b,), ty),
        jnp.zeros((b, 2 * ty, cfg.n_feats)),
        jnp.full((b,), 2 * ty),
        jnp.zeros((b,), jnp.int32),
        jax.random.fold_in(rng, 2),
    )
    return variables["params"]

"""StyleEncoder: predict speaker embeddings from a mel sample.

Enables zero-shot speaker addition: given a few recordings of a new voice,
predict the (enc, dur) embedding pair and append rows to the tables
(reference: matcha/style_encoder.py:42-72 — 4 conv layers, masked mean
pool, two linear heads; training: :119-170 — the frozen MatchaTTS encoder
is run twice, with real vs predicted embeddings, and smooth-L1 penalties on
mu_x (acoustic) and logw (rhythm) pull the predictions toward embeddings
that reproduce the real speaker's encoder behaviour).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from matcha_tpu.models.config import MatchaConfig
from matcha_tpu.models.matcha import MatchaTTS
from matcha_tpu.utils.model_math import sequence_mask


class StyleEncoder(nn.Module):
    """(B, T, n_feats) fine mel → two (B, spk_emb_dim) embeddings."""

    spk_emb_dim: int = 96
    hidden: int = 256
    n_layers: int = 4
    kernel_size: int = 5

    @nn.compact
    def __call__(self, mel: jax.Array, mask: jax.Array):
        h = mel
        m = mask[..., None]
        for i in range(self.n_layers):
            h = nn.Conv(self.hidden, (self.kernel_size,), padding="SAME", name=f"conv{i}")(
                h * m
            )
            h = nn.relu(h)
        pooled = jnp.sum(h * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
        enc = nn.Dense(self.spk_emb_dim, name="head_enc")(pooled)
        dur = nn.Dense(self.spk_emb_dim, name="head_dur")(pooled)
        return enc, dur


def style_encoder_loss(
    style_params,
    matcha_params,
    matcha_cfg: MatchaConfig,
    batch,  # Batch namedtuple (uses x, x_lengths, y_fine, y_fine_lengths, spks)
    *,
    acoustic_beta: float = 0.002,
    rhythm_beta: float = 0.004,
):
    """Smooth-L1 losses against the frozen MatchaTTS encoder.

    The frozen model's encoder runs twice — once with the true embedding
    table rows, once with StyleEncoder predictions — and the difference in
    its outputs (mu_x, logw) is penalized (reference: style_encoder.py:119-170,
    ``F.smooth_l1_loss(..., beta=0.002/0.004, reduction='sum') / x_mask.sum()``).
    torch's smooth_l1(beta) equals huber(delta=beta)/beta elementwise.
    """
    model = MatchaTTS(matcha_cfg)
    style = StyleEncoder(spk_emb_dim=matcha_cfg.spk_emb_dim)

    y_fine_mask = sequence_mask(
        batch.y_fine_lengths, batch.y_fine.shape[1]
    ).astype(jnp.float32)
    pred_enc, pred_dur = style.apply(
        {"params": style_params}, batch.y_fine, y_fine_mask
    )

    frozen = jax.lax.stop_gradient
    real_enc, real_dur = model.apply(
        {"params": matcha_params},
        batch.spks,
        method=MatchaTTS.speaker_embeddings,
    )
    x_mask = sequence_mask(batch.x_lengths, batch.x.shape[1]).astype(jnp.float32)

    def encoder_outputs(spk_enc, spk_dur):
        mu_x, logw = model.apply(
            {"params": matcha_params},
            batch.x,
            x_mask,
            spk_enc,
            spk_dur,
            method=MatchaTTS.encoder_forward,
        )
        return mu_x, logw

    mu_real, w_real = encoder_outputs(frozen(real_enc), frozen(real_dur))
    mu_pred, w_pred = encoder_outputs(pred_enc, pred_dur)
    mu_real, w_real = frozen(mu_real), frozen(w_real)

    m3 = x_mask[..., None]
    acoustic = jnp.sum(
        optax.losses.huber_loss(mu_pred * m3, mu_real * m3, delta=acoustic_beta)
    ) / acoustic_beta / jnp.maximum(jnp.sum(x_mask), 1.0)
    rhythm = jnp.sum(
        optax.losses.huber_loss(w_pred * x_mask, w_real * x_mask, delta=rhythm_beta)
    ) / rhythm_beta / jnp.maximum(jnp.sum(x_mask), 1.0)
    return acoustic + rhythm, {"acoustic": acoustic, "rhythm": rhythm}


def init_style_params(cfg: MatchaConfig, rng) -> dict:
    style = StyleEncoder(spk_emb_dim=cfg.spk_emb_dim)
    mel = jnp.zeros((1, 16, cfg.n_feats))
    mask = jnp.ones((1, 16))
    return style.init(rng, mel, mask)["params"]

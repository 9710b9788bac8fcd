"""Single-speaker fine-tuning: ``python -m matcha_tpu.finetune_speaker``.

Freezes everything except the two speaker-embedding tables and restricts
gradients to the target speaker's rows (reference:
matcha/finetune_speaker.py:32-55, which uses requires_grad + per-row
gradient hooks).  In JAX this is a clean composition:

  * a trainable-mask pytree (True only on the two embedding leaves) feeds
    ``optax.masked(set_to_zero)`` so every other parameter is untouched
  * a row mask multiplies the embedding gradients inside the loss wrapper,
    zeroing all rows but the target

The dataset is filtered to the target speaker before batching.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax

from matcha_tpu.train.__main__ import build_trainer
from matcha_tpu.utils.configs import compose


def trainable_mask_for_speaker(params) -> dict:
    """Pytree of bools: True only for the two speaker-embedding tables."""

    def from_path(path, _leaf):
        return any(
            getattr(p, "key", None)
            in ("speaker_embeddings_enc", "speaker_embeddings_dur")
            for p in path
        )

    return jax.tree_util.tree_map_with_path(from_path, params)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Fine-tune one speaker's embeddings")
    parser.add_argument(
        "--config",
        default=str(Path(__file__).resolve().parent.parent / "configs" / "train.yaml"),
    )
    parser.add_argument("--target_speaker", type=int, required=True)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    cfg = compose(args.config, args.overrides)
    ckpt_path = cfg.get("ckpt_path")
    if not ckpt_path:
        raise SystemExit("finetune_speaker requires ckpt_path=<checkpoint dir>")

    from matcha_tpu.train.checkpoint import load_checkpoint

    tree, _ = load_checkpoint(ckpt_path)
    mask = trainable_mask_for_speaker(tree["params"])

    trainer = build_trainer(cfg, trainable_mask=mask)
    # Restrict the corpus to the target speaker.  Row isolation inside the
    # embedding tables then comes for free: embedding gradients are nonzero
    # only for looked-up rows, and embeddings are in the no-decay group, so
    # untouched rows receive exactly zero updates.
    train_ds = trainer.train_ds.filter_speaker(args.target_speaker)
    valid_ds = (
        trainer.valid_ds.filter_speaker(args.target_speaker)
        if trainer.valid_ds is not None
        else None
    )
    if len(train_ds) == 0:
        raise SystemExit(f"No utterances for speaker {args.target_speaker}")
    trainer.set_datasets(train_ds, valid_ds)

    trainer.fit(resume_from=ckpt_path)


if __name__ == "__main__":
    main()

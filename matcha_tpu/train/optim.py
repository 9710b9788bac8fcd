"""Optimizer construction: AdamW with reference-equivalent param grouping.

The reference excludes Embedding / LayerNorm parameters and all biases from
weight decay (reference: matcha/models/baselightningmodule.py:29-59) and
clips gradients at global-norm 4 (configs/trainer/default.yaml:23-26).

In a flax param pytree the same rule reduces to a path predicate: only
leaves named ``kernel`` (Dense/Conv weights) decay — embeddings
(``embedding``), norm scales (``gamma``/``beta``/``scale``), biases, and the
SnakeBeta ``alpha``/``beta`` are all excluded.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import optax


@dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 5e-5
    weight_decay: float = 1e-4
    b1: float = 0.9
    b2: float = 0.99
    eps: float = 1e-8
    grad_clip: float = 4.0
    # apply the update every N steps, averaging gradients in between
    # (reference: accumulate_grad_batches, configs/trainer/default.yaml:29)
    accumulate_grad_batches: int = 1
    # skip updates on non-finite gradients instead of corrupting the state
    skip_nonfinite_updates: bool = True


def decay_mask(params) -> dict:
    """True for leaves that should receive weight decay (matmul kernels)."""

    def from_path(path, _leaf):
        return path[-1].key == "kernel"

    return jax.tree_util.tree_map_with_path(from_path, params)


def build_optimizer(
    cfg: OptimizerConfig, params=None, trainable_mask=None
) -> optax.GradientTransformation:
    """AdamW chain: clip(4) → adamw(decay only on kernels) [→ freeze mask].

    Args:
        trainable_mask: optional pytree of bools; False leaves get zero
            updates (used by speaker fine-tuning, see train/finetune.py).
    """
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            learning_rate=cfg.lr,
            b1=cfg.b1,
            b2=cfg.b2,
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
            mask=decay_mask,
        ),
    )
    if trainable_mask is not None:
        tx = optax.chain(
            tx,
            optax.masked(
                optax.set_to_zero(),
                jax.tree.map(lambda m: not m, trainable_mask),
            ),
        )
    if cfg.skip_nonfinite_updates:
        # a NaN/Inf batch becomes a no-op step instead of poisoning params
        # (failure containment the reference lacks; SURVEY.md §5)
        tx = optax.apply_if_finite(tx, max_consecutive_errors=10)
    if cfg.accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulate_grad_batches)
    return tx

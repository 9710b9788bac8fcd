"""Jitted training/eval steps with data-parallel sharding.

One compiled program per batch-shape bucket contains the full pipeline:
forward (encoder + MAS + CFM) → backward → global-norm clip → AdamW update.
Under a multi-chip mesh the batch arrives sharded on the ``data`` axis and
parameters replicated; XLA inserts the gradient all-reduce over ICI.

Equivalent surface to the reference training_step
(reference: matcha/models/baselightningmodule.py:61-171) without the
Lightning machinery: state in, state out, metrics dict out.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from matcha_tpu.models.config import MatchaConfig
from matcha_tpu.models.matcha import MatchaTTS
from matcha_tpu.parallel.mesh import DATA_AXIS


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


class Batch(NamedTuple):
    """One padded, bucketed training batch (all device arrays)."""

    x: jax.Array             # (B, Tx) int32 phoneme IDs
    x_lengths: jax.Array     # (B,)
    y: jax.Array             # (B, Ty, C) coarse mel
    y_lengths: jax.Array     # (B,)
    y_fine: jax.Array        # (B, 2*Ty, C) fine mel
    y_fine_lengths: jax.Array  # (B,)
    spks: jax.Array          # (B,)
    # (B,) per-row loss weights; 0 marks repeat-filled rows so under-full
    # buckets are gradient-neutral.  None (the default, for hand-built
    # batches) means all-ones.
    weights: jax.Array | None = None


def make_train_step(
    cfg: MatchaConfig,
    tx: optax.GradientTransformation,
    mesh=None,
    state_sharding: TrainState | None = None,
):
    """Build the jitted train step.  ``mesh=None`` → single-device jit.

    ``state_sharding``: optional NamedSharding pytree for the TrainState
    (build with ``parallel.sharding.state_shardings``) — used for
    tensor-parallel runs on a 2-D (data, model) mesh, where parameters are
    sharded instead of replicated and GSPMD inserts the per-pair
    all-reduces (see parallel/sharding.py).  Default: replicated params.
    """
    if mesh is not None and cfg.attention_backend == "auto":
        # a Pallas flash-attention custom call inside a GSPMD-sharded jit
        # has no partitioning rule (same constraint as the MAS kernel, which
        # has a dedicated shard_map variant) — use the einsum SDPA, which
        # XLA shards along the batch axis like the rest of the model
        import dataclasses

        cfg = dataclasses.replace(cfg, attention_backend="einsum")
    model = MatchaTTS(cfg)

    def loss_fn(params, batch: Batch, rng):
        losses = model.apply(
            {"params": params},
            batch.x,
            batch.x_lengths,
            batch.y,
            batch.y_lengths,
            batch.y_fine,
            batch.y_fine_lengths,
            batch.spks,
            rng,
            row_weights=batch.weights,
            rngs={"dropout": jax.random.fold_in(rng, 7)},
            method=MatchaTTS.compute_losses,
        )
        return losses["loss"], losses

    def train_step(state: TrainState, batch: Batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        grads, losses = jax.grad(loss_fn, has_aux=True)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": losses["loss"],
            "sub_loss/diff": losses["diff_loss"],
            "sub_loss/dur": losses["dur_loss"],
            "sub_loss/prior": losses["prior_loss"],
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(params, opt_state, state.step + 1), metrics

    def eval_step(params, batch: Batch, rng):
        _, losses = loss_fn(params, batch, rng)
        return {
            "loss": losses["loss"],
            "sub_loss/diff": losses["diff_loss"],
            "sub_loss/dur": losses["dur_loss"],
            "sub_loss/prior": losses["prior_loss"],
        }

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    state_sh = (
        state_sharding
        if state_sharding is not None
        else TrainState(params=repl, opt_state=repl, step=repl)
    )
    # prefix sharding: one NamedSharding covers every Batch leaf (and skips
    # a None weights field from hand-built batches)
    batch_sh = data
    train_jit = jax.jit(
        train_step,
        in_shardings=(state_sh, batch_sh, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )
    eval_jit = jax.jit(
        eval_step,
        in_shardings=(state_sh.params, batch_sh, repl),
        out_shardings=repl,
    )
    return train_jit, eval_jit


def init_train_state(cfg: MatchaConfig, tx, rng) -> TrainState:
    from matcha_tpu.models.matcha import init_params

    params = init_params(cfg, rng)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

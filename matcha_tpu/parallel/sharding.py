"""Tensor-parallel parameter sharding over a 2-D (data, model) mesh.

Megatron-style column->row pairs on every FFN and attention projection so
each pair costs exactly ONE all-reduce in the forward (and one in the
backward), inserted automatically by XLA's GSPMD partitioner from the
parameter shardings — no hand-written collectives:

* FFN up-projection kernels shard their OUTPUT channels on ``model``
  (column parallel); the paired down-projection shards its INPUT channels
  (row parallel), producing a partial sum that GSPMD psums over ICI.
* Attention q/k/v kernels shard the head dimension (column parallel);
  the output projection shards its input (row parallel).
* Per-hidden-channel vectors that live between the pair (FFN bias, the
  snake-beta alpha/beta gains) shard with the hidden channels.
* Everything else — embeddings, convs inside GroupNorm-coupled resnet
  blocks, norms, small heads — stays replicated: at Matcha widths those
  matmuls are far below the MXU tile, so sharding them would trade one
  cheap compute for many reshards.

The reference has no model parallelism at all (single-GPU torch,
SURVEY.md §2.8); this module exists for width-scaled variants where one
chip's HBM or latency budget no longer fits the decoder.  Data
parallelism remains the production recommendation at reference widths.

A dimension is sharded only when the ``model`` axis size divides it;
otherwise the leaf silently stays replicated (GSPMD would otherwise pad
unevenly) — so any width config is valid under any mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from matcha_tpu.parallel.mesh import DATA_AXIS

MODEL_AXIS = "model"


def make_mesh_2d(devices=None, dp: int | None = None, tp: int = 1) -> Mesh:
    """A (data, model) mesh: ``dp * tp`` devices, dp inferred if omitted.

    Adjacent device ids land on the ``model`` axis (fastest-varying), so
    on a TPU slice the per-pair all-reduces ride nearest-neighbour ICI.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if dp is None:
        if len(devices) % tp != 0:
            raise ValueError(f"{len(devices)} devices not divisible by tp={tp}")
        dp = len(devices) // tp
    devices = devices[: dp * tp]
    return Mesh(
        np.asarray(devices).reshape(dp, tp), (DATA_AXIS, MODEL_AXIS)
    )


# (path-suffix match, kernel spec) rules.  Paths are flax param-dict keys;
# a rule fires when its components appear, in order, at the END of the
# leaf's key path.  Kernel layouts:
#   Dense   (in, out);  Conv1d (k, in, out);  vectors (channels,)
_COLUMN = "column"  # shard output channels  -> P(..., 'model')
_ROW = "row"        # shard input channels   -> P(..., 'model', None)
_VECTOR = "vector"  # per-hidden-channel     -> P('model')

_RULES: tuple[tuple[tuple[str, ...], str], ...] = (
    # decoder U-Net transformer blocks (models/decoder.py)
    (("ff", "proj_in", "kernel"), _COLUMN),
    (("ff", "proj_in", "bias"), _VECTOR),
    (("ff", "alpha"), _VECTOR),
    (("ff", "beta"), _VECTOR),
    (("ff", "proj_out", "kernel"), _ROW),
    (("to_q", "kernel"), _COLUMN),
    (("to_k", "kernel"), _COLUMN),
    (("to_v", "kernel"), _COLUMN),
    (("to_out", "kernel"), _ROW),
    # text encoder (models/text_encoder.py)
    (("ConvFFN_0", "Conv_0", "kernel"), _COLUMN),
    (("ConvFFN_0", "Conv_0", "bias"), _VECTOR),
    (("ConvFFN_0", "Conv_1", "kernel"), _ROW),
    (("ConvFFN_1", "Conv_0", "kernel"), _COLUMN),
    (("ConvFFN_1", "Conv_0", "bias"), _VECTOR),
    (("ConvFFN_1", "Conv_1", "kernel"), _ROW),
    (("q", "kernel"), _COLUMN),
    (("q", "bias"), _VECTOR),
    (("k", "kernel"), _COLUMN),
    (("k", "bias"), _VECTOR),
    (("v", "kernel"), _COLUMN),
    (("v", "bias"), _VECTOR),
    (("out", "kernel"), _ROW),
)


def _path_names(path) -> tuple[str, ...]:
    names = []
    for entry in path:
        key = getattr(entry, "key", None)
        if key is None:
            key = getattr(entry, "name", str(entry))
        names.append(str(key))
    return tuple(names)


def _spec_for(names: tuple[str, ...], shape: tuple[int, ...], tp: int):
    for suffix, kind in _RULES:
        if names[-len(suffix):] == suffix:
            if kind == _VECTOR:
                dim = 0
            elif kind == _COLUMN:
                dim = len(shape) - 1  # output channels (last)
            else:  # _ROW
                dim = len(shape) - 2  # input channels (second-to-last)
            if dim < 0 or shape[dim] % tp != 0:
                return P()  # indivisible -> replicate (see module doc)
            spec = [None] * len(shape)
            spec[dim] = MODEL_AXIS
            return P(*spec)
    return P()


def tp_param_specs(params, tp: int):
    """PartitionSpec pytree for ``params`` under a model axis of size ``tp``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(_path_names(path), leaf.shape, tp), params
    )


def _spec_lookup(param_specs):
    """path-names -> PartitionSpec, matching the LONGEST param-path suffix.

    Optax states (Adam mu/nu, apply_if_finite wrappers, masked chains)
    embed the parameter tree under extra prefix keys, so a state leaf is
    matched to its parameter by key-path suffix; non-param leaves (step
    counters, scalars) fall through to replicated.
    """
    spec_by_path = {
        _path_names(p): s
        for p, s in jax.tree_util.tree_flatten_with_path(param_specs)[0]
    }
    max_len = max((len(k) for k in spec_by_path), default=0)

    def lookup(path) -> P:
        names = _path_names(path)
        for take in range(min(len(names), max_len), 0, -1):
            spec = spec_by_path.get(names[-take:])
            if spec is not None:
                return spec
        return P()

    return lookup


def state_shardings(mesh: Mesh, param_specs, tree):
    """NamedSharding pytree for any params-embedding pytree (TrainState,
    optax state): each leaf inherits the spec of the param whose key path
    suffixes it; everything else is replicated."""
    lookup = _spec_lookup(param_specs)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, lookup(path)), tree
    )


def shard_pytree(mesh: Mesh, param_specs, tree):
    """``device_put`` any params-embedding pytree per ``state_shardings``."""
    lookup = _spec_lookup(param_specs)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(
            leaf, NamedSharding(mesh, lookup(path))
        ),
        tree,
    )

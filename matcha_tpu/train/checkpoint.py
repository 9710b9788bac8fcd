"""Checkpointing + checkpoint surgery.

Format: one directory per step containing an Orbax-saved pytree
``{"params": ..., "opt_state": ..., "step": ...}`` plus ``config.json``
holding the full MatchaConfig — so inference can rebuild the model with no
external config files, mirroring the reference's hparams-in-checkpoint
contract (reference: matcha/inference.py:186-197).

Surgery utilities cover the reference's checkpoint workflows:
  * speaker-table expansion incl. Adam moment rows
    (reference: matcha/models/baselightningmodule.py:99-131)
  * uniform checkpoint averaging (reference: matcha/utils/average_checkpoints.py)
  * inference stripping (reference: matcha/utils/prepare_ckpt_for_release.py)
All operate on plain pytrees — no framework-specific state objects.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np

from matcha_tpu.models.config import MatchaConfig

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except ImportError:  # pragma: no cover
    _HAS_ORBAX = False


# ---------------------------------------------------------------------------
# save / load
# ---------------------------------------------------------------------------

def save_checkpoint(path: str | Path, tree: dict, cfg: MatchaConfig) -> None:
    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path / "state", jax.tree.map(np.asarray, tree))
        ckptr.wait_until_finished()
    else:  # minimal fallback: flat npz
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        np.savez(
            path / "state.npz",
            **{jax.tree_util.keystr(k): np.asarray(v) for k, v in flat},
        )
    (path / "config.json").write_text(json.dumps(cfg.to_dict(), indent=2))


def load_checkpoint(
    path: str | Path, target: dict | None = None
) -> tuple[dict, MatchaConfig]:
    """Restore a checkpoint directory.

    ``target`` (optional) is a pytree template: orbax stores nested
    containers as plain dicts, so restoring optimizer state that must keep
    its optax NamedTuple structure requires the template (Trainer passes a
    freshly-initialized state).
    """
    path = Path(path).absolute()
    cfg = MatchaConfig.from_dict(json.loads((path / "config.json").read_text()))
    if (path / "state").exists() and _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        if target is not None:
            tree = ckptr.restore(
                path / "state", jax.tree.map(np.asarray, target)
            )
        else:
            tree = ckptr.restore(path / "state")
    else:
        raise FileNotFoundError(f"No checkpoint state under {path}")
    return tree, cfg


def strip_for_release(tree: dict) -> dict:
    """Drop optimizer state, keep params only (smaller serving artifact)."""
    return {"params": tree["params"], "step": tree.get("step", 0)}


# ---------------------------------------------------------------------------
# surgery
# ---------------------------------------------------------------------------

def average_checkpoints(trees: list[dict]) -> dict:
    """Uniform parameter average of N checkpoints (params subtree only)."""
    n = float(len(trees))
    params = jax.tree.map(
        lambda *leaves: sum(np.asarray(l, dtype=np.float64) for l in leaves) / n,
        *[t["params"] for t in trees],
    )
    out = dict(trees[-1])
    out["params"] = jax.tree.map(
        lambda avg, ref: avg.astype(np.asarray(ref).dtype),
        params,
        trees[-1]["params"],
    )
    return out


def _expand_rows(arr, new_rows: int, init: str = "zeros", rng=None, scale=1e-2):
    arr = np.asarray(arr)
    extra_shape = (new_rows,) + arr.shape[1:]
    if init == "zeros":
        extra = np.zeros(extra_shape, arr.dtype)
    else:
        extra = (np.random.default_rng(rng).standard_normal(extra_shape) * scale).astype(
            arr.dtype
        )
    return np.concatenate([arr, extra], axis=0)


def expand_speaker_tables(
    tree: dict, cfg: MatchaConfig, new_n_spks: int, init: str = "zeros"
) -> tuple[dict, MatchaConfig]:
    """Grow both speaker-embedding tables (and their Adam moments) to
    ``new_n_spks`` rows so training can resume with added speakers.

    (reference: baselightningmodule.py:99-131 — the moments must be expanded
    too or the optimizer state no longer matches the param shapes.)
    """
    old = cfg.n_spks
    if new_n_spks <= old:
        return tree, cfg
    extra = new_n_spks - old

    def grow(subtree):
        for name in ("speaker_embeddings_enc", "speaker_embeddings_dur"):
            if name in subtree:
                subtree[name]["embedding"] = _expand_rows(
                    subtree[name]["embedding"], extra, init
                )

    tree = jax.tree.map(np.asarray, tree)  # materialize + copy
    grow(tree["params"])

    # optax state: walk every array leaf shaped like an embedding table and
    # expand moments in-place (mu / nu inside ScaleByAdamState)
    def grow_opt(obj):
        if isinstance(obj, dict):
            for k, v in obj.items():
                if (
                    isinstance(v, dict)
                    and "embedding" in v
                    and k.startswith("speaker_embeddings")
                ):
                    v["embedding"] = _expand_rows(v["embedding"], extra, "zeros")
                else:
                    grow_opt(v)
        elif isinstance(obj, (list, tuple)):
            for v in obj:
                grow_opt(v)
        elif hasattr(obj, "_fields"):  # NamedTuple (optax states)
            for v in obj:
                grow_opt(v)

    if "opt_state" in tree:
        grow_opt(tree["opt_state"])

    import dataclasses

    return tree, dataclasses.replace(cfg, n_spks=new_n_spks)


def add_speaker_rows(
    tree: dict,
    cfg: MatchaConfig,
    enc_row: np.ndarray,
    dur_row: np.ndarray,
) -> tuple[dict, MatchaConfig]:
    """Append one concrete speaker (e.g. StyleEncoder-predicted embeddings).

    (reference: matcha/add_speaker.py:64-99)
    """
    tree, cfg2 = expand_speaker_tables(tree, cfg, cfg.n_spks + 1)
    tree["params"]["speaker_embeddings_enc"]["embedding"][-1] = np.asarray(enc_row)
    tree["params"]["speaker_embeddings_dur"]["embedding"][-1] = np.asarray(dur_row)
    return tree, cfg2


def transplant_speaker(
    dst_tree: dict, src_tree: dict, dst_id: int, src_id: int
) -> dict:
    """Copy one speaker's embedding rows between checkpoints.

    (reference README documents utils.transplant_spk_emb but the tool is
    missing from the tree — SURVEY.md §2.7; implemented here for real.)
    """
    for name in ("speaker_embeddings_enc", "speaker_embeddings_dur"):
        dst = np.asarray(dst_tree["params"][name]["embedding"]).copy()
        src = np.asarray(src_tree["params"][name]["embedding"])
        dst[dst_id] = src[src_id]
        dst_tree["params"][name]["embedding"] = dst
    return dst_tree

"""Train the StyleEncoder against a frozen MatchaTTS checkpoint.

CLI:  python -m matcha_tpu.train_style_encoder ckpt_path=<matcha ckpt> \
          [overrides...]
(reference: matcha/train_style_encoder.py + configs/train_style_encoder.yaml)
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import numpy as np
import optax

from matcha_tpu.data.collate import epoch_batches
from matcha_tpu.data.dataset import TextMelDataset
from matcha_tpu.data.sampler import BucketedBatchSampler
from matcha_tpu.models.style_encoder import init_style_params, style_encoder_loss
from matcha_tpu.train.checkpoint import load_checkpoint
from matcha_tpu.utils.configs import compose


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--config",
        default=str(Path(__file__).resolve().parent.parent / "configs" / "train.yaml"),
    )
    parser.add_argument("--max_epochs", type=int, default=50)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    cfg = compose(args.config, args.overrides)
    ckpt_path = cfg.get("ckpt_path")
    if not ckpt_path:
        raise SystemExit("train_style_encoder requires ckpt_path=<matcha ckpt>")

    tree, matcha_cfg = load_checkpoint(ckpt_path)
    matcha_params = jax.tree.map(jax.numpy.asarray, tree["params"])

    data = cfg["data"]
    ds = TextMelDataset(data["train_filelist_path"], data["mel_dir"])
    sampler = BucketedBatchSampler(
        [ds.mel_length(i) for i in range(len(ds))],
        max_frames_per_batch=int(data.get("max_frames_per_batch", 32000)),
        len_bucket=int(data.get("len_bucket", 32)),
        seed=int(cfg.get("seed", 1234)),
    )

    style_params = init_style_params(matcha_cfg, jax.random.PRNGKey(0))
    tx = optax.chain(optax.clip_by_global_norm(4.0), optax.adamw(args.lr))
    opt_state = tx.init(style_params)

    @jax.jit
    def step(style_params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: style_encoder_loss(p, matcha_params, matcha_cfg, batch),
            has_aux=True,
        )(style_params)
        updates, opt_state = tx.update(grads, opt_state, style_params)
        return optax.apply_updates(style_params, updates), opt_state, loss, metrics

    out_dir = Path(cfg.get("paths", {}).get("output_dir", "logs/style_encoder"))
    out_dir.mkdir(parents=True, exist_ok=True)
    log = open(out_dir / "metrics.jsonl", "a")
    for epoch in range(args.max_epochs):
        losses = []
        for batch in epoch_batches(ds, sampler, epoch, int(data.get("text_bucket", 32))):
            style_params, opt_state, loss, metrics = step(
                style_params, opt_state, batch
            )
            losses.append(float(loss))
        rec = {"epoch": epoch, "loss": float(np.mean(losses)), "time": time.time()}
        log.write(json.dumps(rec) + "\n")
        log.flush()
        print(f"epoch {epoch}: loss {rec['loss']:.4f}")
        import pickle

        with open(out_dir / "style_params.pkl", "wb") as f:
            pickle.dump(jax.tree.map(np.asarray, style_params), f)


if __name__ == "__main__":
    main()

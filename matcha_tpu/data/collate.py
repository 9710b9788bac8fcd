"""Batch assembly: dataset items → padded, bucketed Batch arrays.

Pads phoneme IDs / coarse mel / fine mel to the bucket shapes chosen by the
sampler (reference collate: matcha/data/text_mel_datamodule.py:469-518 pads
to the batch max; here the pad target is the bucket so shapes are static).
The fine mel is exactly 2x the coarse length, preserving the reference's
``y_fine = 2*y`` contract.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

from matcha_tpu.data.dataset import TextMelDataset
from matcha_tpu.data.sampler import BucketPlan, round_up
from matcha_tpu.train.step import Batch


def collate(
    dataset: TextMelDataset,
    plan: BucketPlan,
    text_bucket: int = 32,
    use_native: bool | None = None,
) -> Batch:
    """Assemble one padded batch.  ``use_native=None`` auto-detects the C++
    loader (native/libmatcha_native.so) and falls back to numpy."""
    from matcha_tpu.data import native_loader

    if use_native is None:
        use_native = native_loader.available()

    b = plan.batch_size
    ty = plan.mel_len
    utts = [dataset.utterance(i) for i in plan.indices]
    tx = round_up(max(len(u.phoneme_ids) for u in utts), text_bucket)

    # repeat-filled tail rows get loss weight 0 so under-full buckets are
    # exactly gradient-neutral (the losses normalize by weighted counts)
    n_real = plan.n_real if plan.n_real >= 0 else b
    weights = np.zeros((b,), np.float32)
    weights[:n_real] = 1.0

    x = np.zeros((b, tx), np.int32)
    x_lengths = np.zeros((b,), np.int32)
    spks = np.zeros((b,), np.int32)
    for k, u in enumerate(utts):
        n = len(u.phoneme_ids)
        x[k, :n] = u.phoneme_ids
        x_lengths[k] = n
        spks[k] = u.speaker

    if use_native:
        coarse_paths = [dataset.mel_paths(i)[0] for i in plan.indices]
        fine_paths = [dataset.mel_paths(i)[1] for i in plan.indices]
        n_feats = dataset.n_feats
        y, y_lengths = native_loader.fill_batch(coarse_paths, ty, n_feats)
        y_fine, y_fine_lengths = native_loader.fill_batch(
            fine_paths, 2 * ty, n_feats
        )
        return Batch(
            x,
            x_lengths,
            y,
            y_lengths.astype(np.int32),
            y_fine,
            y_fine_lengths.astype(np.int32),
            spks,
            weights,
        )

    items = [dataset[i] for i in plan.indices]
    n_feats = items[0]["y"].shape[1]
    y = np.zeros((b, ty, n_feats), np.float32)
    y_lengths = np.zeros((b,), np.int32)
    y_fine = np.zeros((b, 2 * ty, n_feats), np.float32)
    y_fine_lengths = np.zeros((b,), np.int32)
    for k, it in enumerate(items):
        ny = min(it["y"].shape[0], ty)
        y[k, :ny] = it["y"][:ny]
        y_lengths[k] = ny
        nf = min(it["y_fine"].shape[0], 2 * ty)
        y_fine[k, :nf] = it["y_fine"][:nf]
        y_fine_lengths[k] = nf

    return Batch(x, x_lengths, y, y_lengths, y_fine, y_fine_lengths, spks, weights)


def prefetch(iterator: Iterator, depth: int = 2) -> Iterator:
    """Threaded host-side prefetch so collation overlaps device compute."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()

    error: list[BaseException] = []

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as exc:  # propagate to the consumer
            error.append(exc)
        finally:
            q.put(sentinel)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            if error:
                raise error[0]
            return
        yield item


def epoch_batches(
    dataset: TextMelDataset,
    sampler,
    epoch: int,
    text_bucket: int = 32,
    prefetch_depth: int = 2,
) -> Iterator[Batch]:
    plans = sampler.create_batches(epoch)
    gen = (collate(dataset, p, text_bucket) for p in plans)
    yield from prefetch(gen, prefetch_depth)

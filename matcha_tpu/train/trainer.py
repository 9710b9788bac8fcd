"""Training loop: epochs over bucketed batches, validation, checkpoints.

Replaces the reference's Lightning Trainer + BaseLightningClass
(reference: matcha/train.py, matcha/models/baselightningmodule.py) with a
plain loop around the jitted DP train step:

  * sampler re-seeded per epoch (fresh jittered packing, stable batch count)
  * validation every N epochs with the same loss pipeline
  * checkpoints every N epochs, keep-last-K, with full optimizer state
  * metrics to TensorBoard (if available) + JSONL (always)
  * duration/prior abs-error quantile diagnostics at batch 0 of each epoch,
    used to tune the Huber thresholds (reference: matcha_tts.py:166-182)
"""

from __future__ import annotations

import json
import shutil
import time
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tpu.data.datamodule import TextMelDataModule
from matcha_tpu.data.dataset import TextMelDataset
from matcha_tpu.models.config import MatchaConfig
from matcha_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from matcha_tpu.train.checkpoint import (
    expand_speaker_tables,
    load_checkpoint,
    save_checkpoint,
)
from matcha_tpu.train.optim import OptimizerConfig, build_optimizer
from matcha_tpu.train.step import TrainState, init_train_state, make_train_step


@dataclass
class TrainerConfig:
    output_dir: str = "logs/train/run"
    max_epochs: int = -1
    check_val_every_n_epoch: int = 5
    checkpoint_every_n_epochs: int = 5
    keep_last_checkpoints: int = 10
    log_every_n_steps: int = 10
    seed: int = 1234
    use_mesh: bool = True
    # model-axis size of a 2-D (data, model) mesh; 1 = pure DP.  TP is for
    # width-scaled variants — at reference widths DP is the right choice
    # (see parallel/sharding.py).
    tensor_parallel: int = 1


class MetricLogger:
    """TensorBoard (optional) + JSONL metrics sink."""

    def __init__(self, out_dir: Path):
        out_dir.mkdir(parents=True, exist_ok=True)
        self.jsonl = open(out_dir / "metrics.jsonl", "a")
        self.tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(log_dir=str(out_dir / "tb"))
        except Exception:
            pass

    def log(self, step: int, metrics: dict):
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(k, float(v), step)

    def close(self):
        if not self.jsonl.closed:
            self.jsonl.close()
        if self.tb is not None:
            self.tb.close()
            self.tb = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class Trainer:
    def __init__(
        self,
        model_cfg: MatchaConfig,
        opt_cfg: OptimizerConfig,
        trainer_cfg: TrainerConfig,
        train_dataset: TextMelDataset,
        valid_dataset: TextMelDataset | None = None,
        max_frames_per_batch: int = 32000,
        len_bucket: int = 32,
        text_bucket: int = 32,
        trainable_mask=None,
    ):
        self.model_cfg = model_cfg
        self.opt_cfg = opt_cfg
        self.cfg = trainer_cfg

        try:  # persistent compilation cache across runs
            jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        except Exception:
            pass
        if not trainer_cfg.use_mesh:
            self.mesh = None
        elif trainer_cfg.tensor_parallel > 1:
            from matcha_tpu.parallel.sharding import make_mesh_2d

            self.mesh = make_mesh_2d(tp=trainer_cfg.tensor_parallel)
        else:
            self.mesh = make_mesh()
        if self.mesh is not None and model_cfg.mas_backend == "auto":
            # a bare pallas_call inside the GSPMD-sharded step has no batch
            # partitioning rule, so meshes route MAS through shard_map: the
            # kernel sees per-device local batches (ops/mas_pallas.py).  On
            # TPU that is the compiled Mosaic kernel — the same default the
            # reference effectively has (its Triton kernel runs in EVERY
            # training step, matcha_tts.py:199).  Non-TPU meshes (hermetic
            # CPU tests) keep the portable scan.
            import dataclasses as _dc

            backend = (
                "pallas_shard_map"
                if jax.default_backend() == "tpu"
                else "scan"
            )
            self.model_cfg = model_cfg = _dc.replace(
                model_cfg, mas_backend=backend
            )
        if self.mesh is not None and model_cfg.mas_backend == "pallas_shard_map":
            from matcha_tpu.ops.mas import set_mas_shard_mesh

            set_mas_shard_mesh(self.mesh)
        # DP requires every batch divisible by the data-axis size (the
        # model axis of a TP mesh replicates the batch, not splits it)
        from matcha_tpu.parallel.mesh import DATA_AXIS as _DATA

        batch_multiple = self.mesh.shape[_DATA] if self.mesh else 1

        self.dm = TextMelDataModule(
            train_dataset,
            valid_dataset,
            max_frames_per_batch=max_frames_per_batch,
            len_bucket=len_bucket,
            text_bucket=text_bucket,
            batch_multiple=batch_multiple,
            seed=trainer_cfg.seed,
        )
        self.trainable_mask = trainable_mask
        self.tx = build_optimizer(opt_cfg, trainable_mask=trainable_mask)
        self.param_specs = None
        state_sharding = None
        if self.mesh is not None and trainer_cfg.tensor_parallel > 1:
            # derive per-leaf TP shardings from the ABSTRACT state (shapes
            # only — no arrays initialized twice)
            from matcha_tpu.parallel.sharding import (
                state_shardings,
                tp_param_specs,
            )

            state_shape = jax.eval_shape(
                lambda: init_train_state(
                    model_cfg, self.tx, jax.random.PRNGKey(0)
                )
            )
            self.param_specs = tp_param_specs(
                state_shape.params, trainer_cfg.tensor_parallel
            )
            state_sharding = state_shardings(
                self.mesh, self.param_specs, state_shape
            )
        self.train_step, self.eval_step = make_train_step(
            model_cfg, self.tx, mesh=self.mesh, state_sharding=state_sharding
        )
        self.logger = MetricLogger(Path(trainer_cfg.output_dir))
        self.out_dir = Path(trainer_cfg.output_dir)

    # ------------------------------------------------------------------

    def set_datasets(self, train_dataset, valid_dataset=None):
        """Swap datasets (e.g. speaker-filtered) and rebuild the samplers."""
        self.dm = self.dm.replace_datasets(train_dataset, valid_dataset)

    # compatibility aliases onto the data module's internals
    @property
    def train_ds(self):
        return self.dm.train_ds

    @property
    def valid_ds(self):
        return self.dm.valid_ds

    @property
    def sampler(self):
        return self.dm.train_sampler

    @property
    def valid_sampler(self):
        return self.dm.valid_sampler

    def init_state(self, resume_from: str | None = None) -> TrainState:
        """Fresh or resumed train state, with the reference's load hooks:

        * learning rate / weight decay always come from THIS run's config —
          optax keeps them in the transformation, not in the checkpoint, so a
          resume with a new lr trains at the new lr (the reference overrides
          its checkpointed param_groups to get the same effect,
          baselightningmodule.py:89-97; tested in tests/test_trainer_e2e.py)
        * speaker-table auto-expansion: resuming a checkpoint trained with
          fewer speakers than cfg.n_spks zero-extends both embedding tables
          AND their Adam moment rows (reference: baselightningmodule.py:99-131)
        * fine-tune resumes (a trainable_mask is set) load PARAMS only and
          start the masked optimizer fresh: the full-training checkpoint's
          optimizer tree does not match the masked transformation (the
          reference remaps optimizer state to the 2-param setup the same
          way, finetune_speaker.py:75-99)
        """
        state = init_train_state(
            self.model_cfg, self.tx, jax.random.PRNGKey(self.cfg.seed)
        )
        if resume_from and self.trainable_mask is not None:
            # flax params are plain nested dicts — no template needed; the
            # checkpoint's (unmasked) optimizer tree is discarded
            tree, _ = load_checkpoint(resume_from)
            params = jax.tree.map(jnp.asarray, tree["params"])
            return TrainState(
                params=params,
                opt_state=self.tx.init(params),
                step=state.step,
            )
        if resume_from:
            import dataclasses

            ckpt_cfg = MatchaConfig.from_dict(
                json.loads((Path(resume_from) / "config.json").read_text())
            )
            ckpt_n_spks = ckpt_cfg.n_spks
            if ckpt_n_spks > self.model_cfg.n_spks:
                raise ValueError(
                    f"checkpoint has {ckpt_n_spks} speakers but config asks "
                    f"for {self.model_cfg.n_spks}; shrinking is not supported"
                )
            # restore with a structure template matching the CHECKPOINT's
            # speaker count so the optax NamedTuple containers (and table
            # shapes) survive the round-trip
            if ckpt_n_spks < self.model_cfg.n_spks:
                small_cfg = dataclasses.replace(self.model_cfg, n_spks=ckpt_n_spks)
                tmpl_state = init_train_state(
                    small_cfg, self.tx, jax.random.PRNGKey(self.cfg.seed)
                )
            else:
                small_cfg, tmpl_state = self.model_cfg, state
            template = {
                "params": tmpl_state.params,
                "opt_state": tmpl_state.opt_state,
                "step": 0,
                "epoch": 0,
            }
            tree, _ = load_checkpoint(resume_from, target=template)
            if ckpt_n_spks < self.model_cfg.n_spks:
                tree, _ = expand_speaker_tables(
                    tree, small_cfg, self.model_cfg.n_spks
                )
                print(
                    f"expanded speaker tables {ckpt_n_spks} → "
                    f"{self.model_cfg.n_spks} on resume"
                )
            state = TrainState(
                params=tree["params"],
                opt_state=tree["opt_state"],
                step=jax.numpy.asarray(tree["step"], jax.numpy.int32),
            )
        if self.mesh is not None:
            if self.param_specs is not None:
                from matcha_tpu.parallel.sharding import shard_pytree

                state = shard_pytree(self.mesh, self.param_specs, state)
            else:
                state = replicate(self.mesh, state)
        return state

    def _put(self, batch):
        if self.mesh is not None:
            return shard_batch(self.mesh, batch)
        return batch

    def _prefetch(self, gen, depth: int = 2):
        '''Overlap host-side collate + H2D transfer with device compute.

        A producer thread runs ``_put`` ``depth`` batches ahead while the
        main thread dispatches training steps (the reference gets the same
        overlap from DataLoader workers + pin_memory,
        text_mel_datamodule.py).  Worker exceptions re-raise in the
        consumer.
        '''
        import queue as _queue
        import threading as _threading

        q: _queue.Queue = _queue.Queue(maxsize=depth)
        done = object()
        stop = _threading.Event()

        def _put_or_stop(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except _queue.Full:
                    continue
            return False

        def worker():
            try:
                for b in gen:
                    if not _put_or_stop(self._put(b)):
                        return  # consumer abandoned the generator
                _put_or_stop(done)
            except BaseException as exc:  # propagate into the train loop
                _put_or_stop(exc)

        _threading.Thread(target=worker, daemon=True).start()
        try:
            while True:
                item = q.get()
                if item is done:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # consumer broke out early (max_steps, exception, GeneratorExit):
            # release the producer and drop any staged device batches
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except _queue.Empty:
                pass

    def fit(self, resume_from: str | None = None, max_steps: int | None = None):
        state = self.init_state(resume_from)
        n_params = sum(
            int(np.prod(np.asarray(l).shape))
            for l in jax.tree_util.tree_leaves(state.params)
        )
        self.logger.log(int(state.step), {"model/params_total": n_params})
        print(f"model parameters: {n_params/1e6:.2f} M")
        rng = jax.random.PRNGKey(self.cfg.seed)
        epoch = 0
        done = False
        last_saved = None  # epoch of the most recent checkpoint, if any
        host_step = int(state.step)  # one sync at start, then host-tracked
        while not done and (self.cfg.max_epochs < 0 or epoch < self.cfg.max_epochs):
            t_epoch = time.time()
            losses = []
            for dev_batch in self._prefetch(self.dm.train_batches(epoch)):
                state, metrics = self.train_step(state, dev_batch, rng)
                # track the step host-side: int(state.step) would block on
                # the just-dispatched step every iteration, serializing the
                # pipeline exactly like the per-step loss pull did
                host_step += 1
                losses.append(metrics["loss"])  # device scalar, pulled later
                if host_step % self.cfg.log_every_n_steps == 0:
                    self.logger.log(host_step, metrics)
                if max_steps is not None and host_step >= max_steps:
                    done = True
                    break
            self.logger.log(
                int(state.step),
                {
                    # stack on device and pull ONCE: per-element np.asarray
                    # would be one D2H tunnel round trip per training step
                    # (dev-notes' Orbax pathology, at every epoch boundary)
                    "loss/train_epoch": float(
                        np.asarray(jnp.mean(jnp.stack(losses)))
                    )
                    if losses
                    else 0.0,
                    "epoch": epoch,
                    "epoch_seconds": time.time() - t_epoch,
                },
            )

            if (
                self.dm.has_valid
                and (epoch + 1) % self.cfg.check_val_every_n_epoch == 0
            ):
                self.validate(state, epoch, rng)

            if (epoch + 1) % self.cfg.checkpoint_every_n_epochs == 0 or done:
                self.save(state, epoch)
                last_saved = epoch
            epoch += 1
        # final save exactly once: skip when the loop's last epoch was
        # already checkpointed (the old modulo test re-saved when ``done``
        # fired off a checkpoint boundary)
        if epoch > 0 and last_saved != epoch - 1:
            self.save(state, epoch - 1)
        return state

    def validate(self, state: TrainState, epoch: int, rng):
        vals = []
        for i, batch in enumerate(self.dm.valid_batches()):
            # fold the batch index so CFM's sampled (t, noise) differ per
            # batch — a constant key would correlate the val-loss estimator
            m = self.eval_step(state.params, self._put(batch), jax.random.fold_in(rng, i))
            vals.append(float(np.asarray(m["loss"])))
        self.logger.log(
            int(state.step),
            {"loss/val": float(np.mean(vals)) if vals else 0.0, "epoch": epoch},
        )

    def close(self):
        """Release the metrics sinks (JSONL handle, TensorBoard writer)."""
        self.logger.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def save(self, state: TrainState, epoch: int):
        params, opt_state = state.params, state.opt_state
        tree = {
            "params": jax.tree.map(np.asarray, params),
            "opt_state": jax.tree.map(np.asarray, opt_state),
            "step": int(state.step),
            "epoch": epoch,
        }
        path = self.out_dir / "checkpoints" / f"epoch_{epoch:05d}"
        save_checkpoint(path, tree, self.model_cfg)
        self._prune_checkpoints()

    def _prune_checkpoints(self):
        ckpt_dir = self.out_dir / "checkpoints"
        if not ckpt_dir.exists():
            return
        all_ckpts = sorted(ckpt_dir.glob("epoch_*"))
        for stale in all_ckpts[: -self.cfg.keep_last_checkpoints]:
            shutil.rmtree(stale, ignore_errors=True)

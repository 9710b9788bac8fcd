"""Data-pipeline tests with a synthetic corpus fixture.

Ports the reference's 14 sampler invariants (tests/test_dynamic_batch_sampler.py)
to the bucketed design, replacing its hard-coded local corpus path with a
hermetic generated fixture (SURVEY.md §4 calls this out explicitly).
"""

import numpy as np
import pytest

from matcha_tpu.data.collate import collate, epoch_batches
from matcha_tpu.data.dataset import TextMelDataset
from matcha_tpu.data.sampler import BucketedBatchSampler

N_FEATS = 8


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    mel_dir = root / "mels"
    rng = np.random.default_rng(0)
    rows = []
    for i in range(40):
        rel = f"spk{i % 3}/utt{i:03d}"
        frames = int(rng.integers(20, 200))
        (mel_dir / f"spk{i % 3}").mkdir(parents=True, exist_ok=True)
        # channel-major on disk, like the reference cache
        np.save(mel_dir / f"{rel}.npy", rng.standard_normal((N_FEATS, frames)).astype(np.float32))
        np.save(
            mel_dir / f"{rel}.fine.npy",
            rng.standard_normal((N_FEATS, 2 * frames)).astype(np.float32),
        )
        ids = " ".join(str(int(v)) for v in rng.integers(0, 600, rng.integers(5, 30)))
        rows.append(f"{rel}|{i % 3}|en-us|hello world|{ids}")
    (mel_dir / "metadata.json").write_text('{"n_mels": %d}' % N_FEATS)
    filelist = root / "train.csv"
    filelist.write_text("\n".join(rows))
    return filelist, mel_dir


class TestDataset:
    def test_len_and_item(self, corpus):
        filelist, mel_dir = corpus
        ds = TextMelDataset(filelist, mel_dir)
        assert len(ds) == 40
        item = ds[0]
        assert item["y"].shape[1] == N_FEATS  # time-major after load
        assert item["y_fine"].shape[0] == 2 * item["y"].shape[0]
        assert item["x"].dtype == np.int32

    def test_header_length_matches_data(self, corpus):
        filelist, mel_dir = corpus
        ds = TextMelDataset(filelist, mel_dir)
        for i in (0, 7, 13):
            assert ds.mel_length(i) == ds[i]["y"].shape[0]

    def test_filter_speaker(self, corpus):
        filelist, mel_dir = corpus
        ds = TextMelDataset(filelist, mel_dir)
        sub = ds.filter_speaker(1)
        assert len(sub) > 0
        assert all(int(r[1]) == 1 for r in sub.rows)


class TestSampler:
    LENGTHS = None

    def _sampler(self, corpus, **kw):
        filelist, mel_dir = corpus
        ds = TextMelDataset(filelist, mel_dir)
        lengths = [ds.mel_length(i) for i in range(len(ds))]
        kw.setdefault("max_frames_per_batch", 2048)
        kw.setdefault("len_bucket", 32)
        return ds, BucketedBatchSampler(lengths, **kw)

    def test_coverage_no_missing(self, corpus):
        ds, sampler = self._sampler(corpus, stable_batch_count=False)
        plans = sampler.create_batches(0)
        seen = set()
        for p in plans:
            seen.update(p.indices)
        assert seen == set(range(len(ds)))

    def test_frame_budget_respected(self, corpus):
        ds, sampler = self._sampler(corpus)
        for p in sampler.create_batches(0):
            assert p.mel_len * p.batch_size <= 2048
            assert len(p.indices) == p.batch_size

    def test_bucketed_shapes_only(self, corpus):
        ds, sampler = self._sampler(corpus)
        shape_set = sampler.shape_set()
        for epoch in range(3):
            for p in sampler.create_batches(epoch):
                assert p.mel_len % 32 == 0
                assert (p.batch_size, p.mel_len) in shape_set

    def test_stable_batch_count_across_epochs(self, corpus):
        ds, sampler = self._sampler(corpus)
        counts = {len(sampler.create_batches(e)) for e in range(5)}
        assert len(counts) == 1

    def test_deterministic_given_seed(self, corpus):
        ds, s1 = self._sampler(corpus, seed=7)
        _, s2 = self._sampler(corpus, seed=7)
        p1 = [(p.mel_len, tuple(p.indices)) for p in s1.create_batches(2)]
        p2 = [(p.mel_len, tuple(p.indices)) for p in s2.create_batches(2)]
        assert p1 == p2

    def test_jitter_varies_epochs(self, corpus):
        ds, sampler = self._sampler(corpus)
        a = [tuple(p.indices) for p in sampler.create_batches(0)]
        b = [tuple(p.indices) for p in sampler.create_batches(1)]
        assert a != b

    def test_padded_lengths_fit(self, corpus):
        ds, sampler = self._sampler(corpus)
        for p in sampler.create_batches(0):
            for i in p.indices:
                assert ds.mel_length(i) <= p.mel_len


class TestCollate:
    def test_batch_shapes(self, corpus):
        ds, sampler = TestSampler()._sampler(corpus)
        plan = sampler.create_batches(0)[0]
        batch = collate(ds, plan, text_bucket=16)
        b, ty = plan.batch_size, plan.mel_len
        assert batch.y.shape == (b, ty, N_FEATS)
        assert batch.y_fine.shape == (b, 2 * ty, N_FEATS)
        assert batch.x.shape[0] == b and batch.x.shape[1] % 16 == 0
        assert (batch.y_lengths <= ty).all()
        assert (batch.y_fine_lengths <= 2 * ty).all()
        # padding regions are zero
        k = int(np.argmin(batch.y_lengths))
        assert np.all(batch.y[k, batch.y_lengths[k]:] == 0)

    def test_epoch_iterator(self, corpus):
        ds, sampler = TestSampler()._sampler(corpus)
        batches = list(epoch_batches(ds, sampler, epoch=0, text_bucket=16))
        assert len(batches) == len(sampler.create_batches(0))


class TestRepeatFillWeights:
    """Under-full buckets: fill rows are marked and weighted out of the loss
    (the reference never duplicates samples, text_mel_datamodule.py:111-133;
    here duplicates exist only as shape padding with loss weight 0)."""

    def test_n_real_marks_genuine_prefix(self, corpus):
        filelist, mel_dir = corpus
        ds = TextMelDataset(filelist, mel_dir)
        # 2-utterance corpus slice + batch_multiple=8 forces repeat fill
        lengths = [ds.mel_length(0), ds.mel_length(1)]
        sampler = BucketedBatchSampler(
            lengths, max_frames_per_batch=4000, len_bucket=32, batch_multiple=8
        )
        plans = sampler.create_batches(0)
        for plan in plans:
            assert plan.batch_size % 8 == 0
            assert 1 <= plan.n_real <= 2
            # fill rows are repeats of the genuine prefix
            real = plan.indices[: plan.n_real]
            assert all(i in real for i in plan.indices[plan.n_real:])

    def test_collate_emits_zero_weights_for_fill(self, corpus):
        filelist, mel_dir = corpus
        ds = TextMelDataset(filelist, mel_dir)
        lengths = [ds.mel_length(0), ds.mel_length(1)]
        sampler = BucketedBatchSampler(
            lengths, max_frames_per_batch=4000, len_bucket=32, batch_multiple=8
        )
        plan = sampler.create_batches(0)[0]
        batch = collate(ds, plan, text_bucket=16)
        assert batch.weights.shape == (plan.batch_size,)
        np.testing.assert_array_equal(batch.weights[: plan.n_real], 1.0)
        np.testing.assert_array_equal(batch.weights[plan.n_real:], 0.0)

    def test_full_batches_all_ones(self, corpus):
        ds, sampler = TestSampler()._sampler(corpus)
        for plan in sampler.create_batches(0):
            batch = collate(ds, plan, text_bucket=16)
            assert batch.weights[: plan.n_real].min() == 1.0


class TestDataModule:
    """Standalone facade over datasets + samplers + iterators (reference
    TextMelDataModule, text_mel_datamodule.py:260-352)."""

    def _dm(self, corpus, **kw):
        from matcha_tpu.data.datamodule import TextMelDataModule

        filelist, mel_dir = corpus
        kw.setdefault("max_frames_per_batch", 2048)
        kw.setdefault("text_bucket", 16)
        return TextMelDataModule.from_files(
            filelist, mel_dir, valid_filelist_path=filelist, **kw
        )

    def test_from_files_builds_both_splits(self, corpus):
        dm = self._dm(corpus)
        assert dm.has_valid
        assert len(dm.train_ds) == 40 and len(dm.valid_ds) == 40

    def test_train_batches_match_sampler_plan(self, corpus):
        dm = self._dm(corpus)
        batches = list(dm.train_batches(0))
        assert len(batches) == len(dm.train_sampler.create_batches(0))

    def test_valid_batches_deterministic(self, corpus):
        dm = self._dm(corpus)
        a = [b.x.shape for b in dm.valid_batches()]
        b = [b.x.shape for b in dm.valid_batches()]
        assert a == b and len(a) > 0

    def test_missing_valid_filelist_is_train_only(self, corpus):
        from matcha_tpu.data.datamodule import TextMelDataModule

        filelist, mel_dir = corpus
        dm = TextMelDataModule.from_files(
            filelist, mel_dir, valid_filelist_path=None,
            max_frames_per_batch=2048,
        )
        assert not dm.has_valid
        assert list(dm.valid_batches()) == []

    def test_replace_datasets_keeps_knobs(self, corpus):
        dm = self._dm(corpus, batch_multiple=4, seed=7)
        sub = dm.train_ds.filter_speaker(1)
        dm2 = dm.replace_datasets(sub, None)
        assert dm2.batch_multiple == 4 and dm2.seed == 7
        assert dm2.train_sampler.batch_multiple == 4
        assert len(dm2.train_ds) == len(sub) and not dm2.has_valid

    def test_shape_set_covers_emitted_batches(self, corpus):
        dm = self._dm(corpus)
        shapes = dm.shape_set()
        for b in dm.train_batches(0):
            assert (b.y.shape[0], b.y.shape[1]) in shapes
        for b in dm.valid_batches():
            assert (b.y.shape[0], b.y.shape[1]) in shapes

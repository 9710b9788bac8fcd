"""Native C++ batch loader parity vs the numpy path."""

import numpy as np
import pytest

from matcha_tpu.data import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native loader not built (make -C native)"
)


@pytest.fixture(scope="module")
def caches(tmp_path_factory):
    root = tmp_path_factory.mktemp("npy")
    rng = np.random.default_rng(0)
    paths, arrays = [], []
    for i, frames in enumerate([10, 37, 64]):
        a = rng.standard_normal((8, frames)).astype(np.float32)  # channel-major
        p = root / f"m{i}.npy"
        np.save(p, a)
        paths.append(p)
        arrays.append(a)
    return paths, arrays


class TestMelLength:
    def test_header_only_length(self, caches):
        paths, arrays = caches
        for p, a in zip(paths, arrays):
            assert native_loader.mel_length(p) == a.shape[1]

    def test_missing_file_raises(self, tmp_path):
        with pytest.raises(IOError):
            native_loader.mel_length(tmp_path / "nope.npy")


class TestFillBatch:
    def test_matches_numpy_transpose(self, caches):
        paths, arrays = caches
        t_pad = 70
        batch, lens = native_loader.fill_batch(paths, t_pad, 8)
        assert batch.shape == (3, t_pad, 8)
        for k, a in enumerate(arrays):
            t = a.shape[1]
            assert lens[k] == t
            np.testing.assert_array_equal(batch[k, :t], a.T)
            np.testing.assert_array_equal(batch[k, t:], 0.0)

    def test_fortran_order_cache(self, tmp_path):
        # np.save of a transposed view writes Fortran order; the loader must
        # read it as time-major directly (regression: smoke-train failure)
        rng = np.random.default_rng(3)
        a = rng.standard_normal((8, 21)).astype(np.float32)  # (n_mels, T)
        p = tmp_path / "f.npy"
        np.save(p, np.asarray(a.T.T, order="F"))
        assert native_loader.mel_length(p) == 21
        batch, lens = native_loader.fill_batch([p], 30, 8)
        assert lens[0] == 21
        np.testing.assert_array_equal(batch[0, :21], a.T)

    def test_truncates_to_pad(self, caches):
        paths, arrays = caches
        batch, lens = native_loader.fill_batch(paths, 20, 8)
        assert lens[2] == 20  # 64-frame item clipped
        np.testing.assert_array_equal(batch[2], arrays[2].T[:20])

    def test_collate_native_matches_python(self, tmp_path):
        from matcha_tpu.data.collate import collate
        from matcha_tpu.data.dataset import TextMelDataset
        from matcha_tpu.data.sampler import BucketedBatchSampler

        rng = np.random.default_rng(1)
        mel_dir = tmp_path / "mels"
        rows = []
        for i in range(6):
            rel = f"s/u{i}"
            frames = int(rng.integers(16, 60))
            (mel_dir / "s").mkdir(parents=True, exist_ok=True)
            np.save(mel_dir / f"{rel}.npy", rng.standard_normal((8, frames)).astype(np.float32))
            np.save(mel_dir / f"{rel}.fine.npy", rng.standard_normal((8, 2 * frames)).astype(np.float32))
            ids = " ".join(str(v) for v in rng.integers(0, 600, 12))
            rows.append(f"{rel}|0|en-us|text|{ids}")
        (mel_dir / "metadata.json").write_text('{"n_mels": 8}')
        filelist = tmp_path / "fl.csv"
        filelist.write_text("\n".join(rows))
        ds = TextMelDataset(filelist, mel_dir)
        sampler = BucketedBatchSampler(
            [ds.mel_length(i) for i in range(len(ds))],
            max_frames_per_batch=512,
            len_bucket=16,
        )
        plan = sampler.create_batches(0)[0]
        nat = collate(ds, plan, use_native=True)
        py = collate(ds, plan, use_native=False)
        for a, b in zip(nat, py):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

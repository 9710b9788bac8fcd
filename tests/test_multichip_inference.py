"""Multi-chip inference fan-out over the 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from matcha_tpu.inference import MatchaSynthesizer
from matcha_tpu.models.config import tiny_config
from matcha_tpu.models.matcha import init_params
from matcha_tpu.parallel.mesh import make_mesh
from matcha_tpu.vocoder.vocos import VocosConfig, init_vocos_params

CFG = tiny_config()
VCFG = VocosConfig(input_channels=CFG.n_feats, dim=32, intermediate_dim=64, num_layers=1)


@pytest.fixture(scope="module")
def synths():
    params = init_params(CFG, jax.random.PRNGKey(0))
    vocos_params = init_vocos_params(jax.random.PRNGKey(1), VCFG)
    kw = dict(text_buckets=(16, 32), mel_fine_buckets=(64, 128, 256))
    single = MatchaSynthesizer(CFG, params, vocos_params, VCFG, **kw)
    mesh = make_mesh(jax.devices()[:8])
    fanout = MatchaSynthesizer(CFG, params, vocos_params, VCFG, mesh=mesh, **kw)
    return single, fanout


class TestMeshFanout:
    def test_batch_matches_single_chip(self, synths):
        single, fanout = synths
        rng = np.random.default_rng(0)
        id_lists = [list(rng.integers(0, 600, n)) for n in (6, 9, 12, 7)]
        speakers = [0, 1, 2, 3]
        r_single = single.synthesise_batch(id_lists, speakers, n_timesteps=2)
        r_fanout = fanout.synthesise_batch(id_lists, speakers, n_timesteps=2)
        assert len(r_fanout) == 4
        for a, b in zip(r_single, r_fanout):
            assert a.wav.shape == b.wav.shape
            np.testing.assert_allclose(a.wav, b.wav, atol=1e-4)

    def test_non_multiple_batch_padding(self, synths):
        _, fanout = synths
        rng = np.random.default_rng(1)
        # 3 requests on an 8-device mesh: padded internally to 8
        id_lists = [list(rng.integers(0, 600, 8)) for _ in range(3)]
        results = fanout.synthesise_batch(id_lists, [0, 1, 2], n_timesteps=2)
        assert len(results) == 3
        assert all(np.isfinite(r.wav).all() for r in results)

"""Multi-chip inference fan-out over the 8-device CPU mesh."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from matcha_tpu.inference import MatchaSynthesizer
from matcha_tpu.models.config import tiny_config
from matcha_tpu.models.matcha import init_params
from matcha_tpu.parallel.mesh import make_mesh
from matcha_tpu.vocoder.vocos import VocosConfig, init_vocos_params

ON_TPU = os.environ.get("MATCHA_TESTS_TPU") == "1"

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

    def test_single_request_matches_single_chip(self, synths):
        """synthesise_ids on a meshed synthesizer pads the request to one
        sample per device (a 1-row shard over 8 chips cannot exist) and must
        return the same audio as the unmeshed path."""
        single, fanout = synths
        ids = list(np.random.default_rng(2).integers(0, 600, 10))
        a = single.synthesise_ids(ids, speaker=1, n_timesteps=2)
        b = fanout.synthesise_ids(ids, speaker=1, n_timesteps=2)
        assert a.wav.shape == b.wav.shape
        np.testing.assert_allclose(a.wav, b.wav, atol=1e-4)

    def test_fused_batch_matches_single_chip(self, synths):
        """The single-dispatch fused program under the mesh (shard_map) must
        match the unmeshed fused path, including the seeded ODE noise rows."""
        single, fanout = synths
        rng = np.random.default_rng(3)
        id_lists = [list(rng.integers(0, 600, n)) for n in (6, 9, 12, 7)]
        speakers = [0, 1, 2, 3]
        r_single = single.synthesise_batch(
            id_lists, speakers, n_timesteps=2, fused=True
        )
        r_fanout = fanout.synthesise_batch(
            id_lists, speakers, n_timesteps=2, fused=True
        )
        for a, b in zip(r_single, r_fanout):
            assert a.wav.shape == b.wav.shape
            np.testing.assert_allclose(a.wav, b.wav, atol=1e-4)

    @pytest.mark.skipif(not ON_TPU, reason="compiled flash tier runs on TPU")
    def test_meshed_long_bucket_uses_flash_on_tpu(self):
        """Stage B under a 1-device TPU mesh at a flash-eligible bucket
        (coarse 1024, head dim 64): the shard_map serving program must
        compile WITH the Pallas flash kernel inside and produce finite
        output.  This is the executable the fan-out mesh serves long
        utterances with."""
        from matcha_tpu.ops.attention import resolve_backend

        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg, decoder=dataclasses.replace(cfg.decoder, attention_head_dim=64)
        )
        assert resolve_backend("auto", (1, cfg.decoder.num_heads, 1024, 64)) == "flash"
        params = init_params(cfg, jax.random.PRNGKey(0))
        mesh = make_mesh(jax.devices()[:1])
        synth = MatchaSynthesizer(
            cfg,
            params,
            text_buckets=(16,),
            mel_fine_buckets=(2048,),
            mesh=mesh,
        )
        synth._warm_pair(16, 2048, n_timesteps=1, solver="euler", b=1)

    def test_warmup_covers_mesh_executables(self, synths):
        """Warmup on a meshed synthesizer must compile the exact programs the
        serving paths dispatch (shapes AND shardings), including fused."""
        _, fanout = synths
        fanout.warmup(n_timesteps=2, batch_sizes=(1,), fused=True)
        ids = list(np.random.default_rng(4).integers(0, 600, 10))
        r = fanout.synthesise_ids(ids, speaker=0, n_timesteps=2, fused=True)
        assert np.isfinite(r.wav).all()


def test_progressive_hook_sees_device_multiple_rungs(synths):
    """Under a mesh, warmup pads the group ladder to device multiples; the
    progressive-warmup hook must therefore only ever report padded rungs —
    a b=1 shard over 8 devices cannot exist, so the server's group cap can
    never admit a group whose padded program isn't warm."""
    _, fanout = synths
    seen = []
    fanout.warmup(
        n_timesteps=2, batch_sizes=(1, 2, 16), on_size_ready=seen.append
    )
    assert seen == [8, 16]

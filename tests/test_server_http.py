"""HTTP server integration test: real socket round-trips against a tiny model."""

import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import jax
import numpy as np
import pytest

from matcha_tpu.inference import MatchaSynthesizer
from matcha_tpu.models.config import tiny_config
from matcha_tpu.models.matcha import init_params
from matcha_tpu.serving.server import TTSService, make_handler
from matcha_tpu.vocoder.vocos import VocosConfig, init_vocos_params

CFG = tiny_config()
VCFG = VocosConfig(input_channels=CFG.n_feats, dim=32, intermediate_dim=64, num_layers=1)


@pytest.fixture(scope="module")
def server():
    params = init_params(CFG, jax.random.PRNGKey(0))
    vocos_params = init_vocos_params(jax.random.PRNGKey(1), VCFG)
    synth = MatchaSynthesizer(
        CFG, params, vocos_params, VCFG,
        text_buckets=(16, 32), mel_fine_buckets=(64, 128, 256),
    )
    service = TTSService(synth, use_batcher=True)
    service.ready = True  # skip warmup (tiny model compiles on demand)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}", service
    httpd.shutdown()
    if service.batcher:
        service.batcher.shutdown()


def post(url, body):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as resp:
        return resp.status, resp.headers.get("Content-Type"), resp.read()


class TestHttpServer:
    def test_health(self, server):
        base, _ = server
        with urllib.request.urlopen(f"{base}/health") as resp:
            assert resp.status == 200

    def test_speech_pretokenized_wav(self, server):
        base, _ = server
        ids = list(np.random.default_rng(0).integers(0, 600, 10))
        status, ctype, audio = post(
            f"{base}/v1/audio/speech",
            {"phoneme_ids": [int(i) for i in ids], "voice": "0",
             "response_format": "wav", "steps": 2},
        )
        assert status == 200
        assert ctype == "audio/wav"
        assert audio[:4] == b"RIFF"

    def test_alias_path_mp3(self, server):
        base, _ = server
        ids = list(np.random.default_rng(1).integers(0, 600, 8))
        status, ctype, audio = post(
            f"{base}/tts",
            {"phoneme_ids": [int(i) for i in ids], "voice": "1", "steps": 2},
        )
        assert status == 200
        assert ctype == "audio/mpeg"
        assert audio[0] == 0xFF

    def test_voice_mix_request(self, server):
        base, _ = server
        ids = list(np.random.default_rng(2).integers(0, 600, 8))
        status, _, audio = post(
            f"{base}/v1/audio/speech",
            {"phoneme_ids": [int(i) for i in ids], "voice": "0(60)+1(40)",
             "response_format": "pcm", "steps": 2},
        )
        assert status == 200
        assert len(audio) > 0

    def test_empty_input_400(self, server):
        base, _ = server
        try:
            post(f"{base}/v1/audio/speech", {"input": ""})
            assert False, "expected 400"
        except urllib.error.HTTPError as exc:
            assert exc.code == 400

    def test_bad_ids_400(self, server):
        base, _ = server
        try:
            post(f"{base}/v1/audio/speech", {"phoneme_ids": [9999]})
            assert False, "expected 400"
        except urllib.error.HTTPError as exc:
            assert exc.code == 400

    def test_unknown_path_404(self, server):
        base, _ = server
        try:
            post(f"{base}/nope", {"input": "x"})
            assert False
        except urllib.error.HTTPError as exc:
            assert exc.code == 404

    def test_health_reports_warming(self, server):
        base, service = server
        old = service.warming
        try:
            service.warming = True
            body = json.loads(urllib.request.urlopen(f"{base}/health").read())
            assert body == {"status": "ok", "warming": True}
            service.warming = False
            body = json.loads(urllib.request.urlopen(f"{base}/health").read())
            assert body == {"status": "ok"}
        finally:
            service.warming = old


class TestFusedDefault:
    """SERVE_FUSED defaults ON (round 5): the service routes requests and
    warmup through the single-dispatch fused program unless SERVE_FUSED=0."""

    def test_default_is_fused_and_propagates(self, monkeypatch):
        monkeypatch.delenv("SERVE_FUSED", raising=False)

        class Synth:
            def warmup(self, full=False, batch_sizes=(1,), fused=False,
                       **point):
                self.warm_fused = fused
                self.warm_point = (point.get("n_timesteps"), point.get("solver"))

        service = TTSService(Synth(), use_batcher=True)
        try:
            assert service.fused
            assert service.batcher.fused
            service.warmup()
            assert service.synth.warm_fused  # warmup compiles the fused ladder
        finally:
            service.batcher.shutdown()

    def test_opt_out(self, monkeypatch):
        monkeypatch.setenv("SERVE_FUSED", "0")

        class Synth:
            pass

        service = TTSService(Synth(), use_batcher=True)
        try:
            assert not service.fused
            assert not service.batcher.fused
        finally:
            service.batcher.shutdown()


class TestServingOperatingPoint:
    """DEFAULT_STEPS / DEFAULT_SOLVER select the server's ODE operating
    point (e.g. the measured euler/4 fast mode): unnamed requests get it
    AND warmup compiles exactly that point, so the warmup-covers-serving
    invariant holds for the deployment's default."""

    def test_fast_mode_env_sets_request_default_and_warmup_point(
        self, monkeypatch
    ):
        monkeypatch.setenv("DEFAULT_STEPS", "4")
        monkeypatch.setenv("DEFAULT_SOLVER", "euler")

        class Synth:
            def warmup(self, full=False, batch_sizes=(1,), fused=False,
                       **point):
                self.warm_point = (
                    point.get("n_timesteps"), point.get("solver")
                )

        service = TTSService(Synth(), use_batcher=True)
        try:
            req = service._parse_common({"phoneme_ids": [1, 2, 3]})
            assert (req["steps"], req["solver"]) == (4, "euler")
            # explicit per-request override still wins
            req = service._parse_common(
                {"phoneme_ids": [1], "steps": 2, "solver": "rk4"}
            )
            assert (req["steps"], req["solver"]) == (2, "rk4")
            service.warmup()
            assert service.synth.warm_point == (4, "euler")
        finally:
            service.batcher.shutdown()


class TestProgressiveWarmup:
    """WARMUP_PROGRESSIVE=1: /health flips ready after the first group
    size's programs are warm, the batcher's group cap follows the warmed
    ladder, and the cap lifts when the full ladder is done."""

    def test_ready_flips_after_first_size_and_cap_tracks_ladder(
        self, monkeypatch
    ):
        events = []
        service = None

        class StagedSynth:
            def warmup(
                self, full=False, batch_sizes=(1,), fused=False,
                on_size_ready=None, **point,
            ):
                for b in batch_sizes:
                    # snapshot what a request arriving DURING this size's
                    # warm would see: ready state + admitted group cap
                    events.append(
                        (b, service.ready, service.batcher._group_cap)
                    )
                    if on_size_ready is not None:
                        on_size_ready(b)

        monkeypatch.setenv("WARMUP_PROGRESSIVE", "1")
        monkeypatch.setenv("WARMUP_BATCH_SIZES", "1,2,4")
        service = TTSService(StagedSynth(), use_batcher=True)
        try:
            assert not service.ready and service.warming
            service.warmup()
            # size 1 warmed while unready/cap 1; later sizes serve capped at
            # the previously-completed size
            assert events == [(1, False, 1), (2, True, 1), (4, True, 2)]
            assert service.ready and not service.warming
            assert service.batcher._group_cap is None
        finally:
            service.batcher.shutdown()

    def test_non_progressive_default_unchanged(self, monkeypatch):
        monkeypatch.delenv("WARMUP_PROGRESSIVE", raising=False)
        monkeypatch.setenv("WARMUP_BATCH_SIZES", "1,2")
        calls = []

        class PlainSynth:
            def warmup(self, full=False, batch_sizes=(1,), fused=False,
                       **point):
                # no on_size_ready kwarg: the default path must not pass it
                calls.append(batch_sizes)

        service = TTSService(PlainSynth(), use_batcher=True)
        try:
            service.warmup()
            assert calls == [(1, 2)]
            assert service.ready and not service.warming
            assert service.batcher._group_cap is None
        finally:
            service.batcher.shutdown()


@pytest.fixture(scope="module")
def mesh_server():
    """Server over an 8-device mesh: batched groups shard across chips."""
    from matcha_tpu.parallel.mesh import make_mesh

    params = init_params(CFG, jax.random.PRNGKey(0))
    vocos_params = init_vocos_params(jax.random.PRNGKey(1), VCFG)
    synth = MatchaSynthesizer(
        CFG, params, vocos_params, VCFG,
        text_buckets=(16, 32), mel_fine_buckets=(64, 128, 256),
        mesh=make_mesh(jax.devices()[:8]),
    )
    service = TTSService(synth, use_batcher=True)
    service.ready = True
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{port}", service
    httpd.shutdown()
    if service.batcher:
        service.batcher.shutdown()


class TestMeshServer:
    def test_concurrent_requests_shard_over_mesh(self, mesh_server):
        """Concurrent requests through the batcher execute on the sharded
        path and return per-request audio (SERVE_MESH=1 production mode)."""
        base, _ = mesh_server
        rng = np.random.default_rng(3)
        results = {}

        def one(k, n):
            ids = [int(v) for v in rng.integers(0, 600, n)]
            status, ctype, data = post(
                f"{base}/v1/audio/speech",
                {"phoneme_ids": ids, "voice": str(k % 4), "response_format": "pcm"},
            )
            results[k] = (status, len(data))

        threads = [
            threading.Thread(target=one, args=(k, 6 + k)) for k in range(5)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert len(results) == 5
        assert all(st == 200 and n > 0 for st, n in results.values())


@pytest.fixture(scope="module")
def pipelined_server():
    """Server with SERVE_PIPELINE=2: up to two batcher groups in flight."""
    import os

    params = init_params(CFG, jax.random.PRNGKey(0))
    vocos_params = init_vocos_params(jax.random.PRNGKey(1), VCFG)
    synth = MatchaSynthesizer(
        CFG, params, vocos_params, VCFG,
        text_buckets=(16, 32), mel_fine_buckets=(64, 128, 256),
    )
    old = os.environ.get("SERVE_PIPELINE")
    os.environ["SERVE_PIPELINE"] = "2"
    try:
        service = TTSService(synth, use_batcher=True)
    finally:
        if old is None:
            os.environ.pop("SERVE_PIPELINE", None)
        else:
            os.environ["SERVE_PIPELINE"] = old
    service.ready = True
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{port}", service
    httpd.shutdown()
    if service.batcher:
        service.batcher.shutdown()


class TestPipelinedServer:
    def test_mixed_solver_requests_complete_under_pipeline(self, pipelined_server):
        """SERVE_PIPELINE=2 wires through to the batcher, and concurrent
        incompatible-key requests (which force separate groups, exercising
        the overlapped path) all come back 200 with audio."""
        base, service = pipelined_server
        assert service.batcher.pipeline == 2
        rng = np.random.default_rng(5)
        results = {}

        def one(k, solver):
            ids = [int(v) for v in rng.integers(0, 600, 8 + k)]
            status, _, data = post(
                f"{base}/v1/audio/speech",
                {"phoneme_ids": ids, "voice": str(k % 4),
                 "response_format": "pcm", "solver": solver, "steps": 2},
            )
            results[k] = (status, len(data))

        threads = [
            threading.Thread(target=one, args=(k, s))
            for k, s in enumerate(["midpoint", "euler", "midpoint", "euler"])
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert len(results) == 4
        assert all(st == 200 and n > 0 for st, n in results.values())


class TestGracefulShutdown:
    """SIGTERM drain: in-flight work finishes, new work is refused, the
    HTTP loop stops (serving/server.py::begin_drain)."""

    def _make(self):
        import time as _t

        from matcha_tpu.inference import SynthesisResult

        class StubSynth:
            def synthesise_batch(self, id_lists, **kw):
                _t.sleep(0.2)  # slow enough to still be in flight at drain
                return [
                    SynthesisResult(wav=np.zeros(100, np.float32), rtf=0.1)
                    for _ in id_lists
                ]

        service = TTSService(StubSynth(), use_batcher=True)
        service.ready = True
        service.warming = False
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        return service, httpd, f"http://127.0.0.1:{httpd.server_address[1]}"

    def test_drain_finishes_inflight_then_refuses(self):
        from matcha_tpu.serving.server import begin_drain

        service, httpd, base = self._make()
        try:
            results = {}

            def req():
                results["resp"] = post(
                    f"{base}/v1/audio/speech",
                    {"phoneme_ids": [1, 2, 3], "voice": "0",
                     "response_format": "wav"},
                )

            th = threading.Thread(target=req)
            th.start()
            import time as _t

            _t.sleep(0.08)  # request accepted, synthesis in flight
            assert begin_drain(service, httpd, timeout_s=5) is True
            th.join(timeout=5)
            status, ctype, audio = results["resp"]
            assert status == 200 and audio[:4] == b"RIFF"
            # new work is refused at the batcher
            try:
                service.batcher.submit([1], speaker=0)
                raise AssertionError("submit after drain must raise")
            except RuntimeError:
                pass
        finally:
            httpd.server_close()

    def test_draining_state_503s(self):
        service, httpd, base = self._make()
        try:
            service.draining = True
            body = None
            try:
                urllib.request.urlopen(f"{base}/health", timeout=5)
                raise AssertionError("health while draining must be 503")
            except urllib.error.HTTPError as exc:
                assert exc.code == 503
                body = json.loads(exc.read())
            assert body == {"status": "draining"}
            try:
                post(f"{base}/v1/audio/speech",
                     {"phoneme_ids": [1], "voice": "0"})
                raise AssertionError("speech while draining must be 503")
            except urllib.error.HTTPError as exc:
                assert exc.code == 503
        finally:
            httpd.shutdown()
            httpd.server_close()
            service.batcher.shutdown()

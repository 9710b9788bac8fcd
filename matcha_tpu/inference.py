"""End-to-end synthesis pipeline: text → 24 kHz waveform on TPU.

The reference pipeline (matcha/inference.py) runs eager torch with
torch.compile on the estimator only.  Here the WHOLE accelerator graph —
encoder → duration rounding → hard alignment → prior assembly → ODE decode →
denormalize → Vocos → peak-normalize — compiles into exactly two jit
programs per shape bucket:

  stage A (text bucket):        ids → (mu_x, durations)
  stage B (text x mel bucket):  (mu_x, durations) → waveform

Static shapes come from a small geometric bucket ladder; the only host-side
decision between the stages is choosing the mel bucket from the predicted
total duration (a scalar).  Warming the bucket set at server start gives
recompile-free serving.

Host-side work (eSpeak phonemization, silence trimming, mp3 encode) stays on
CPU exactly as in the reference — it is C-library, not accelerator, work.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tpu.models.config import MatchaConfig
from matcha_tpu.models.matcha import MatchaTTS
from matcha_tpu.utils.model_math import (
    denormalize,
    downsample_time,
    fix_len_compatibility,
    generate_path,
    sequence_mask,
)
from matcha_tpu.vocoder.vocos import Vocos, VocosConfig

SAMPLE_RATE = 24000
STD_RES_HOP_LENGTH = 256
HIGH_RES_HOP_LENGTH = 128

DEFAULT_ODE_SOLVER = "midpoint"
DEFAULT_NUM_STEPS = 4

# Voice registry: per-speaker duration scale corrections measured against
# ground truth after training (reference: matcha/inference.py:16-32).
VOICES: list[dict[str, Any]] = [
    {"id": "0", "lang": "en-us", "gender": "male", "name": "Kai", "scale_correction": 1.08},
    {"id": "1", "lang": "en-us", "gender": "female", "name": "Jane", "scale_correction": 1.05},
    {"id": "2", "lang": "en-us", "gender": "female", "name": "Aria", "scale_correction": 1.05},
    {"id": "3", "lang": "en-us", "gender": "female", "name": "Bella", "scale_correction": 1.03},
    {"id": "4", "lang": "en-gb", "gender": "male", "name": "Brian", "scale_correction": 1.08},
    {"id": "5", "lang": "en-gb", "gender": "male", "name": "Arthur", "scale_correction": 1.08},
    {"id": "6", "lang": "en-us", "gender": "female", "name": "Nicole", "scale_correction": 1.05},
    {"id": "7", "lang": "ro", "gender": "male", "name": "Emil", "scale_correction": 1.04},
    {"id": "8", "lang": "fr-fr", "gender": "female", "name": "Denise", "scale_correction": 1.05},
    {"id": "9", "lang": "fr-fr", "gender": "male", "name": "Henri", "scale_correction": 1.03},
    {"id": "10", "lang": "en-us", "gender": "male", "name": "Matthew", "scale_correction": 1.06},
    {"id": "11", "lang": "en-us", "gender": "male", "name": "Lewis", "scale_correction": 1.08},
    {"id": "12", "lang": "en-us", "gender": "male", "name": "Michael", "scale_correction": 1.03},
    {"id": "13", "lang": "it", "gender": "female", "name": "Isabella", "scale_correction": 1.07},
    {"id": "14", "lang": "it", "gender": "male", "name": "Marcello", "scale_correction": 1.07},
]


# serving pace clamp (reference: matcha/server.py:34-36): length_scale =
# 1/speed is clamped to [0.1, 2.0]; together with the largest per-voice
# correction this bounds the effective duration scale a request can carry —
# the fused warmup ladder covers every mel bucket reachable in that range
MIN_LENGTH_SCALE = 0.1
MAX_LENGTH_SCALE = 2.0
MAX_SCALE_CORRECTION = max(v["scale_correction"] for v in VOICES)


def _pull_together(*arrays):
    """ONE overlapped device→host transfer for several arrays.

    ``jax.device_get`` starts an async copy of EVERY leaf before blocking
    on any of them, so N outputs cost one transport round-trip instead of
    N serialized pulls — each serialized pull is a full RTT (~25 ms
    measured through the remote-dispatch dev tunnel).  The serving paths
    route every multi-output pull through here so tests can pin the
    one-transfer invariant (tests/test_inference_e2e.py).
    """
    return tuple(np.asarray(a) for a in jax.device_get(list(arrays)))


def voice_by_id(speaker_id: int | str) -> dict[str, Any]:
    sid = str(speaker_id)
    for v in VOICES:
        if v["id"] == sid:
            return v
    raise KeyError(f"Unknown voice id {speaker_id!r}")


# ---------------------------------------------------------------------------
# shape buckets
# ---------------------------------------------------------------------------

DEFAULT_TEXT_BUCKETS = (64, 128, 256, 512, 1024, 2048, 4000)
# fine-mel buckets; must be even multiples of 2**num_downsamples x 2
DEFAULT_MEL_FINE_BUCKETS = (256, 512, 1024, 2048, 4096, 8192)


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"Length {n} exceeds largest bucket {buckets[-1]}")


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------


@dataclass
class SynthesisResult:
    wav: np.ndarray                       # (n_samples,) float32 in [-1, 1]
    rtf: float                            # wall time / audio seconds produced
    latency_s: float = 0.0                # wall time of the producing call
    mel: np.ndarray | None = None         # (frames, n_mels) denormalized
    durations: np.ndarray | None = None   # (tokens,) fine frames
    encoder_wav: np.ndarray | None = None


def blended_scale_correction(voice_mix: Sequence[tuple[int, float]]) -> float:
    """Weight-blend the per-voice duration corrections across a mix.

    (reference: matcha/server.py:111-114 — a 70/30 mix of voices with
    corrections 1.05/1.08 speaks at 1.059, not at the primary's 1.05)
    """
    total_w = sum(w for _, w in voice_mix) or 1.0
    blended = 0.0
    for spk, w in voice_mix:
        try:
            sc = voice_by_id(spk)["scale_correction"]
        except KeyError:
            sc = 1.0
        blended += w * sc
    return blended / total_w


class MatchaSynthesizer:
    """Holds params + jit caches and exposes synthesise().

    One instance ↔ one (model checkpoint, vocoder checkpoint) pair.
    """

    def __init__(
        self,
        cfg: MatchaConfig,
        params,
        vocos_params=None,
        vocos_cfg: VocosConfig = VocosConfig(),
        text_buckets: Sequence[int] = DEFAULT_TEXT_BUCKETS,
        mel_fine_buckets: Sequence[int] = DEFAULT_MEL_FINE_BUCKETS,
        mesh=None,
    ):
        """``mesh``: optional jax Mesh for multi-chip batch fan-out — batched
        requests are sharded over the ``data`` axis (params replicated), so
        a v5e-8 host serves 8x the batch at single-chip latency."""
        self.cfg = cfg
        self.mesh = mesh
        self.n_dev = len(mesh.devices.flatten()) if mesh is not None else 1
        # speaker-mixing blends run in host numpy — grab the tables BEFORE
        # pinning/replication (a post-hoc device_get can be pathologically
        # slow on remote transports)
        self._spk_tables_np = (
            np.asarray(params["speaker_embeddings_enc"]["embedding"]),
            np.asarray(params["speaker_embeddings_dur"]["embedding"]),
        )
        if mesh is not None:
            from matcha_tpu.parallel.mesh import replicate

            params = replicate(mesh, params)
            if vocos_params is not None:
                vocos_params = replicate(mesh, vocos_params)
        else:
            # checkpoints load as HOST numpy trees — pin them on device once,
            # or every jit call re-uploads the full weight set (~120 MB for
            # the production model: seconds per request on remote transports)
            params = jax.device_put(params)
            if vocos_params is not None:
                vocos_params = jax.device_put(vocos_params)
        self.params = params
        self.model = MatchaTTS(cfg)
        self.vocos_cfg = vocos_cfg
        self.vocos_params = vocos_params
        self.vocos = Vocos(vocos_cfg) if vocos_params is not None else None
        # buckets past the encoder's RoPE cache can never run — drop them
        # (keep at least the smallest bucket so tiny test configs still work)
        max_tx = cfg.encoder.rope_max_len
        kept = tuple(b for b in text_buckets if b <= max_tx)
        self.text_buckets = kept or (max_tx,)
        self.mel_fine_buckets = tuple(
            fix_len_compatibility(b // 2) * 2 for b in mel_fine_buckets
        )
        self._vocode_jit = None
        if mesh is None:
            self._encode_jit = jax.jit(self._encode)
            self._decode_jit = jax.jit(
                self._decode,
                static_argnames=("y_fine_len", "n_timesteps", "solver"),
            )
            self._fused_jit = jax.jit(
                self._synth_fused,
                static_argnames=("y_fine_len", "n_timesteps", "solver"),
            )
        else:
            # Under the fan-out mesh every stage runs as a shard_map over the
            # data axis: each chip executes the plain single-device program on
            # its local batch shard (no collectives — synthesis is independent
            # per sample).  This is what lets the Pallas flash-attention
            # kernel (which has no GSPMD partitioning rule) keep its long-
            # bucket win under the mesh, exactly like the shard_map'ed Pallas
            # MAS in training (ops/mas_pallas.py).
            self._encode_jit = jax.jit(self._encode_sharded)
            self._decode_jit = jax.jit(
                self._decode_sharded,
                static_argnames=("y_fine_len", "n_timesteps", "solver"),
            )
            self._fused_jit = jax.jit(
                self._synth_fused_sharded,
                static_argnames=("y_fine_len", "n_timesteps", "solver"),
            )

    # -- stage A ------------------------------------------------------------

    def _encode(self, params, x, x_lengths, spk_enc, spk_dur, scale):
        x_mask = sequence_mask(x_lengths, x.shape[1]).astype(jnp.float32)
        mu_x, durations = self.model.apply(
            {"params": params}, x, x_mask, spk_enc, spk_dur, method=MatchaTTS.encode
        )
        # per-speaker correction x user pace, then round-to-nearest with a
        # floor of 1 frame (reference: inference.py:130-143)
        durations = durations * scale
        durations = jnp.clip(jnp.round(durations), min=1.0) * x_mask
        return mu_x, durations, x_mask

    # -- stage B ------------------------------------------------------------

    def _decode(
        self,
        params,
        vocos_params,
        mu_x,
        durations,
        x_mask,
        y_fine_lengths,
        noise=None,
        *,
        y_fine_len: int,
        n_timesteps: int,
        solver: str,
    ):
        y_fine_mask = sequence_mask(y_fine_lengths, y_fine_len).astype(jnp.float32)
        # prior assembly as an fp32 GATHER: the binary alignment path selects
        # exactly one token per frame, so searchsorted over the duration
        # cumsum is bit-identical to the reference's dense path matmul
        # (inference.py:154-160) at O(B·Ty·C) instead of O(B·Tx·Ty·C), and
        # never materializes the (B, Tx, Ty) attention tensor.  side='right'
        # skips zero-duration tokens exactly like generate_path.
        cum = jnp.cumsum(durations.astype(jnp.int32), axis=1)  # (B, Tx)
        frames = jnp.arange(y_fine_len, dtype=jnp.int32)
        idx = jax.vmap(
            lambda c: jnp.searchsorted(c, frames, side="right")
        )(cum)
        # frames at/after the total duration (possible when y_fine_lengths was
        # lower-clamped above sum(durations)) must be zero, matching the dense
        # generate_path matmul — NOT the last token's mu_x that the index clip
        # below would otherwise pick up
        in_range = (frames[None, :] < cum[:, -1:]).astype(jnp.float32)
        idx = jnp.clip(idx, 0, mu_x.shape[1] - 1)
        mu_y_fine = jnp.take_along_axis(
            mu_x.astype(jnp.float32), idx[..., None], axis=1
        )
        mu_y_fine = mu_y_fine * (y_fine_mask * in_range)[..., None]
        mu_y = downsample_time(mu_y_fine)
        y_lengths = (y_fine_lengths + 1) // 2
        y_mask = sequence_mask(y_lengths, mu_y.shape[1]).astype(jnp.float32)

        dec = self.model.apply(
            {"params": params},
            mu_y,
            y_mask,
            n_timesteps,
            solver,
            noise,
            method=MatchaTTS.decode,
        )
        stats = self.cfg.data_statistics
        mel = denormalize(dec, stats.mel_mean, stats.mel_std)
        mel = mel * y_mask[..., None] + (1.0 - y_mask[..., None]) * stats.mel_mean
        # encoder-only mel, for debug listening (reference: inference.py:174-183)
        enc_mel = denormalize(mu_y, stats.mel_mean, stats.mel_std)
        enc_mel = (
            enc_mel * y_mask[..., None]
            + (1.0 - y_mask[..., None]) * stats.mel_mean
        )

        if vocos_params is None:
            return mel, None, enc_mel
        wav = Vocos(self.vocos_cfg).apply({"params": vocos_params}, mel)
        # peak-normalize to 0.95 only when clipping (reference: inference.py:260-265)
        peak = jnp.max(jnp.abs(wav), axis=-1, keepdims=True)
        wav = jnp.where(peak > 1.0, wav / peak * 0.95, wav)
        return mel, wav, enc_mel

    # -- fused single-dispatch path ------------------------------------------

    def _synth_fused(
        self,
        params,
        vocos_params,
        x,
        x_lengths,
        spk_enc,
        spk_dur,
        scale,
        noise=None,
        *,
        y_fine_len: int,
        n_timesteps: int,
        solver: str,
    ):
        """Both stages in ONE compiled program (one dispatch, one D2H).

        The two-stage path exists because the mel bucket is chosen on host
        from predicted durations; here the mel length is fixed up-front to a
        bucket predicted from the TEXT length, and the true total duration is
        returned so the host can detect (rare) overflow and fall back.  Cuts
        the per-request fixed dispatch cost in half — which the measured
        device/transport split shows is the dominant term for B=1 requests
        (documentation/performance.md: stage A is 1.9 ms device work inside
        ~33 ms of dispatch overhead)."""
        mu_x, durations, x_mask = self._encode(
            params, x, x_lengths, spk_enc, spk_dur, scale
        )
        total = jnp.sum(durations, axis=1).astype(jnp.int32)  # (B,)
        y_fine_lengths = jnp.clip(total, 2, y_fine_len)
        mel, wav, enc_mel = self._decode(
            params,
            vocos_params,
            mu_x,
            durations,
            x_mask,
            y_fine_lengths,
            noise,
            y_fine_len=y_fine_len,
            n_timesteps=n_timesteps,
            solver=solver,
        )
        return mel, wav, total

    # -- mesh fan-out: per-shard programs via shard_map -----------------------

    def _shard_mapped(self, fn, n_replicated: int, n_batched: int):
        """Wrap ``fn(*replicated_trees, *batch_arrays)`` in a data-axis
        shard_map: param trees replicated, batch args split on axis 0.
        Per-shard independence means no collectives and makes single-device
        Pallas kernels legal inside the meshed program."""
        from jax.sharding import PartitionSpec as P

        from matcha_tpu.parallel.mesh import DATA_AXIS

        return jax.shard_map(
            fn,
            mesh=self.mesh,
            in_specs=(P(),) * n_replicated + (P(DATA_AXIS),) * n_batched,
            out_specs=P(DATA_AXIS),
            # pallas_call outputs carry no varying-mesh-axes annotation; the
            # computation is per-sample so the check is unnecessary
            check_vma=False,
        )

    def _encode_sharded(self, params, x, x_lengths, spk_enc, spk_dur, scale):
        return self._shard_mapped(self._encode, 1, 5)(
            params, x, x_lengths, spk_enc, spk_dur, scale
        )

    def _global_noise(self, b: int, y_fine_len: int) -> jax.Array:
        """Seeded ODE noise for the GLOBAL padded batch.

        Every row shares the single B=1 stream (seeded_synthesis_noise), so
        the draw is invariant to batch size, row position, and mel bucket —
        and identical whether it happens inside a shard_map shard or here.
        Still generated outside the shard_map and passed as a sharded input
        so the meshed program stays bit-comparable with the single-chip one
        (and the broadcast costs nothing device-side).
        """
        from matcha_tpu.models.flow_matching import seeded_synthesis_noise

        return seeded_synthesis_noise(
            b, (y_fine_len + 1) // 2, self.cfg.n_feats
        )

    def _decode_sharded(
        self,
        params,
        vocos_params,
        mu_x,
        durations,
        x_mask,
        y_fine_lengths,
        *,
        y_fine_len: int,
        n_timesteps: int,
        solver: str,
    ):
        fn = functools.partial(
            self._decode,
            y_fine_len=y_fine_len,
            n_timesteps=n_timesteps,
            solver=solver,
        )
        noise = self._global_noise(mu_x.shape[0], y_fine_len)
        return self._shard_mapped(fn, 2, 5)(
            params, vocos_params, mu_x, durations, x_mask, y_fine_lengths, noise
        )

    def _synth_fused_sharded(
        self,
        params,
        vocos_params,
        x,
        x_lengths,
        spk_enc,
        spk_dur,
        scale,
        *,
        y_fine_len: int,
        n_timesteps: int,
        solver: str,
    ):
        fn = functools.partial(
            self._synth_fused,
            y_fine_len=y_fine_len,
            n_timesteps=n_timesteps,
            solver=solver,
        )
        noise = self._global_noise(x.shape[0], y_fine_len)
        return self._shard_mapped(fn, 2, 6)(
            params, vocos_params, x, x_lengths, spk_enc, spk_dur, scale, noise
        )

    # fine frames a voiced token tends to expand to at pace 1.0 — a CORPUS
    # statistic of the trained model (~8 frames = 40 ms for the reference
    # corpus).  Deployments whose checkpoint speaks at a different pace set
    # FUSED_FRAMES_PER_TOKEN (serving) or this attribute: too high wastes
    # compute + D2H on oversized fused mel buckets; too low overflows into
    # the two-dispatch fallback.  Every (pre, P, post) triple is ~2 ids,
    # hence the tx//2 below.
    fused_frames_per_token: float = 8.0

    def predict_fine_bucket(self, tx: int, scale: float = 1.0) -> int:
        """Mel bucket guess from the text bucket: ``fused_frames_per_token``
        fine frames per token at pace 1.0, times the request's effective
        duration scale (scale_correction × length_scale), clamped to the
        ladder.

        The scale multiply matters: durations scale linearly with pace
        (reference: matcha/inference.py:130-134), so without it every
        slow-speech request (speed<1 → length_scale up to 2.0) predictably
        overflowed the text-predicted bucket and silently paid the
        two-dispatch fallback — SERVE_FUSED stopped helping exactly for the
        longest-latency requests."""
        expect = int((tx // 2) * self.fused_frames_per_token * max(scale, 0.0))
        expect = min(max(expect, 1), self.mel_fine_buckets[-1])
        return pick_bucket(expect, self.mel_fine_buckets)

    def fused_warm_buckets(self, tx: int) -> list[int]:
        """Every mel bucket predict_fine_bucket can return for ``tx`` across
        the serving pace range.  The prediction is monotonic in scale and
        pick_bucket is monotonic in its argument, so the image over the
        scale interval is exactly the contiguous rung range between the two
        endpoint predictions."""
        lo = self.predict_fine_bucket(tx, MIN_LENGTH_SCALE)
        hi = self.predict_fine_bucket(
            tx, MAX_LENGTH_SCALE * MAX_SCALE_CORRECTION
        )
        return [b for b in self.mel_fine_buckets if lo <= b <= hi]

    # -- public -------------------------------------------------------------

    def speaker_embedding(self, voice_mix: Sequence[tuple[int, float]]):
        """Weighted blend of speaker-embedding rows over both tables.

        Computed in HOST numpy from tables cached at first use: per-request
        device gathers would each be their own tiny XLA program (a real
        latency hazard through remote-dispatch transports, and pointless
        work on any backend).  (reference: matcha/inference.py:57-76)
        """
        if not hasattr(self, "_spk_tables_np"):
            self._spk_tables_np = (
                np.asarray(self.params["speaker_embeddings_enc"]["embedding"]),
                np.asarray(self.params["speaker_embeddings_dur"]["embedding"]),
            )
        e, d = self._speaker_embedding_np(voice_mix)
        # jnp-wrap (pure H2D, dtype already f32): raw ndarrays would key a
        # SEPARATE jit cache entry from the warmed device-array signature
        return jnp.asarray(e[None]), jnp.asarray(d[None])

    def _speaker_embedding_np(self, voice_mix):
        if not hasattr(self, "_spk_tables_np"):
            self._spk_tables_np = (
                np.asarray(self.params["speaker_embeddings_enc"]["embedding"]),
                np.asarray(self.params["speaker_embeddings_dur"]["embedding"]),
            )
        enc_tab, dur_tab = self._spk_tables_np
        enc = sum(w * enc_tab[i] for i, w in voice_mix)
        dur = sum(w * dur_tab[i] for i, w in voice_mix)
        return np.asarray(enc, np.float32), np.asarray(dur, np.float32)

    def vocode(self, mel):
        """Denormalized log-mel (B, T, n_mels) → waveform (host debug path)."""
        if self._vocode_jit is None:
            self._vocode_jit = jax.jit(
                lambda p, m: Vocos(self.vocos_cfg).apply({"params": p}, m)
            )
        return self._vocode_jit(self.vocos_params, mel)

    def synthesise_ids(
        self,
        phoneme_ids: Sequence[int],
        speaker: int = 0,
        voice_mix: Sequence[tuple[int, float]] | None = None,
        n_timesteps: int = DEFAULT_NUM_STEPS,
        solver: str = DEFAULT_ODE_SOLVER,
        length_scale: float = 1.0,
        scale_correction: float | None = None,
        debug: bool = False,
        fused: bool = False,
    ) -> SynthesisResult:
        t0 = time.perf_counter()
        if voice_mix is None:
            voice_mix = [(speaker, 1.0)]
        if scale_correction is None:
            scale_correction = blended_scale_correction(voice_mix)

        n = len(phoneme_ids)
        tx = pick_bucket(n, self.text_buckets)
        # under the fan-out mesh even a single request pads to one sample per
        # device (a 1-row shard over N chips cannot exist); pad rows carry one
        # token so their cost is the bucket's fixed cost the mesh pays anyway
        b_pad = self.n_dev
        x = np.zeros((b_pad, tx), np.int32)
        x[0, :n] = phoneme_ids
        x_lengths = jnp.asarray(
            np.asarray([n] + [1] * (b_pad - 1), np.int32)
        )
        if b_pad == 1:
            spk_enc, spk_dur = self.speaker_embedding(voice_mix)
        else:
            e, d = self._speaker_embedding_np(voice_mix)
            spk_enc = jnp.asarray(np.broadcast_to(e, (b_pad, e.shape[-1])))
            spk_dur = jnp.asarray(np.broadcast_to(d, (b_pad, d.shape[-1])))
        # (B, 1)-shaped so the b=1 program is the SAME executable as the
        # batched path's (B, 1) per-sample scale — one warmup covers both
        scale = jnp.full((b_pad, 1), scale_correction * length_scale, jnp.float32)

        args = (jnp.asarray(x), x_lengths, spk_enc, spk_dur, scale)
        if self.mesh is not None:
            from matcha_tpu.parallel.mesh import shard_batch

            args = shard_batch(self.mesh, args)

        if fused and not debug:
            y_fine_len = self.predict_fine_bucket(
                tx, scale_correction * length_scale
            )
            mel, wav, total_dev = self._fused_jit(
                self.params,
                self.vocos_params,
                *args,
                y_fine_len=y_fine_len,
                n_timesteps=n_timesteps,
                solver=solver,
            )
            # optimistic ONE-transfer pull of (total, wav): blocking on the
            # total-duration scalar first and pulling the waveform after
            # would serialize two transport round-trips on the one path
            # built to minimize round-trips; the wav bytes are wasted only
            # on the rare overflow fallback below
            if wav is not None:
                total_np, wav_full = _pull_together(total_dev, wav)
            else:
                (total_np,) = _pull_together(total_dev)
                wav_full = None
            total_fine = int(total_np[0])
            if total_fine <= y_fine_len:
                n_frames = (max(total_fine, 2) + 1) // 2
                if wav_full is not None:
                    n_samples = max((n_frames - 1) * STD_RES_HOP_LENGTH, 0)
                    wav_np = trim_trailing_silence(wav_full[0, :n_samples])
                else:
                    wav_np = np.zeros((0,), np.float32)
                elapsed = time.perf_counter() - t0
                audio_sec = (
                    len(wav_np) / SAMPLE_RATE
                    if len(wav_np)
                    else n_frames * STD_RES_HOP_LENGTH / SAMPLE_RATE
                )
                return SynthesisResult(
                    wav=wav_np,
                    rtf=elapsed / max(audio_sec, 1e-9),
                    latency_s=elapsed,
                )
            # rare overflow (speech longer than the text-predicted bucket):
            # fall through to the exact two-stage path below

        mu_x, durations, x_mask = self._encode_jit(self.params, *args)

        # host-side reduction: durations come back D2H once; a device-side
        # jnp.sum would be its own tiny compiled program per shape
        durations_np = np.asarray(durations)
        total_fine = int(durations_np.sum(axis=1)[0])
        total_fine = max(total_fine, 2)
        # guard: clamp runaway duration predictions to the largest bucket
        # (trailing frames are truncated) rather than failing the request
        total_fine = min(total_fine, self.mel_fine_buckets[-1])
        y_fine_len = pick_bucket(total_fine, self.mel_fine_buckets)
        y_fine_lengths = jnp.asarray(
            np.asarray([total_fine] + [2] * (b_pad - 1), np.int32)
        )
        if self.mesh is not None:
            from matcha_tpu.parallel.mesh import shard_batch

            y_fine_lengths = shard_batch(self.mesh, y_fine_lengths)

        mel, wav, enc_mel = self._decode_jit(
            self.params,
            self.vocos_params,
            mu_x,
            durations,
            x_mask,
            y_fine_lengths,
            y_fine_len=y_fine_len,
            n_timesteps=n_timesteps,
            solver=solver,
        )

        n_frames = (total_fine + 1) // 2
        # transfer whole outputs D2H in ONE overlapped pull, slice on host:
        # device-side slices would compile one tiny program per distinct
        # request length, and serialized pulls each cost a transport RTT.
        # The mel rides the pull only when the caller asked for it (debug).
        pulled = _pull_together(
            *([mel] if debug else []), *([wav] if wav is not None else [])
        )
        mel_np = pulled[0][0, :n_frames] if debug else None
        if wav is not None:
            n_samples = max((n_frames - 1) * STD_RES_HOP_LENGTH, 0)
            wav_np = trim_trailing_silence(pulled[-1][0, :n_samples])
        else:
            wav_np = np.zeros((0,), np.float32)
        elapsed = time.perf_counter() - t0
        audio_sec = len(wav_np) / SAMPLE_RATE if len(wav_np) else (
            n_frames * STD_RES_HOP_LENGTH / SAMPLE_RATE
        )
        rtf = elapsed / max(audio_sec, 1e-9)

        result = SynthesisResult(
            wav=wav_np,
            rtf=rtf,
            latency_s=elapsed,
            mel=mel_np,
            durations=durations_np[0, : np.count_nonzero(x[0])]
            if debug
            else None,
        )
        if debug and self.vocos_params is not None:
            enc_wav = self.vocode(enc_mel[:, :n_frames])
            result.encoder_wav = np.asarray(enc_wav[0])
        return result

    def synthesise_batch(
        self,
        id_lists: Sequence[Sequence[int]],
        speakers: Sequence[int] | None = None,
        n_timesteps: int = DEFAULT_NUM_STEPS,
        solver: str = DEFAULT_ODE_SOLVER,
        length_scales: Sequence[float] | None = None,
        voice_mixes: Sequence[Sequence[tuple[int, float]]] | None = None,
        fused: bool = False,
    ) -> list[SynthesisResult]:
        """Batched synthesis: the serving-side throughput lever.

        The reference server is strictly serial (SURVEY.md §2.6); here
        concurrent requests share one padded TPU program: all utterances are
        padded to the common text/mel buckets and decoded in a single call.

        ``fused=True`` issues the group as ONE dispatch (the mel bucket is
        predicted from the text bucket; transparent two-dispatch retry when
        any utterance overflows it) — at the measured transport knee each
        dispatch costs ~30 ms fixed, so this nearly halves group latency.
        """
        t0 = time.perf_counter()
        b = len(id_lists)
        if voice_mixes is None:
            assert speakers is not None and b == len(speakers)
            voice_mixes = [[(spk, 1.0)] for spk in speakers]
        assert b == len(voice_mixes)
        length_scales = length_scales or [1.0] * b

        # pad the batch to a power-of-2 ladder so arbitrary group sizes hit
        # a handful of compiled programs, then to a device multiple for the
        # multi-chip fan-out shard
        n_dev = len(self.mesh.devices.flatten()) if self.mesh is not None else 1
        b_pad = 1 << (b - 1).bit_length() if b > 1 else 1
        b_pad = -(-b_pad // n_dev) * n_dev
        tx = pick_bucket(max(len(ids) for ids in id_lists), self.text_buckets)
        x = np.zeros((b_pad, tx), np.int32)
        for k, ids in enumerate(id_lists):
            x[k, : len(ids)] = ids
        x_lengths = jnp.asarray(
            np.asarray([len(ids) for ids in id_lists] + [1] * (b_pad - b), np.int32)
        )

        enc_rows, dur_rows, scales = [], [], []
        for k, mix in enumerate(voice_mixes):
            e, d = self._speaker_embedding_np(mix)
            enc_rows.append(e)
            dur_rows.append(d)
            scales.append(blended_scale_correction(mix) * length_scales[k])
        pad_rows = b_pad - b
        if pad_rows:
            enc_rows.extend([enc_rows[0]] * pad_rows)
            dur_rows.extend([dur_rows[0]] * pad_rows)
            scales.extend([1.0] * pad_rows)
        spk_enc = jnp.asarray(np.stack(enc_rows))
        spk_dur = jnp.asarray(np.stack(dur_rows))
        # per-sample duration scale: broadcast over tokens inside _encode
        scale = jnp.asarray(np.asarray(scales, np.float32)[:, None])

        x_dev = jnp.asarray(x)
        if self.mesh is not None:
            from matcha_tpu.parallel.mesh import shard_batch

            x_dev, x_lengths, spk_enc, spk_dur, scale = shard_batch(
                self.mesh, (x_dev, x_lengths, spk_enc, spk_dur, scale)
            )

        if fused:
            # the group shares ONE mel bucket: size it for the slowest pace
            # in the group (pad rows carry scale 1.0 and a 1-token floor)
            yf_pred = self.predict_fine_bucket(tx, max(scales[:b]))
            mel, wav, total_dev = self._fused_jit(
                self.params,
                self.vocos_params,
                x_dev,
                x_lengths,
                spk_enc,
                spk_dur,
                scale,
                y_fine_len=yf_pred,
                n_timesteps=n_timesteps,
                solver=solver,
            )
            # optimistic ONE-transfer pull (see _pull_together): the group's
            # waveforms ride the same round-trip as the totals; wasted only
            # when an utterance overflows and the two-stage retry runs
            if wav is not None:
                totals, wav_np = _pull_together(total_dev, wav)
            else:
                (totals,) = _pull_together(total_dev)
                wav_np = None
            totals = totals.astype(int)
            if int(totals[:b].max(initial=2)) <= yf_pred:
                totals = np.clip(totals, 2, yf_pred)
                return self._collect_batch_results(b, wav_np, totals, t0)
            # overflow in at least one utterance: fall through to the exact
            # two-stage path (costs the same two dispatches as non-fused)

        mu_x, durations, x_mask = self._encode_jit(
            self.params, x_dev, x_lengths, spk_enc, spk_dur, scale
        )
        totals = np.asarray(durations).sum(axis=1).astype(int)
        totals = np.clip(totals, 2, self.mel_fine_buckets[-1])
        y_fine_len = pick_bucket(int(totals.max()), self.mel_fine_buckets)
        totals_dev = jnp.asarray(np.asarray(totals, np.int32))
        if self.mesh is not None:
            totals_dev = shard_batch(self.mesh, totals_dev)
        mel, wav, _ = self._decode_jit(
            self.params,
            self.vocos_params,
            mu_x,
            durations,
            x_mask,
            totals_dev,
            y_fine_len=y_fine_len,
            n_timesteps=n_timesteps,
            solver=solver,
        )
        return self._collect_batch_results(b, wav, totals, t0)

    def _collect_batch_results(
        self, b: int, wav, totals, t0: float
    ) -> list[SynthesisResult]:
        elapsed = time.perf_counter() - t0
        wav_np = np.asarray(wav) if wav is not None else None
        wavs = []
        for k in range(b):
            frames = (int(totals[k]) + 1) // 2
            if wav_np is not None:
                n_samples = max((frames - 1) * STD_RES_HOP_LENGTH, 0)
                wavs.append(trim_trailing_silence(wav_np[k, :n_samples]))
            else:
                wavs.append(np.zeros((0,), np.float32))
        # honest metrics: the call produced sum(audio) seconds in `elapsed`
        # wall seconds, so the throughput RTF is elapsed / total_audio — the
        # same for every request in the batch; per-request latency is the
        # full call's wall time (the request waited for the whole batch)
        total_audio = max(sum(len(w) for w in wavs) / SAMPLE_RATE, 1e-9)
        batch_rtf = elapsed / total_audio
        return [
            SynthesisResult(wav=w, rtf=batch_rtf, latency_s=elapsed)
            for w in wavs
        ]

    def synthesise(
        self,
        text: str,
        speaker: int = 0,
        voice_mix: Sequence[tuple[int, float]] | None = None,
        **kwargs,
    ) -> SynthesisResult:
        """Raw-text entry point; requires the eSpeak host frontend."""
        from matcha_tpu.text.phonemizers import (
            emphasize_intonation_marks,
            multilingual_phonemizer,
        )

        primary = voice_mix[0][0] if voice_mix else speaker
        language = voice_by_id(primary)["lang"]
        text = emphasize_intonation_marks(text)
        _, ids = multilingual_phonemizer(text, language)
        return self.synthesise_ids(
            ids, speaker=speaker, voice_mix=voice_mix, **kwargs
        )

    def reachable_bucket_pairs(self) -> list[tuple[int, int]]:
        """Every (text_bucket, mel_fine_bucket) pair a request can hit.

        A text of n tokens lands in bucket tx iff prev_tx < n <= tx, and
        durations are floored at 1 fine frame per token, so total fine frames
        > prev_tx — mel buckets below that are unreachable.  Above that every
        mel bucket is reachable (runaway predictions are clamped into the
        largest bucket), so all must be compiled for recompile-free serving.
        """
        pairs = []
        for i, tx in enumerate(self.text_buckets):
            prev_tx = self.text_buckets[i - 1] if i else 0
            for yf in self.mel_fine_buckets:
                if yf > prev_tx:
                    pairs.append((tx, yf))
        return pairs

    def _synthetic_stage_a_args(self, tx: int, b: int):
        """The exact (ids, lengths, spk_enc, spk_dur, scale) signature the
        serving path dispatches — one definition so every warmup variant
        compiles the executables serving will actually hit.  Warm inputs
        must carry the SAME shardings as batched serving (mesh), or every
        "warmed" program is a cache miss there."""
        args = (
            jnp.zeros((b, tx), jnp.int32),
            jnp.full((b,), max(tx // 2, 2), jnp.int32),
            jnp.zeros((b, self.cfg.spk_emb_dim), jnp.float32),
            jnp.zeros((b, self.cfg.spk_emb_dim), jnp.float32),
            jnp.ones((b, 1), jnp.float32),
        )
        if self.mesh is not None:
            from matcha_tpu.parallel.mesh import shard_batch

            args = shard_batch(self.mesh, args)
        return args

    def _warm_pair(
        self, tx: int, y_fine_len: int, n_timesteps: int, solver: str, b: int = 1
    ):
        """Compile stage A for ``tx`` and stage B for (tx, y_fine_len) at
        batch size ``b`` by driving the jit caches directly with synthetic
        tensors — this hits the exact shape triple deterministically, which
        synthesise_ids cannot (its mel bucket depends on predicted
        durations)."""
        n = max(tx // 2, 2)
        args = self._synthetic_stage_a_args(tx, b)
        mu_x, durations, x_mask = self._encode_jit(self.params, *args)
        total = jnp.full((b,), min(max(n, 2), y_fine_len), jnp.int32)
        if self.mesh is not None:
            from matcha_tpu.parallel.mesh import shard_batch

            total = shard_batch(self.mesh, total)
        out = self._decode_jit(
            self.params,
            self.vocos_params,
            mu_x,
            durations,
            x_mask,
            total,
            y_fine_len=y_fine_len,
            n_timesteps=n_timesteps,
            solver=solver,
        )
        jax.block_until_ready(out)

    def warmup(
        self,
        n_timesteps: int = DEFAULT_NUM_STEPS,
        solver: str = DEFAULT_ODE_SOLVER,
        full: bool = False,
        batch_sizes: Sequence[int] = (1,),
        fused: bool = False,
        on_size_ready=None,
    ):
        """Pre-compile serving programs.

        ``fused=True`` additionally compiles the single-dispatch fused
        program for each text bucket at its predicted mel bucket (the pair
        ``synthesise_ids(fused=True)`` will request).

        ``full=True`` compiles EVERY reachable (text, mel) bucket pair —
        recompile-free serving guaranteed (pair with the persistent
        compilation cache so only the first boot pays); the default warms
        each text bucket with its most likely mel bucket (~8 fine frames per
        token) plus the smallest reachable pair.

        ``batch_sizes``: when serving through the micro-batcher, pass its
        power-of-2 group ladder (e.g. (1, 2, 4, 8)) so grouped requests hit
        pre-compiled programs too (synthesise_batch pads groups to this
        ladder).

        ``on_size_ready(b)``: progressive-warmup hook, called after EVERY
        program for group size ``b`` (bucket pairs, the fused ladder when
        ``fused``, and — after the first size only — the one-time D2H pull)
        is compiled.  At that instant a server may safely admit groups
        ≤ ``b``; full-ladder callers just ignore it.
        """
        if self.mesh is not None:
            # batched serving pads every group to a device multiple — warm
            # the same padded sizes (a b=1 shard over 8 chips cannot exist)
            n_dev = len(self.mesh.devices.flatten())
            batch_sizes = sorted({-(-b // n_dev) * n_dev for b in batch_sizes})
        if full:
            pairs = self.reachable_bucket_pairs()
        else:
            pairs = []
            for tx in self.text_buckets:
                # most-likely mel bucket at the model's pace statistic
                expect = int((tx // 2) * self.fused_frames_per_token)
                expect = min(expect, self.mel_fine_buckets[-1])  # clamp: every
                # text bucket gets a warm pair even past the mel ladder top
                pairs.append((tx, pick_bucket(expect, self.mel_fine_buckets)))
        for i, b in enumerate(batch_sizes):
            for tx, yf in pairs:
                self._warm_pair(tx, yf, n_timesteps, solver, b=b)
            if fused:
                # warm EVERY fused bucket the serving pace range can predict
                # (speed clamp [0.5, 10] → length_scale [0.1, 2.0], times the
                # voice corrections): the pace-aware prediction means a
                # length_scale=2.0 request asks for a bigger bucket than a
                # pace-1.0 one, and an unwarmed fused program would compile
                # inline mid-serving.  ~3 rungs per text bucket on the
                # default geometric ladder; the persistent jax cache makes
                # repeat boots free.
                for tx in self.text_buckets:
                    for yf in self.fused_warm_buckets(tx):
                        args = self._synthetic_stage_a_args(tx, b)
                        out = self._fused_jit(
                            self.params,
                            self.vocos_params,
                            *args,
                            y_fine_len=yf,
                            n_timesteps=n_timesteps,
                            solver=solver,
                        )
                        jax.block_until_ready(out)
            if i == 0:
                # Warm the D2H path too: the FIRST device→host pull of a
                # process can be pathologically slow on remote transports
                # (measured through the dev tunnel: 2 min bare, 9 min after
                # the ~120 MB param upload — the relay syncs state lazily on
                # first pull).  Every request performs D2H (durations,
                # waveform), so pay that one-time cost HERE — before the
                # first on_size_ready/ready flip, never on request #1.
                probe = self._encode_jit(
                    self.params,
                    *self._synthetic_stage_a_args(self.text_buckets[0], b),
                )
                np.asarray(probe[1])
            if on_size_ready is not None:
                on_size_ready(b)


def trim_trailing_silence(audio: np.ndarray, silence_threshold_db: float = -60.0) -> np.ndarray:
    """Trim trailing silence using 10 ms RMS windows (host-side).

    (reference: matcha/inference.py:268-287)
    """
    window = int(0.01 * SAMPLE_RATE)
    if len(audio) < window:
        return audio
    thresh = 10.0 ** (silence_threshold_db / 20.0)
    n_win = len(audio) // window
    rms = np.sqrt(
        np.mean(
            np.square(audio[: n_win * window].reshape(n_win, window)), axis=1
        )
    )
    silent = rms < thresh
    # count of trailing silent windows = windows past the last loud one
    loud = np.flatnonzero(~silent)
    trailing = n_win if loud.size == 0 else n_win - 1 - int(loud[-1])
    if trailing == 0:
        return audio
    return audio[: -trailing * window]

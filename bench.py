"""Headline benchmark: batched 24 kHz text->wav synthesis RTF per chip.

Headline = the fused SINGLE-dispatch serving program (SERVE_FUSED=1 —
encoder + alignment + CFM ODE + Vocos in ONE jit; the batcher dispatches
whole groups through it, hardware-parity-gated at 0.009 dB vs two-stage
in tests/test_tpu_e2e.py) at the B=16 throughput knee:

    RTF = t_fused / total_audio_seconds            (lower is better)

It also times BOTH two-stage jitted serving programs at the same point —
the per-stage decomposition, and the fallback path on fine-bucket
overflow — no synthetic intermediates:

  stage A  encoder + duration predictor   (_encode_jit)
  stage B  alignment -> CFM ODE decode (midpoint, 4 steps -> 8 U-Net evals)
           -> Vocos vocoder                (_decode_jit)

plus:
  * p50 single-utterance latency (B=1 through both stages — the number a
    lone server request sees; named in BASELINE.json's metric field)
  * an MFU estimate (XLA cost-analysis FLOPs / elapsed / v5e bf16 peak)
  * a DEVICE-time estimate per stage via the inner-repeat method: jit a
    variant whose body runs the stage K times back-to-back (sequential
    data dependency), then device_ms ~= (wall_K - wall_1) / (K - 1) —
    the fixed dispatch/transport cost cancels.  Chosen because
    jax.profiler's trace RPC HANGS through the axon remote transport
    (measured; set BENCH_TRACE=1 on a real TPU host for XPlane traces
    instead).  Set BENCH_DEVICE=0 to skip the extra compiles.
  * optional batch-scaling probe (BENCH_SCALING=1: B=1/8/16/32 RTF)

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., ...}

`vs_baseline` compares against the BASELINE.json north-star target of
RTF < 0.01 per chip (values < 1.0 beat the target).  Weights are random —
RTF is architecture/compiler work, independent of weight values.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: repeated bench runs skip the multi-minute
# first-compile (safe no-op if unsupported by the backend)
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

V5E_PEAK_FLOPS = 197e12  # bf16 peak of one v5e chip
TX, Y_FINE_LEN = 256, 1024  # production bucket: ~5.4 s of audio/utterance
ITERS = 10


def _cost_flops(jitted, *args, **kwargs) -> float:
    """XLA's analytic FLOP count for one execution (0.0 if unavailable)."""
    try:
        c = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0.0))
    except Exception:
        return 0.0


def measure(
    synth, cfg, batch, iters=ITERS, seed=0, with_flops=False,
    tx=TX, y_fine_len=Y_FINE_LEN,
):
    """Median per-stage wall time for one (batch, tx, y_fine_len) point.

    Returns a dict with encoder/decode ms, rtf, audio seconds, and the
    warm inputs so a caller can re-run the exact loops under a profiler.
    """
    rng = np.random.default_rng(seed)
    x_all = [
        jnp.asarray(rng.integers(0, 600, (batch, tx)), jnp.int32)
        for _ in range(iters + 1)
    ]
    x_lengths = jnp.full((batch,), tx, jnp.int32)
    spk_enc = jnp.zeros((batch, cfg.spk_emb_dim), jnp.float32)
    spk_dur = jnp.zeros((batch, cfg.spk_emb_dim), jnp.float32)
    scale = jnp.ones((batch, 1), jnp.float32)  # production (B,1) signature

    def run_a(x):
        return synth._encode_jit(
            synth.params, x, x_lengths, spk_enc, spk_dur, scale
        )

    mu_x, durations, x_mask = run_a(x_all[-1])  # warmup/compile
    # warm the checksum program too (slice+sum is its own tiny XLA program;
    # through the remote-compile tunnel even that costs seconds on first use)
    _ = float(jnp.sum(durations[:, :8]))

    checksum = 0.0
    times_a = []
    for i in range(iters):
        t0 = time.perf_counter()
        _, dur_i, _ = run_a(x_all[i])
        checksum += float(jnp.sum(dur_i[:, :8]))  # force exec + D2H per iter
        times_a.append(time.perf_counter() - t0)

    totals = jnp.minimum(
        jnp.sum(durations, axis=1).astype(jnp.int32), y_fine_len
    )

    def run_b(mu):
        _, wav, _ = synth._decode_jit(
            synth.params,
            synth.vocos_params,
            mu,
            durations,
            x_mask,
            totals,
            y_fine_len=y_fine_len,
            n_timesteps=4,
            solver="midpoint",
        )
        return wav

    w = run_b(mu_x)  # warmup/compile
    _ = float(jnp.sum(w[:, :8]))

    times_b = []
    for i in range(iters):
        t0 = time.perf_counter()
        # vary input per iter so the tunnel cannot dedupe executions
        wav = run_b(mu_x + jnp.float32(i) * 1e-6)
        checksum += float(jnp.sum(wav[:, :8]))  # force exec + D2H per iter
        times_b.append(time.perf_counter() - t0)

    # median: robust to transport stragglers (tunnel round-trips vary 2x)
    elapsed_a = float(np.median(times_a))
    elapsed_b = float(np.median(times_b))
    coarse_frames = y_fine_len // 2
    audio_seconds = batch * (coarse_frames - 1) * 256 / 24000
    out = {
        "batch": batch,
        "encoder_ms": round(elapsed_a * 1e3, 3),
        "decode_vocoder_ms": round(elapsed_b * 1e3, 3),
        "total_ms": round((elapsed_a + elapsed_b) * 1e3, 3),
        "audio_seconds": round(audio_seconds, 2),
        "rtf": (elapsed_a + elapsed_b) / audio_seconds,
        "_rerun": (run_a, run_b, x_all, mu_x),  # for the profiler pass
        "_inputs": {  # for the inner-repeat device probe
            "x": x_all[0], "x_lengths": x_lengths, "spk_enc": spk_enc,
            "spk_dur": spk_dur, "scale": scale, "mu_x": mu_x,
            "durations": durations, "x_mask": x_mask, "totals": totals,
            "y_fine_len": y_fine_len,
        },
    }
    if with_flops:
        out["flops"] = _cost_flops(
            synth._encode_jit, synth.params, x_all[0], x_lengths, spk_enc,
            spk_dur, scale,
        ) + _cost_flops(
            synth._decode_jit,
            synth.params,
            synth.vocos_params,
            mu_x,
            durations,
            x_mask,
            totals,
            y_fine_len=y_fine_len,
            n_timesteps=4,
            solver="midpoint",
        )
    return out


def measure_fused(
    synth, cfg, batch=1, iters=ITERS, seed=2, tx=TX, y_fine_len=None,
    with_flops=False,
):
    """Median wall time of the SINGLE-dispatch fused path (SERVE_FUSED).

    Same work as stage A + stage B but one program / one transport
    round-trip — the number a request sees with SERVE_FUSED=1 (the
    batcher dispatches whole groups through this program too, so it is
    equally the batched serving point).  ``y_fine_len=None`` uses the
    server's own bucket prediction for ``tx``; pass an explicit bucket
    to pin the audio accounting to a two-stage comparison point.
    """
    rng = np.random.default_rng(seed)
    x_all = [
        jnp.asarray(rng.integers(0, 600, (batch, tx)), jnp.int32)
        for _ in range(iters + 1)
    ]
    x_lengths = jnp.full((batch,), tx, jnp.int32)
    spk_enc = jnp.zeros((batch, cfg.spk_emb_dim), jnp.float32)
    spk_dur = jnp.zeros((batch, cfg.spk_emb_dim), jnp.float32)
    scale = jnp.ones((batch, 1), jnp.float32)
    if y_fine_len is None:
        y_fine_len = synth.predict_fine_bucket(tx)

    def run(x):
        _, wav, total = synth._fused_jit(
            synth.params, synth.vocos_params, x, x_lengths, spk_enc,
            spk_dur, scale, y_fine_len=y_fine_len, n_timesteps=4,
            solver="midpoint",
        )
        return wav, total

    wav, total = run(x_all[-1])  # warmup/compile
    s0, t0_ = jax.device_get((jnp.sum(wav[:, :8]), total))
    _ = float(s0) + int(t0_[0])

    checksum, times = 0.0, []
    for i in range(iters):
        t0 = time.perf_counter()
        wav, total = run(x_all[i])
        # force exec + the same D2H pattern serving does: ONE overlapped
        # device_get carrying both outputs (inference.py::_pull_together
        # pulls (total, wav) in a single transport round-trip; round 5 —
        # previously two serialized pulls, each a full tunnel RTT)
        s, t = jax.device_get((jnp.sum(wav[:, :8]), total))
        checksum += float(s) + int(t[0])
        times.append(time.perf_counter() - t0)

    elapsed = float(np.median(times))
    audio_seconds = batch * (y_fine_len // 2 - 1) * 256 / 24000
    out = {
        "batch": batch,
        "total_ms": round(elapsed * 1e3, 3),
        "rtf": elapsed / audio_seconds,
        "y_fine_len": y_fine_len,
    }
    if with_flops:
        out["flops"] = _cost_flops(
            synth._fused_jit, synth.params, synth.vocos_params, x_all[0],
            x_lengths, spk_enc, spk_dur, scale, y_fine_len=y_fine_len,
            n_timesteps=4, solver="midpoint",
        )
    return out


def device_probe(synth, point, k=4, reps=5):
    """Inner-repeat device-time estimate per stage (no profiler needed).

    Jits a variant of each stage whose body executes the stage K times
    back-to-back with a sequential data dependency (iteration i's scalar
    output perturbs iteration i+1's input, so XLA cannot overlap or CSE
    them) and returns only a scalar.  Fixed per-dispatch costs (host work,
    transport round-trip, output D2H) are identical between the n=1 and
    n=K programs, so

        device_ms ~= (wall_K - wall_1) / (K - 1)
        fixed_ms  ~= wall_1 - device_ms

    (method + honesty rules: matcha_tpu/utils/probe.py, shared with
    tools/profile_stage_b.py)
    """
    from matcha_tpu.utils.probe import inner_repeat

    i = point["_inputs"]
    x, x_lengths = i["x"], i["x_lengths"]
    spk_enc, spk_dur, scale = i["spk_enc"], i["spk_dur"], i["scale"]
    mu_x, durations, x_mask = i["mu_x"], i["durations"], i["x_mask"]
    totals, y_fine_len = i["totals"], i["y_fine_len"]

    # the per-iteration scalar must consume EVERY stage output in full:
    # summing a slice (or dropping `dur`) lets XLA dead-code-eliminate the
    # untouched work — e.g. wav[:, 0] needs only a few mel frames through
    # the ISTFT, so the Vocos decode would vanish from the "measurement"
    def body_a(acc, params):
        mu, dur, _ = synth._encode(
            params, x, x_lengths, spk_enc + acc, spk_dur, scale
        )
        return (jnp.sum(mu.astype(jnp.float32)) + jnp.sum(dur)) * 1e-12

    def body_b(acc, params, vparams):
        _, wav, _ = synth._decode(
            params, vparams, mu_x + acc, durations, x_mask, totals,
            y_fine_len=y_fine_len, n_timesteps=4, solver="midpoint",
        )
        return jnp.sum(wav.astype(jnp.float32)) * 1e-12

    out = {}
    for name, fn, args in (
        ("encode", body_a, (synth.params,)),
        ("decode", body_b, (synth.params, synth.vocos_params)),
    ):
        r = inner_repeat(fn, *args, k=k, reps=reps)
        out[f"device_{name}_ms"] = r["device_ms"]
        out[f"fixed_overhead_{name}_ms"] = r["fixed_ms"]
    out["method"] = f"inner-repeat k={k} (device_ms = (wall_k-wall_1)/(k-1))"
    return out


def device_breakdown(point, iters=5, logdir="/tmp/bench_trace"):
    """Re-run the warm stage loops under jax.profiler and split device
    busy time per stage (XPlane 'XLA Modules' lines).  Returns None when
    the profiler or trace parsing is unavailable (e.g. a transport that
    does not forward device traces)."""
    import shutil

    run_a, run_b, x_all, mu_x = point["_rerun"]
    shutil.rmtree(logdir, ignore_errors=True)
    try:
        jax.profiler.start_trace(logdir)
        t0 = time.perf_counter()
        for i in range(iters):
            _, dur_i, _ = run_a(x_all[i])
            _ = float(jnp.sum(dur_i[:, :8]))
        t1 = time.perf_counter()
        for i in range(iters):
            wav = run_b(mu_x + jnp.float32(i) * 1e-6)
            _ = float(jnp.sum(wav[:, :8]))
        t2 = time.perf_counter()
        jax.profiler.stop_trace()

        from matcha_tpu.utils.trace_analysis import device_stats

        stats = device_stats(logdir)
        # attribute modules to stages by name (jit(_encode) / jit(_decode));
        # anything else (checksum slices) is counted as "other"
        per_stage = {"encode": 0.0, "decode": 0.0, "other": 0.0}
        for name, m in stats["modules"].items():
            if "_encode" in name:
                per_stage["encode"] += m["ms"]
            elif "_decode" in name:
                per_stage["decode"] += m["ms"]
            else:
                per_stage["other"] += m["ms"]
        return {
            "device_encode_ms": round(per_stage["encode"] / iters, 3),
            "device_decode_ms": round(per_stage["decode"] / iters, 3),
            "device_other_ms": round(per_stage["other"] / iters, 3),
            "wall_encode_ms": round((t1 - t0) / iters * 1e3, 3),
            "wall_decode_ms": round((t2 - t1) / iters * 1e3, 3),
            "trace_iters": iters,
        }
    except Exception as exc:  # tracing must never break the bench
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass
        return {"error": f"{type(exc).__name__}: {exc}"}


def pick_headline(two_stage_rtf, two_stage_flops, two_stage_ms, fused16):
    """Headline = the fused single-dispatch point when it measured cleanly;
    the two-stage point otherwise (fused16 may be None when BENCH_FUSED=0,
    or an {"error": ...} dict — the headline must never die on the fused
    probe).  Returns (rtf, path_label, mfu, mfu_flops_source) — the source
    label says which program's cost analysis supplied the MFU numerator
    (the fused program's own count, or the two-stage fallback when XLA
    reported 0 for the fused executable).  Mutates fused16 only to pop its
    'flops' (kept out of the printed JSON)."""
    if isinstance(fused16, dict) and "rtf" in fused16:
        rtf = fused16["rtf"]
        path = "fused_single_dispatch_b16"
        fused_flops = fused16.pop("flops", 0.0)
        mfu_flops = fused_flops or two_stage_flops
        mfu_src = "fused" if fused_flops else "two_stage"
        mfu_ms = fused16["total_ms"]
    else:
        rtf, path = two_stage_rtf, "two_stage_b16"
        mfu_flops, mfu_ms = two_stage_flops, two_stage_ms
        mfu_src = "two_stage"
    mfu = (
        mfu_flops / (mfu_ms / 1e3) / V5E_PEAK_FLOPS if mfu_flops else None
    )
    return rtf, path, mfu, mfu_src


def main():
    import dataclasses

    from matcha_tpu.utils.backend_wait import wait_for_backend

    wait_for_backend()

    from matcha_tpu.inference import MatchaSynthesizer
    from matcha_tpu.models.config import MatchaConfig
    from matcha_tpu.models.matcha import init_params
    from matcha_tpu.vocoder.vocos import VocosConfig, init_vocos_params

    # production serving operating point: bf16 activations (the reference
    # serves under torch.autocast bf16 too) with fp32 quality islands
    cfg = dataclasses.replace(MatchaConfig(), compute_dtype="bfloat16")
    vocos_cfg = VocosConfig(compute_dtype="bfloat16")
    params = init_params(cfg, jax.random.PRNGKey(0))
    vocos_params = init_vocos_params(jax.random.PRNGKey(1), vocos_cfg)
    synth = MatchaSynthesizer(cfg, params, vocos_params, vocos_cfg)

    # two-stage B=16: the per-stage decomposition (and the device probe's
    # measurement point) — B=16 is the throughput knee (scaling probe below)
    head = measure(synth, cfg, batch=16, with_flops=True)
    target = 0.01  # BASELINE.json north star: RTF < 0.01 per v5e chip
    flops = head.pop("flops", 0.0)
    two_stage_rtf = head["rtf"]

    # headline: the SAME B=16 point through the fused single-dispatch
    # program (SERVE_FUSED=1 — the batcher dispatches whole groups through
    # it; hardware-parity-gated at 0.009 dB vs two-stage in
    # tests/test_tpu_e2e.py).  One program = one transport round-trip,
    # which is most of the two-stage wall gap.  Pinned to the two-stage
    # bucket (Y_FINE_LEN) so the audio accounting is identical.
    fused16 = None
    if os.environ.get("BENCH_FUSED", "1") != "0":
        try:
            fused16 = measure_fused(
                synth, cfg, batch=16, seed=3, y_fine_len=Y_FINE_LEN,
                with_flops=True,
            )
        except Exception as exc:  # never break the headline
            fused16 = {"error": f"{type(exc).__name__}: {exc}"}
    rtf, headline_path, mfu, mfu_src = pick_headline(
        two_stage_rtf, flops, head["total_ms"], fused16
    )

    # p50 single-utterance latency: one request, both stages
    lat = measure(synth, cfg, batch=1, seed=1)
    # ... and through the fused single-dispatch program (SERVE_FUSED=1):
    # same work, half the fixed transport cost
    fused = None
    if os.environ.get("BENCH_FUSED", "1") != "0":
        try:
            fused = measure_fused(synth, cfg, batch=1)
        except Exception as exc:  # never break the headline
            fused = {"error": f"{type(exc).__name__}: {exc}"}

    device = None
    if os.environ.get("BENCH_DEVICE", "1") != "0":
        try:
            device = device_probe(synth, head)
        except Exception as exc:  # probing must never break the bench
            device = {"error": f"{type(exc).__name__}: {exc}"}
    if os.environ.get("BENCH_TRACE") == "1":
        # XPlane traces: real TPU hosts only — the profiler RPC hangs
        # through the axon remote transport
        device = {**(device or {}), "trace": device_breakdown(head)}

    scaling = None
    if os.environ.get("BENCH_SCALING") == "1":
        scaling = {}
        for b in (1, 8, 16, 32):
            p = (
                head if b == 16
                else lat if b == 1
                else measure(synth, cfg, batch=b, seed=b)
            )
            scaling[str(b)] = {
                "rtf": round(p["rtf"], 6), "total_ms": p["total_ms"]
            }

    for p in (head, lat):
        p.pop("_rerun", None)
        p.pop("_inputs", None)
    head.pop("rtf", None)
    result = {
        "metric": "batched_synthesis_rtf_per_chip",
        "value": round(rtf, 6),
        "unit": "rtf",
        "vs_baseline": round(rtf / target, 4),
        "headline_path": headline_path,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "mfu_flops_source": mfu_src,
        "latency_p50_b1_ms": lat["total_ms"],
        "latency_p50_b1_fused_ms": (
            fused.get("total_ms") if isinstance(fused, dict) else None
        ),
        "fused_b16": fused16,
        "two_stage_b16_rtf": round(two_stage_rtf, 6),
        "stage_breakdown": {
            **head,
            "tflops_per_call": round(flops / 1e12, 3) if flops else None,
        },
        "device_breakdown": device,
        "fused_b1": fused,
    }
    if scaling is not None:
        result["batch_scaling"] = scaling
    print(json.dumps(result))


if __name__ == "__main__":
    main()

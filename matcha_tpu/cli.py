"""Synthesis CLI: ``python -m matcha_tpu.cli --text ... --spk 0,1``.

Same surface as the reference CLI (reference: matcha/cli.py:27-159): writes
``speaker_NNN.wav`` (+ ``.mp3``), prints RTF per synthesis, debug mode also
dumps per-phoneme durations to TSV.
"""

from __future__ import annotations

import argparse
import sys
import wave
from pathlib import Path

import numpy as np

from matcha_tpu.inference import (
    DEFAULT_NUM_STEPS,
    DEFAULT_ODE_SOLVER,
    SAMPLE_RATE,
    MatchaSynthesizer,
    voice_by_id,
)


def write_wav(path: Path, wav: np.ndarray, sample_rate: int = SAMPLE_RATE):
    pcm = (np.clip(wav, -1.0, 1.0) * 32767.0).astype("<i2")
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())


def load_synthesizer(
    checkpoint_path: str, vocoder_path: str | None, **synth_kwargs
) -> MatchaSynthesizer:
    """Checkpoint dir (+ optional Vocos pickle) → ready synthesizer.

    ``synth_kwargs`` (text_buckets, mel_fine_buckets, mesh, ...) pass
    through to MatchaSynthesizer so callers construct it exactly once —
    the constructor pins the full weight set on device, which must not be
    paid twice.
    """
    from matcha_tpu.train.checkpoint import load_checkpoint
    from matcha_tpu.vocoder.vocos import VocosConfig

    tree, cfg = load_checkpoint(checkpoint_path)
    vocos_params = None
    vocos_cfg = VocosConfig()
    if vocoder_path:
        import pickle

        with open(vocoder_path, "rb") as f:
            vocos_params = pickle.load(f)
        vocos_cfg = infer_vocos_config(vocos_params)
    return MatchaSynthesizer(
        cfg, tree["params"], vocos_params, vocos_cfg, **synth_kwargs
    )


def infer_vocos_config(params) -> "VocosConfig":
    """Read the VocosConfig off a converted param-tree pickle's shapes.

    The pickle (tools/convert_vocos.py) stores only params, so the widths
    come from the tree itself: embed kernel (7, input_channels, dim),
    pwconv1 kernel (dim, intermediate_dim), head out kernel
    (dim, n_fft + 2), convnext{i} count = num_layers.  Keeps any-width
    vocoders (tests, distilled variants) loadable without a sidecar
    config; defaults cover the non-shape fields (hop, sample rate).
    """
    from matcha_tpu.vocoder.vocos import VocosConfig

    bb = params["backbone"]
    k_embed = bb["embed"]["kernel"].shape  # (7, in_ch, dim)
    n_layers = sum(1 for k in bb if k.startswith("convnext"))
    k_pw1 = bb["convnext0"]["pwconv1"]["kernel"].shape  # (dim, intermediate)
    n_fft = params["head"]["out"]["kernel"].shape[-1] - 2
    return VocosConfig(
        input_channels=int(k_embed[1]),
        dim=int(k_embed[2]),
        intermediate_dim=int(k_pw1[1]),
        num_layers=n_layers,
        n_fft=int(n_fft),
    )


def main(argv=None):
    parser = argparse.ArgumentParser(description="MatchaTTS-24k TPU synthesis")
    group = parser.add_mutually_exclusive_group(required=True)
    group.add_argument("--text")
    group.add_argument(
        "--phoneme_ids",
        help="comma-separated pretokenized IDs (skips the eSpeak frontend)",
    )
    parser.add_argument("--checkpoint_path", required=True)
    parser.add_argument("--vocoder_path", default=None, help="converted Vocos params pickle")
    parser.add_argument("--spk", default="0", help="comma-separated speaker ids")
    parser.add_argument("--steps", type=int, default=DEFAULT_NUM_STEPS)
    parser.add_argument("--solver", default=DEFAULT_ODE_SOLVER)
    parser.add_argument("--length_scale", type=float, default=1.0)
    parser.add_argument("--output_dir", default=".")
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args(argv)

    synth = load_synthesizer(args.checkpoint_path, args.vocoder_path)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    for spk_str in args.spk.split(","):
        spk = int(spk_str)
        kwargs = dict(
            speaker=spk,
            n_timesteps=args.steps,
            solver=args.solver,
            length_scale=args.length_scale,
            debug=args.debug,
        )
        if args.text is not None:
            result = synth.synthesise(args.text, **kwargs)
        else:
            ids = [int(t) for t in args.phoneme_ids.split(",")]
            result = synth.synthesise_ids(ids, **kwargs)
        name = f"speaker_{spk:03d}"
        if len(result.wav):
            write_wav(out_dir / f"{name}.wav", result.wav)
            try:
                from matcha_tpu.utils.mp3_converter import waveform_to_mp3

                (out_dir / f"{name}.mp3").write_bytes(waveform_to_mp3(result.wav))
            except Exception as exc:  # mp3 is best-effort
                print(f"[!] mp3 encode failed: {exc}", file=sys.stderr)
        if args.debug and result.durations is not None:
            with open(out_dir / f"{name}_durations.tsv", "w") as f:
                for i, d in enumerate(result.durations):
                    f.write(f"{i}\t{float(d):.2f}\n")
        if args.debug and result.encoder_wav is not None:
            write_wav(out_dir / f"{name}_encoder.wav", result.encoder_wav)
        voice = voice_by_id(spk)["name"] if spk < 15 else str(spk)
        print(f"[+] {name} ({voice}): {len(result.wav)/SAMPLE_RATE:.2f}s  RTF={result.rtf:.4f}")


if __name__ == "__main__":
    main()

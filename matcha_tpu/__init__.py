"""Matcha-TTS-24k TPU: TPU-native OT-CFM speech synthesis (JAX/XLA/Pallas).

Public API surface:
    matcha_tpu.models   — MatchaTTS, StyleEncoder, configs
    matcha_tpu.inference — MatchaSynthesizer, VOICES
    matcha_tpu.train    — Trainer, checkpointing, optimizers
    matcha_tpu.serving  — HTTP server + request batcher

CLI entry points (python -m …): matcha_tpu.train, matcha_tpu.cli,
matcha_tpu.serving.server, matcha_tpu.finetune_speaker,
matcha_tpu.train_style_encoder, matcha_tpu.add_speaker, and the
matcha_tpu.utils.* corpus/eval tools.
"""

__version__ = "0.1.0"

"""Model layer: blocks, stacks and top-level TTS models."""

from transformer_tts_tpu.models.fastspeech2 import FastSpeech2  # noqa: F401

"""Inference layer: NAR and scan-based AR synthesis."""

from transformer_tts_tpu.infer.synthesize import (  # noqa: F401
    synthesize_fastspeech2, synthesize_transformer_tts, denormalize)

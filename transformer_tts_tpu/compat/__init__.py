"""Compatibility layer: import PyTorch reference checkpoints."""

from transformer_tts_tpu.compat.torch_import import (  # noqa: F401
    convert_fastspeech2_state_dict, load_reference_checkpoint)

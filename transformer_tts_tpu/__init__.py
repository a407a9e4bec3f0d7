"""TPU-native Transformer-TTS / FastSpeech 2 framework.

A brand-new JAX/XLA/Pallas/pjit re-design of the capabilities of the PyTorch
research codebase ``syoamakase/Transformer_TTS`` (see ``/root/reference``):

* Autoregressive Transformer-TTS (encoder-decoder, stop-token head, causal
  convolutional postnet, GST style tokens, multi-speaker conditioning), with
  inference as a jit-scanned incremental decode with a KV cache.
* Non-autoregressive FastSpeech 2 (Transformer/Conformer encoders, variance
  adaptor with duration/pitch/energy prediction and a *vectorized* length
  regulator) plus the SQ-VAE variant and the mel-to-mel post-processing
  models (PostLowEnergy v1/v2).
* Python-file hparams configs, pipe-separated data scripts with npy/HTK mel
  features, mean/var normalization, length-bucketed batching with static
  bucket shapes, Noam/RAdam optimization, per-epoch checkpointing with
  checkpoint averaging, and train/synthesize/teacher-forcing CLIs.

Everything compiles to static-shaped XLA programs; data parallelism is a
1-D ``jax.sharding.Mesh`` with collectives inserted by the compiler.
"""

__version__ = "0.1.0"

from transformer_tts_tpu.config import HParams  # noqa: F401

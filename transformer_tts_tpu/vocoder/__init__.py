"""Neural vocoder (mel -> waveform), beyond-parity subsystem.

The reference stops at ``.npy`` mel files and tells the user to run an
external vocoder (reference README.md: synthesis produces mels only; the
only in-repo vocoder artifact is the unused ``Mel2MagnitudeDataset`` stub,
``datasets/datasets_transformer.py:227-255``). This subpackage closes that
gap natively: a HiFi-GAN-family generator + GAN training loop, designed
TPU-first (NLC layout, subpixel upsampling that lowers to MXU matmuls,
bf16 compute, one fully-jitted G+D train step).
"""

from transformer_tts_tpu.vocoder.generator import (
    HiFiGANGenerator, ISTFTVocoder)
from transformer_tts_tpu.vocoder.discriminator import (
    MultiPeriodDiscriminator, MultiScaleDiscriminator)

__all__ = [
    "HiFiGANGenerator", "MultiPeriodDiscriminator",
    "MultiScaleDiscriminator",
]

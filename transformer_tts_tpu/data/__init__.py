"""Data layer: script parsing, feature IO, bucketed batching, samplers."""

from transformer_tts_tpu.data.dataset import TTSDataset  # noqa: F401
from transformer_tts_tpu.data.sampler import (  # noqa: F401
    LengthsBatchSampler, NumBatchSampler, shard_batches)
from transformer_tts_tpu.data.batching import collate, pick_bucket  # noqa: F401
from transformer_tts_tpu.data.loader import DataLoader  # noqa: F401

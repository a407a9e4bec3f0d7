"""Pure-function compute ops (jnp + Pallas) shared by all models."""

from transformer_tts_tpu.ops.masks import (  # noqa: F401
    pad_mask,
    no_peek_mask,
    band_mask,
    create_masks,
    mask_from_lengths,
)
from transformer_tts_tpu.ops.length_regulator import (  # noqa: F401
    length_regulate,
    durations_from_log,
)

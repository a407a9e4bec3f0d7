"""Device-mesh / sharding layer (the reference's DDP+NCCL equivalent)."""

from transformer_tts_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicated, shard_batch)
from transformer_tts_tpu.parallel.tp import (  # noqa: F401
    param_shardings, shard_state_tp)

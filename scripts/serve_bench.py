"""Serving-engine throughput at the parity config (honest clock).

Saves a random-init parity-config FastSpeech2 checkpoint to a temp dir,
loads it through the real TTSEngine path (restore -> AOT warmup), and
measures batched synthesis throughput: utterances/sec and synthesized
audio seconds per wall second (the serving-side "inverse RTF") for
batch sizes 1/4/8/16 at the 128-phone bucket.

Run: python scripts/serve_bench.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAME_SECONDS = 256 / 22050.0


def main():
    from transformer_tts_tpu.bench_utils import (
        enable_compilation_cache)
    enable_compilation_cache()
    import jax
    from transformer_tts_tpu.bench_utils import slope_time
    from transformer_tts_tpu.config import HParams
    from transformer_tts_tpu.infer.engine import TTSEngine
    from transformer_tts_tpu.train import checkpoint as ckpt
    from transformer_tts_tpu.train.trainer import init_fastspeech2_state

    tmp = tempfile.mkdtemp(prefix="serve_bench_")
    hp = HParams(amp=True, batch_size=8)
    _, state = init_fastspeech2_state(hp, jax.random.PRNGKey(0))
    ckpt.save_checkpoint(tmp, state, 1, with_optimizer=False)
    with open(os.path.join(tmp, "hparams.py"), "w") as fh:
        fh.write("amp = True\nbatch_size = 8\n")

    rs = np.random.RandomState(0)
    bucket = 128
    texts = [list(rs.randint(1, hp.vocab_size, bucket)) for _ in range(64)]

    for bs in (1, 4, 8, 16):
        engine = TTSEngine(tmp, batch_size=bs, frames_per_phone=6,
                           text_buckets=(bucket,))
        engine.warmup()

        def chain(k):
            total = 0.0
            for i in range(k):
                results = engine.synthesize(texts[:bs])
                total += sum(float(r["mel"].sum()) for r in results)
            return total

        chain(1)
        tm = slope_time(chain, 8, repeats=7)
        per_batch = tm.per_iter
        audio_s = bs * bucket * 6 * FRAME_SECONDS   # frames requested
        print(f"batch {bs:3d}: {per_batch * 1e3:7.2f} ms/batch  "
              f"{bs / per_batch:7.1f} utt/s  "
              f"{audio_s / per_batch:8.1f} audio-s/wall-s", flush=True)


if __name__ == "__main__":
    main()

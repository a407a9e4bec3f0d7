"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: FastSpeech2 batch-1 NAR synthesis RTF on the parity
config (d_model 384, 6+6 layers, 4 heads, mel 80 — utils/default.yaml),
measured as jitted-forward wall time / synthesized audio seconds
(22.05 kHz, hop 256 — LJSpeech framing, BASELINE.json config #1).
Durations are teacher-forced to a realistic 6 frames/phone so the mel
length (and thus the audio denominator) is defined for an untrained net.

Also reported (extra keys in the same JSON object): training-step
throughput in mel frames/sec/chip on a frame-budget batch, matching
BASELINE.md's metrics of record.

vs_baseline: target RTF is 0.01 (BASELINE.md north-star); the ratio
reported is target/measured, so > 1.0 beats the target.
"""

from __future__ import annotations

import json
import time

import numpy as np


FRAME_SECONDS = 256 / 22050.0     # LJSpeech hop/sr
TARGET_RTF = 0.01                 # BASELINE.md


def main():
    import jax
    import jax.numpy as jnp
    from transformer_tts_tpu.config import HParams
    from transformer_tts_tpu.ops.masks import create_masks
    from transformer_tts_tpu.train.trainer import (
        init_fastspeech2_state, make_fastspeech2_train_step)

    hp = HParams(amp=True, batch_size=16)
    rng = jax.random.PRNGKey(0)
    model, state = init_fastspeech2_state(hp, rng)

    # ---------------- synthesis RTF (batch=1) ----------------
    l, t = 128, 768               # 128 phones x 6 frames -> ~8.9 s audio
    rs = np.random.RandomState(0)
    text = jnp.asarray(rs.randint(1, hp.vocab_size, (1, l)).astype(np.int32))
    pos_text = jnp.tile(jnp.arange(1, l + 1)[None], (1, 1))
    src_mask, _ = create_masks(pos_text, None)
    d_target = jnp.full((1, l), t // l, jnp.int32)

    @jax.jit
    def synth(params, batch_stats, text, src_mask, d_target):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats, "vq_stats": {}},
            text, src_mask, t, d_target, train=False)
        return out.mel_post

    mel = synth(state.params, state.batch_stats, text, src_mask, d_target)
    mel.block_until_ready()       # compile
    n_iter = 50
    t0 = time.perf_counter()
    for _ in range(n_iter):
        mel = synth(state.params, state.batch_stats, text, src_mask,
                    d_target)
    mel.block_until_ready()
    synth_time = (time.perf_counter() - t0) / n_iter
    audio_seconds = t * FRAME_SECONDS
    rtf = synth_time / audio_seconds

    # ---------------- training throughput ----------------
    b, lt, tt = 32, 64, 1024      # 32768 mel frames per step
    batch = {
        "text": jnp.asarray(
            rs.randint(1, hp.vocab_size, (b, lt)).astype(np.int32)),
        "pos_text": jnp.tile(jnp.arange(1, lt + 1)[None], (b, 1)),
        "mel": jnp.asarray(rs.randn(b, tt, hp.mel_dim).astype(np.float32)),
        "pos_mel": jnp.tile(jnp.arange(1, tt + 1)[None], (b, 1)),
        "alignment": jnp.full((b, lt), tt // lt, jnp.int32),
        "f0": jnp.asarray(rs.rand(b, tt).astype(np.float32) * 300),
        "energy": jnp.asarray(rs.rand(b, tt).astype(np.float32) * 100),
    }
    step_fn = make_fastspeech2_train_step(model, hp, donate=False)
    step_rng = jax.random.PRNGKey(1)
    state2, logs = step_fn(state, batch, step_rng)     # compile
    jax.block_until_ready(logs["loss_total"])
    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state2, logs = step_fn(state2, batch, step_rng)
    jax.block_until_ready(logs["loss_total"])
    step_time = (time.perf_counter() - t0) / n_steps
    frames_per_sec = (b * tt) / step_time

    # ---------------- AR Transformer-TTS synthesis RTF ----------------
    # KV-cached incremental decode; the reference's loop re-forwards the
    # whole prefix each step (test.py:158-184). Untrained stop heads never
    # fire, so this measures the worst case: all max_steps decoded.
    from transformer_tts_tpu.infer.synthesize import (
        synthesize_transformer_tts)
    from transformer_tts_tpu.train.trainer import init_transformer_state
    hp_ar = HParams(model="Transformer", amp=True, batch_size=8,
                    reduction_rate=2)
    ar_model, ar_state = init_transformer_state(hp_ar, rng)
    ar_vars = {"params": ar_state.params,
               "batch_stats": ar_state.batch_stats}
    ar_steps = 250                       # 500 frames at r=2
    ar_text = jnp.asarray(
        rs.randint(1, hp_ar.vocab_size, (1, l)).astype(np.int32))
    ar_pos = jnp.tile(jnp.arange(1, l + 1)[None], (1, 1))
    # stop_threshold > 1 forces a full-length decode (untrained stop
    # heads would otherwise fire immediately)
    mel_ar, _ = synthesize_transformer_tts(
        ar_model, ar_vars, ar_text, ar_pos, max_steps=ar_steps,
        stop_threshold=2.0)
    mel_ar.block_until_ready()           # compile
    n_ar = 3
    t0 = time.perf_counter()
    for _ in range(n_ar):
        mel_ar, _ = synthesize_transformer_tts(
            ar_model, ar_vars, ar_text, ar_pos, max_steps=ar_steps,
            stop_threshold=2.0)
    mel_ar.block_until_ready()
    ar_time = (time.perf_counter() - t0) / n_ar
    ar_frames = ar_steps * hp_ar.reduction_rate
    ar_rtf = ar_time / (ar_frames * FRAME_SECONDS)

    print(json.dumps({
        "metric": "fastspeech2_synthesis_rtf",
        "value": round(rtf, 6),
        "unit": "rtf",
        "vs_baseline": round(TARGET_RTF / rtf, 3),
        "synth_ms_per_utt": round(synth_time * 1000, 3),
        "train_mel_frames_per_sec_per_chip": round(frames_per_sec, 1),
        "train_step_ms": round(step_time * 1000, 2),
        "ar_synthesis_rtf": round(ar_rtf, 5),
        "ar_ms_per_step": round(ar_time / ar_steps * 1000, 3),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()

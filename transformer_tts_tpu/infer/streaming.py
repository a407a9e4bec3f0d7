"""Streaming synthesis: incremental audio delivery (time-to-first-audio).

No reference counterpart — the reference's synthesis scripts
(test.py:128-192, test_fastspeech2.py:146-204) write one .npy per
utterance after the full forward finishes. A production server wants the
first audio chunk flowing while the rest of the utterance is still being
decoded/vocoded. Two building blocks, both EXACT (the streamed samples
equal the one-shot pipeline's output; tests assert it):

* :class:`StreamingVocoder` — windowed chunked vocoding. Every conv in
  the HiFi-GAN generator is SAME-padded, so a window with ``overlap``
  frames of context on each side, trimmed by ``overlap`` after vocoding,
  reproduces the one-shot output wherever the window interior lies inside
  the signal; windows flush with the buffer edges reproduce the edges.
  ``overlap`` must be >= the generator's receptive field in mel frames
  (:func:`receptive_field_frames`, computed from the config).
  All windows share ONE static shape -> one compiled signature.

* :class:`ARStream` — the KV-cached AR decode (synthesize.py) split into
  fixed-size jitted segments. The while_loop body is the exact same
  ``_ar_body``; the causal postnet (POSTNET_LOOKBACK groups) is applied
  over a sliding lookback window, which is exact because every conv in it
  is left-padded causal. Yields denormalized fp32 mel chunks as they are
  decoded.

The two compose in :meth:`TTSEngine.synthesize_streaming` (engine.py):
AR mel chunks feed a vocoder session that emits wav chunks as soon as
each window's context has settled.
"""

from __future__ import annotations

import functools
import math
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from transformer_tts_tpu.models.transformer_tts import TransformerTTS
from transformer_tts_tpu.ops.masks import pad_mask
from transformer_tts_tpu.infer.synthesize import (
    MAX_AR_STEPS, POSTNET_LOOKBACK, _ar_body, _ar_check, _ar_init)


# --------------------------------------------------------------------------
# vocoder streaming
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("gen",))
def vocode_pinned(gen, variables, mel):
    """fp32-matmul-pinned vocoder apply with a process-wide jit cache.

    Module-level so every StreamingVocoder/engine sharing the same
    ``gen`` (flax modules hash by construction args) reuses one compiled
    executable per window shape — a per-instance ``jax.jit`` closure
    would recompile on every request (measured: 31 s warm TTFA).

    The fp32 precision pin is part of the exactness contract: at DEFAULT
    precision TPU convs take bf16 passes over fp32 inputs, and
    window-vs-full-buffer shapes then round differently (~1e-3 measured
    on chip). bf16-dtype generators are unaffected (inputs already bf16).
    """
    from transformer_tts_tpu.infer.quantize import maybe_dequantize_variables
    variables = maybe_dequantize_variables(variables)
    with jax.default_matmul_precision("float32"):
        return gen.apply(variables, mel)


def receptive_field_frames(gen) -> int:
    """Receptive-field RADIUS of the generator in mel frames (ceil).

    Generators that know their own radius expose
    ``receptive_field_radius_frames`` (e.g. ISTFTVocoder, whose radius
    covers the backbone convs plus the iSTFT overlap-add span); the
    HiFiGAN computation below is the fallback.

    Computed from the architecture (generator.py): conv_pre (k=7), per
    upsample stage the upsampling conv then the worst-case MRF resblock
    chain (sequential dilated+plain conv pairs), conv_post (k=7). A conv
    of kernel k, dilation d at ``up`` output positions per mel frame
    contributes ((k-1)//2)*d / up frames. Transposed upsampling draws
    from ceil(k/(2*r))+1 input positions (conservative).
    """
    own = getattr(gen, "receptive_field_radius_frames", None)
    if own is not None:
        return int(own)
    rf = 3.0                                  # conv_pre k=7 at mel rate
    up = 1
    for i, r in enumerate(gen.upsample_rates):
        if gen.upsample_mode == "subpixel":
            rf += (gen.subpixel_kernel_size // 2) / up
        else:
            k = gen.upsample_kernel_sizes[i]
            rf += (math.ceil(k / (2 * r)) + 1) / up
        up *= r
        worst = max(
            sum(((rk - 1) // 2) * d + (rk - 1) // 2 for d in dils)
            for rk, dils in zip(gen.resblock_kernel_sizes,
                                gen.resblock_dilations))
        rf += worst / up
    rf += 3.0 / up                            # conv_post k=7
    return int(math.ceil(rf))


class StreamingVocoder:
    """Chunked vocoding over a fixed-size mel buffer, exact vs one-shot.

    ``stream(mel, length)`` yields wav chunks covering exactly
    ``[0, length * hop)`` of ``gen.apply(variables, mel)`` — the same
    trim-the-padded-buffer contract the batched engine uses
    (engine.py synthesize). One compiled signature: every window has
    static shape (B, chunk + 2*overlap, mel_dim).
    """

    def __init__(self, gen, variables, *, chunk_frames: int = 64,
                 overlap_frames: Optional[int] = None):
        self.gen = gen
        self.variables = variables
        self.hop = gen.hop_length
        rf = receptive_field_frames(gen)
        self.overlap = int(overlap_frames) if overlap_frames is not None \
            else -(-rf // 8) * 8              # round up to 8
        if self.overlap < rf:
            raise ValueError(
                f"overlap_frames={self.overlap} < receptive field {rf}: "
                "streamed chunks would differ from the one-shot vocode")
        self.chunk = int(chunk_frames)
        self.window = self.chunk + 2 * self.overlap

        # shared process-wide jit cache (see vocode_pinned): fresh
        # per-request StreamingVocoder instances must NOT recompile
        self._apply = functools.partial(vocode_pinned, gen)

    def stream(self, mel, length: Optional[int] = None
               ) -> Iterator[Tuple[int, np.ndarray]]:
        """Yield ``(start_sample, wav (B, <=chunk*hop))`` chunks.

        ``mel``: (T, mel_dim) or (B, T, mel_dim), host or device. ``T``
        should be the static padded buffer length (bucketed); ``length``
        is the number of valid frames to emit (default T).
        """
        mel = np.asarray(mel, np.float32)
        squeeze = mel.ndim == 2
        if squeeze:
            mel = mel[None]
        t_buf = mel.shape[1]
        n = int(length) if length is not None else t_buf
        n = min(n, t_buf)
        if t_buf <= self.window:
            # buffer smaller than one window: a single one-shot call
            # (its own static signature per buffer size)
            wav = np.asarray(self._apply(self.variables, jnp.asarray(mel)))
            out = wav[:, :n * self.hop]
            yield 0, (out[0] if squeeze else out)
            return
        s = 0
        while s < n:
            e = min(s + self.chunk, n)
            ws = min(max(s - self.overlap, 0), t_buf - self.window)
            win = jnp.asarray(mel[:, ws:ws + self.window])
            wav = np.asarray(self._apply(self.variables, win))
            out = wav[:, (s - ws) * self.hop:(e - ws) * self.hop]
            yield s * self.hop, (out[0] if squeeze else out)
            s = e

    def session(self, total_frames: int, batch: int = 1,
                mel_dim: Optional[int] = None) -> "VocoderSession":
        return VocoderSession(self, total_frames, batch,
                              mel_dim or self.gen.mel_dim)


class VocoderSession:
    """Incremental-feed vocoding for AR decode.

    Mel frames arrive in chunks (``feed``); a chunk of audio is emitted
    as soon as every frame its vocoder window touches has settled —
    i.e. the decode frontier has passed the window's end. Fed frames
    must be FINAL values: frames beyond a row's utterance length must
    already be zero (:class:`ARStream` chunks are — its postnet window
    masks by the latched per-row length). ``finish`` zero-masks the
    not-yet-fed/unemitted region beyond the final lengths (a safety net
    for other feeders) and flushes the tail. The concatenated emissions
    then equal the one-shot vocode of the masked buffer, trimmed to
    ``max(lengths)`` frames (callers trim rows individually).
    """

    def __init__(self, sv: StreamingVocoder, total_frames: int,
                 batch: int, mel_dim: int):
        if total_frames < sv.window:
            raise ValueError(
                f"total_frames={total_frames} < window={sv.window}; use "
                "StreamingVocoder.stream on the whole buffer instead")
        self._sv = sv
        self._buf = np.zeros((batch, total_frames, mel_dim), np.float32)
        self._frontier = 0                 # frames fed so far
        self._emitted = 0                  # frames emitted so far

    def _emit(self, e: int):
        sv = self._sv
        s = self._emitted
        ws = min(max(s - sv.overlap, 0), self._buf.shape[1] - sv.window)
        win = jnp.asarray(self._buf[:, ws:ws + sv.window])
        wav = np.asarray(sv._apply(sv.variables, win))
        self._emitted = e
        return s * sv.hop, wav[:, (s - ws) * sv.hop:(e - ws) * sv.hop]

    def feed(self, mel_chunk: np.ndarray):
        """Append (B, t, mel) frames; return the now-ready wav chunks
        as a list of ``(start_sample, wav (B, n))``."""
        mel_chunk = np.asarray(mel_chunk, np.float32)
        t = mel_chunk.shape[1]
        if self._frontier + t > self._buf.shape[1]:
            raise ValueError("fed past the session buffer")
        self._buf[:, self._frontier:self._frontier + t] = mel_chunk
        self._frontier += t
        sv = self._sv
        out = []
        t_buf = self._buf.shape[1]
        while self._emitted < t_buf:
            s = self._emitted
            ws = min(max(s - sv.overlap, 0), t_buf - sv.window)
            if ws + sv.window > self._frontier:
                break                       # window context not settled yet
            out.append(self._emit(min(s + sv.chunk, t_buf)))
        return out

    def finish(self, lengths):
        """Zero-mask beyond per-row ``lengths``, flush the tail; return
        the remaining ``(start_sample, wav)`` chunks."""
        lengths = np.asarray(lengths).reshape(-1)
        n = int(lengths.max()) if lengths.size else 0
        for b, ln in enumerate(lengths):
            self._buf[b, int(ln):] = 0.0
        out = []
        while self._emitted < n:
            out.append(self._emit(min(self._emitted + self._sv.chunk, n)))
        return out


# --------------------------------------------------------------------------
# AR streaming decode
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("model",))
def _encode_ar(model: TransformerTTS, variables, text, pos_text,
               spk_emb=None, ref_mel=None):
    from transformer_tts_tpu.infer.quantize import maybe_dequantize_variables
    variables = maybe_dequantize_variables(variables)
    src_mask = pad_mask(pos_text)
    e_outputs, _ = model.apply(
        variables, text, src_mask, spk_emb, ref_mel, train=False,
        method=TransformerTTS.encode)
    cross_kvs = model.apply(variables, e_outputs,
                            method=TransformerTTS.precompute_cross_kv)
    return e_outputs, src_mask, cross_kvs


@functools.partial(jax.jit, static_argnames=("model", "segment_steps",
                                             "stop_threshold"))
def _decode_segment(model: TransformerTTS, variables, e_outputs, src_mask,
                    spk_emb, cross_kvs, carry, *, segment_steps: int,
                    stop_threshold: float):
    """Run the decode while_loop for at most ``segment_steps`` steps."""
    from transformer_tts_tpu.infer.quantize import maybe_dequantize_variables
    variables = maybe_dequantize_variables(variables)
    max_steps = carry["groups"].shape[1]
    limit = jnp.minimum(carry["step"] + segment_steps, max_steps)
    body = _ar_body(model, variables, e_outputs, src_mask, spk_emb,
                    cross_kvs, stop_threshold)

    def cond(c):
        return jnp.logical_and(c["step"] < limit, ~jnp.all(c["done"]))

    return jax.lax.while_loop(cond, body, carry)


@functools.partial(jax.jit, static_argnames=("model", "window"))
def _postnet_window(model: TransformerTTS, variables, groups, end, length,
                    mean, var, *, window: int):
    """Causal postnet + denorm over a lookback window of decoded groups.

    Returns (frames (B, window*r, mel) fp32, start_group). Exactness:
    the window either starts at group 0 (true signal start) or ends at
    ``end`` with >= POSTNET_LOOKBACK groups of context before any group
    the caller emits; the postnet is causal so both reproduce the
    one-shot ``apply_postnet`` values (synthesize.py).
    """
    from transformer_tts_tpu.infer.quantize import maybe_dequantize_variables
    variables = maybe_dequantize_variables(variables)
    max_steps = groups.shape[1]
    r = model.reduction_rate
    start = jnp.clip(end - window, 0, max_steps - window)
    win = jax.lax.dynamic_slice_in_dim(groups, start, window, axis=1)
    post = model.apply(variables, win.astype(model.dtype), train=False,
                       method=TransformerTTS.apply_postnet
                       ).astype(jnp.float32)
    b = post.shape[0]
    frames = post.reshape(b, window * r, model.mel_dim)
    idx = start * r + jnp.arange(window * r)[None, :]
    valid = idx < (length * r)[:, None]
    if mean is not None and var is not None:
        frames = frames * jnp.sqrt(var) + mean
    frames = jnp.where(valid[:, :, None], frames, 0.0)
    return frames, start


class ARStream:
    """Segmented AR Transformer-TTS decode yielding mel chunks.

    Iterating yields ``(start_frame, mel_chunk (B, t, mel) fp32)`` with
    the same values the one-shot :func:`synthesize_transformer_tts`
    produces (denormalized, zero beyond each row's length). After
    iteration completes, ``self.lengths`` holds the (B,) frame lengths.

    ``segment_steps`` trades latency for dispatch overhead: each segment
    is one jitted while_loop of that many decode steps plus one postnet
    window call.
    """

    def __init__(self, model: TransformerTTS, variables, text, pos_text,
                 spk_emb=None, ref_mel=None, mean=None, var=None, *,
                 max_steps: int = MAX_AR_STEPS, segment_steps: int = 32,
                 stop_threshold: float = 0.5):
        _ar_check(model)
        self.model = model
        self.variables = variables
        self.text = jnp.asarray(text)
        self.pos_text = jnp.asarray(pos_text)
        self.spk_emb = spk_emb if spk_emb is None else jnp.asarray(spk_emb)
        self.ref_mel = ref_mel if ref_mel is None else jnp.asarray(ref_mel)
        self.mean = mean if mean is None else jnp.asarray(mean)
        self.var = var if var is None else jnp.asarray(var)
        self.max_steps = int(max_steps)
        self.segment_steps = int(segment_steps)
        self.stop_threshold = float(stop_threshold)
        self.lengths: Optional[np.ndarray] = None   # (B,) frames, at end

    def __iter__(self) -> Iterator[Tuple[int, np.ndarray]]:
        model, variables = self.model, self.variables
        r = model.reduction_rate
        b = self.text.shape[0]
        e_outputs, src_mask, cross_kvs = _encode_ar(
            model, variables, self.text, self.pos_text, self.spk_emb,
            self.ref_mel)
        carry = _ar_init(model, b, self.max_steps)
        window = min(self.segment_steps + POSTNET_LOOKBACK, self.max_steps)
        prev_end = 0
        while True:
            carry = _decode_segment(
                model, variables, e_outputs, src_mask, self.spk_emb,
                cross_kvs, carry, segment_steps=self.segment_steps,
                stop_threshold=self.stop_threshold)
            end = int(carry["step"])          # host sync per segment
            if end == prev_end:
                break                          # already done at entry
            frames, start = _postnet_window(
                model, variables, carry["groups"], carry["step"],
                carry["length"], self.mean, self.var, window=window)
            frames = np.asarray(frames)
            s0 = int(start)
            chunk = frames[:, (prev_end - s0) * r:(end - s0) * r]
            yield prev_end * r, chunk
            prev_end = end
            if end >= self.max_steps or bool(np.asarray(
                    carry["done"]).all()):
                break
        self.lengths = np.asarray(carry["length"] * r)

"""Synthesis paths.

* FastSpeech2: one NAR forward (reference ``test_fastspeech2.py:146-204``),
  optionally with pitch/duration perturbation factors
  (test_fastspeech2.py:93-94 --pitch_perturbation/--duration_perturbation
  sample a factor from {0.8,0.9,1.0,1.1,1.2}).
* Transformer-TTS: incremental AR decode under ``lax.while_loop`` with
  per-layer KV caches and the reference stop rule
  (sigmoid(stop) > 0.5, 500-step cap — test.py:158-184), then one causal
  postnet pass over the whole decoded sequence (the postnet is causal, so
  end-of-decode application equals per-step application).

Both paths are jittable end-to-end with static shapes; de-normalization
(out * sqrt(var) + mean — test_fastspeech2.py:177-180) happens on device.
"""

from __future__ import annotations

import functools
import random
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from transformer_tts_tpu.models.fastspeech2 import FastSpeech2
from transformer_tts_tpu.models.transformer_tts import TransformerTTS
from transformer_tts_tpu.ops.masks import pad_mask

PERTURBATION_CHOICES = (0.8, 0.9, 1.0, 1.1, 1.2)  # varianceadaptor.py:77
MAX_AR_STEPS = 500                                # test.py:158
# The postnet is 5 causal convs of kernel 5 (left-pad 4 each,
# postnets.py:49-68): output group t depends on groups [t-20, t] only.
# Streaming applies it over a lookback window of this many groups.
POSTNET_LOOKBACK = 20


def sample_perturbation(rng: Optional[random.Random] = None) -> float:
    r = rng or random
    return r.choice(PERTURBATION_CHOICES)


def denormalize(mel: jnp.ndarray, mean: jnp.ndarray,
                var: jnp.ndarray) -> jnp.ndarray:
    """out * sqrt(var) + mean (test_fastspeech2.py:177-180)."""
    return mel * jnp.sqrt(var) + mean


@functools.partial(jax.jit, static_argnames=("model", "max_frames",
                                             "pitch_scale",
                                             "duration_scale",
                                             "use_prenet"))
def synthesize_fastspeech2(
    model: FastSpeech2,
    variables,
    text: jnp.ndarray,
    pos_text: jnp.ndarray,
    max_frames: int,
    spk_emb: Optional[jnp.ndarray] = None,
    accent: Optional[jnp.ndarray] = None,
    hop_size: Optional[jnp.ndarray] = None,
    mean: Optional[jnp.ndarray] = None,
    var: Optional[jnp.ndarray] = None,
    *,
    pitch_scale: float = 1.0,
    duration_scale: float = 1.0,
    use_prenet: bool = False,
):
    """One NAR forward; returns (mel (B,T,mel), mel_len (B,), durations)."""
    from transformer_tts_tpu.infer.quantize import maybe_dequantize_variables
    variables = maybe_dequantize_variables(variables)
    src_mask = pad_mask(pos_text)
    out = model.apply(
        variables, text, src_mask, max_frames, accent=accent,
        spk_emb=spk_emb, hop_size=hop_size, train=False,
        pitch_scale=pitch_scale, duration_scale=duration_scale)
    if use_prenet or out.mel_post is None:
        mel = out.mel_pre
    else:
        mel = out.mel_post
    if mean is not None and var is not None:
        mel = denormalize(mel, mean, var)
    durations = jnp.round(
        jnp.exp(out.log_duration) - model.log_offset).clip(0)
    durations = jnp.where(src_mask[:, 0, :], durations, 0)
    return mel, out.mel_len, durations.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("model", "max_frames"))
def synthesize_integrate(
    model: FastSpeech2,
    variables,
    text: jnp.ndarray,
    pos_text: jnp.ndarray,
    max_frames: int,
    spk_emb: Optional[jnp.ndarray] = None,
    spk_emb_post: Optional[jnp.ndarray] = None,
    accent: Optional[jnp.ndarray] = None,
    mean: Optional[jnp.ndarray] = None,
    var: Optional[jnp.ndarray] = None,
):
    """text-mel-mel joint-model synthesis
    (test_fastspeech2_dev_integrate_train.py:107-220).

    One forward of the ``enable_post_model`` FastSpeech2; the post-model
    output is residual-added (:174-182): onto mel_post when
    ``postnet_pred``, else onto mel_pre (versions 8/9/10 emit a tuple —
    the first element is the residual). Returns
    (refined (B,T,mel), prenet (B,T,mel), mel_len (B,), durations) — the
    reference saves the prenet output alongside (:206-210).
    """
    from transformer_tts_tpu.infer.quantize import maybe_dequantize_variables
    variables = maybe_dequantize_variables(variables)
    src_mask = pad_mask(pos_text)
    out = model.apply(variables, text, src_mask, max_frames,
                      accent=accent, spk_emb=spk_emb,
                      spk_emb_post=spk_emb_post, train=False)
    post = out.post_output
    if isinstance(post, tuple):
        post = post[0]                   # versions 8/9/10 (:180-181)
    base = out.mel_post if model.postnet_pred else out.mel_pre
    refined = base + post.astype(base.dtype)
    prenet = out.mel_pre
    if mean is not None and var is not None:
        refined = denormalize(refined, mean, var)
        prenet = denormalize(prenet, mean, var)
    durations = jnp.round(
        jnp.exp(out.log_duration) - model.log_offset).clip(0)
    durations = jnp.where(src_mask[:, 0, :], durations, 0)
    return refined, prenet, out.mel_len, durations.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=(
    "model", "post_model", "max_frames", "version", "postnet_pred",
    "mel_dim_post"))
def synthesize_fastspeech2_post(
    model: FastSpeech2,
    post_model,
    variables,
    post_variables,
    text: jnp.ndarray,
    pos_text: jnp.ndarray,
    max_frames: int,
    *,
    version: int,
    postnet_pred: bool,
    mel_dim_post: int,
    spk_emb: Optional[jnp.ndarray] = None,
    mean: Optional[jnp.ndarray] = None,
    var: Optional[jnp.ndarray] = None,
):
    """FS2 forward + PostLowEnergy refinement as ONE jitted program.

    The serving-path equivalent of ``cli/synthesize --post_model``
    (reference ``test_fastspeech2_dev.py:207-227``): versions 3/5/6 add
    the student output as a residual on mel dims ``:mel_dim_post``,
    the others replace those dims. Returns (mel, mel_len, durations).
    """
    from transformer_tts_tpu.infer.quantize import maybe_dequantize_variables
    variables = maybe_dequantize_variables(variables)
    src_mask = pad_mask(pos_text)
    out = model.apply(variables, text, src_mask, max_frames,
                      spk_emb=spk_emb, train=False)
    input_mel = out.mel_post if postnet_pred else out.mel_pre
    if version in (1, 5):
        post = post_model.apply(post_variables, input_mel, out.mel_mask,
                                train=False)
    else:
        phone = (out.text_dur_predicted if version in (4, 6)
                 else out.variance_adaptor_output)
        post, _, _ = post_model.apply(post_variables, input_mel,
                                      out.mel_mask, phone, train=False)
    if version in (3, 5, 6):          # residual (:207-227)
        refined = input_mel.at[:, :, :mel_dim_post].add(post)
    else:                             # replace dims 0:mel_dim_post
        refined = input_mel.at[:, :, :mel_dim_post].set(post)
    if mean is not None and var is not None:
        refined = denormalize(refined, mean, var)
    durations = jnp.round(
        jnp.exp(out.log_duration) - model.log_offset).clip(0)
    durations = jnp.where(src_mask[:, 0, :], durations, 0)
    return refined, out.mel_len, durations.astype(jnp.int32)


def _ar_check(model):
    """Shared preconditions for the KV-cached incremental decode."""
    if model.decoder_type.lower() == "tacotron2":
        raise ValueError("decoder_type='tacotron2' uses "
                         "synthesize_tacotron2 (zoneout-LSTM loop), not "
                         "the KV-cached transformer decode")
    if model.ff_conv_kernel_size_decoder != 1:
        raise ValueError(
            "incremental decode requires ff_conv_kernel_size_decoder == 1 "
            "(the decoder conv-FFN is SAME-padded and only causal at k=1)")


def _ar_init(model: TransformerTTS, b: int, max_steps: int) -> dict:
    """Initial carry for the AR decode loop (shared with streaming)."""
    heads = model.n_head_decoder
    d_k = model.d_model_decoder // heads
    dtype = model.dtype
    caches = tuple(
        (jnp.zeros((b, heads, max_steps, d_k), dtype),
         jnp.zeros((b, heads, max_steps, d_k), dtype))
        for _ in range(model.n_layer_decoder))
    return dict(
        step=jnp.zeros((), jnp.int32),
        prev=jnp.zeros((b, 1, model.mel_dim), dtype),
        caches=caches,
        groups=jnp.zeros((b, max_steps, model.mel_dim * model.reduction_rate),
                         jnp.float32),
        done=jnp.zeros((b,), bool),
        length=jnp.full((b,), max_steps, jnp.int32),
    )


def _ar_body(model: TransformerTTS, variables, e_outputs, src_mask,
             spk_emb, cross_kvs, stop_threshold: float):
    """One-step body of the AR decode while_loop (shared with streaming)."""
    mel_dim = model.mel_dim
    dtype = model.dtype

    def body(c):
        group, stop, new_caches = model.apply(
            variables, c["prev"], e_outputs, src_mask, c["caches"],
            c["step"], spk_emb, cross_kvs,
            method=TransformerTTS.decode_step)
        group_f32 = group.astype(jnp.float32)
        groups = jax.lax.dynamic_update_slice_in_dim(
            c["groups"], group_f32, c["step"], axis=1)
        # stop rule (test.py:178-184): mean over the r stop logits
        p_stop = jax.nn.sigmoid(stop.astype(jnp.float32))[:, 0]
        stop_now = jnp.mean(p_stop, axis=-1) > stop_threshold
        newly_done = stop_now & ~c["done"]
        length = jnp.where(newly_done, c["step"] + 1, c["length"])
        # next input: first frame of the predicted group (test.py:171-176)
        next_frame = group[:, 0, :mel_dim][:, None, :].astype(dtype)
        return dict(step=c["step"] + 1, prev=next_frame, caches=new_caches,
                    groups=groups, done=c["done"] | stop_now, length=length)

    return body


@functools.partial(jax.jit, static_argnames=("model", "max_steps",
                                             "stop_threshold"))
def synthesize_transformer_tts(
    model: TransformerTTS,
    variables,
    text: jnp.ndarray,
    pos_text: jnp.ndarray,
    spk_emb: Optional[jnp.ndarray] = None,
    ref_mel: Optional[jnp.ndarray] = None,
    mean: Optional[jnp.ndarray] = None,
    var: Optional[jnp.ndarray] = None,
    *,
    max_steps: int = MAX_AR_STEPS,
    stop_threshold: float = 0.5,
):
    """Incremental AR synthesis with KV caches.

    Returns (mel (B, max_steps*r, mel), lengths (B,) in frames).
    Positions beyond a sample's length are zero.
    """
    from transformer_tts_tpu.infer.quantize import maybe_dequantize_variables
    variables = maybe_dequantize_variables(variables)
    _ar_check(model)
    b = text.shape[0]
    r = model.reduction_rate
    mel_dim = model.mel_dim
    dtype = model.dtype

    src_mask = pad_mask(pos_text)
    e_outputs, _ = model.apply(
        variables, text, src_mask, spk_emb, ref_mel, train=False,
        method=TransformerTTS.encode)
    # cross-attention K/V never change during decode: project once
    cross_kvs = model.apply(variables, e_outputs,
                            method=TransformerTTS.precompute_cross_kv)

    init = _ar_init(model, b, max_steps)

    def cond(c):
        return jnp.logical_and(c["step"] < max_steps,
                               ~jnp.all(c["done"]))

    body = _ar_body(model, variables, e_outputs, src_mask, spk_emb,
                    cross_kvs, stop_threshold)
    final = jax.lax.while_loop(cond, body, init)

    mel_pre_groups = final["groups"]                       # (B, S, mel*r)
    mel_post_groups = model.apply(
        variables, mel_pre_groups.astype(dtype), train=False,
        method=TransformerTTS.apply_postnet).astype(jnp.float32)
    mel = mel_post_groups.reshape(b, max_steps * r, mel_dim)
    lengths = final["length"] * r
    valid = jnp.arange(max_steps * r)[None, :] < lengths[:, None]
    mel = jnp.where(valid[:, :, None], mel, 0.0)
    if mean is not None and var is not None:
        mel = jnp.where(valid[:, :, None], denormalize(mel, mean, var), 0.0)
    return mel, lengths


@functools.partial(jax.jit, static_argnames=("model", "max_steps"))
def synthesize_tacotron2(
    model: TransformerTTS,
    variables,
    text: jnp.ndarray,
    pos_text: jnp.ndarray,
    spk_emb: Optional[jnp.ndarray] = None,
    ref_mel: Optional[jnp.ndarray] = None,
    mean: Optional[jnp.ndarray] = None,
    var: Optional[jnp.ndarray] = None,
    *,
    max_steps: int = MAX_AR_STEPS,
):
    """Tacotron2-decoder AR synthesis (Models/decoder.py:209-332 loop as
    one ``lax.while_loop``) + causal postnet + de-normalization.

    Returns (mel (B, max_steps*r, mel) fp32, lengths (B,) frames);
    positions beyond a sample's length are zero.
    """
    from transformer_tts_tpu.infer.quantize import maybe_dequantize_variables
    variables = maybe_dequantize_variables(variables)
    src_mask = pad_mask(pos_text)
    text_lengths = src_mask[:, 0, :].sum(-1).astype(jnp.int32)
    mel, lengths = model.apply(
        variables, text, src_mask, text_lengths, spk_emb, ref_mel,
        max_steps, method=TransformerTTS.tacotron2_synthesize)
    valid = jnp.arange(mel.shape[1])[None, :] < lengths[:, None]
    mel = jnp.where(valid[:, :, None], mel, 0.0)
    if mean is not None and var is not None:
        mel = jnp.where(valid[:, :, None], denormalize(mel, mean, var), 0.0)
    return mel, lengths

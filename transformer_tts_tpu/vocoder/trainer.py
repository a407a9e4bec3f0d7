"""Vocoder GAN training: one fully-jitted D-then-G step.

Loss recipe (HiFi-GAN): LSGAN adversarial terms, feature matching
(lambda_fm, default 2) over every discriminator feature map, and an L1
log-mel reconstruction loss (lambda_mel, default 45) computed **on
device** with the same `ops.melspectrogram.log_mel_spectrogram`
configuration the TTS corpus was prepared with (`cli/prepare_data.py`),
so the vocoder trains on exactly the mel the acoustic model predicts.

TPU notes:
* The whole D-update + G-update pair is ONE jitted function — weights,
  both optimizer updates, and the mel loss all stay on device; the host
  only feeds raw audio segments (B, segment) and reads scalars.
* The discriminator update uses ``stop_gradient`` on the generated audio
  (the torch idiom is ``.detach()``); the generator then trains against
  the *updated* discriminator, matching the official update order.
* Segments are fixed-size crops, so every step has one compiled
  signature — no bucketing needed.

No reference counterpart (the reference stops at mel + external vocoder).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from transformer_tts_tpu.config import HParams
from transformer_tts_tpu.ops.melspectrogram import log_mel_spectrogram
from transformer_tts_tpu.vocoder.discriminator import VocoderDiscriminator
from transformer_tts_tpu.vocoder.generator import (
    HiFiGANGenerator, ISTFTVocoder)


class VocoderTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    d_params: Any
    g_opt_state: Any
    d_opt_state: Any
    g_tx: optax.GradientTransformation = struct.field(pytree_node=False)
    d_tx: optax.GradientTransformation = struct.field(pytree_node=False)


def build_vocoder(hp: HParams, *, train_dtype=None):
    """hp.vocoder_type selects the generator family: "hifigan"
    (time-domain upsampling) or "istft" (Vocos-style frame-rate
    backbone + iSTFT head — ~hop_length× fewer conv positions). Both
    share the (B, T, mel) -> (B, T*hop) contract, the GAN step, and the
    serving/streaming paths."""
    dtype = train_dtype if train_dtype is not None else (
        jnp.bfloat16 if hp.amp else jnp.float32)
    vtype = (hp.vocoder_type or "hifigan").lower()
    if vtype == "istft":
        hop = 1
        for r in hp.vocoder_upsample_rates:
            hop *= r
        return ISTFTVocoder(
            mel_dim=hp.mel_dim,
            channels=hp.vocoder_convnext_channels,
            mlp_dim=hp.vocoder_convnext_mlp,
            num_layers=hp.vocoder_convnext_layers,
            n_fft=hp.vocoder_istft_n_fft,
            hop_length=hop,
            dtype=dtype)
    if vtype != "hifigan":
        raise ValueError(f"unknown vocoder_type {hp.vocoder_type!r}")
    return HiFiGANGenerator(
        mel_dim=hp.mel_dim,
        upsample_rates=tuple(hp.vocoder_upsample_rates),
        upsample_kernel_sizes=tuple(hp.vocoder_upsample_kernel_sizes),
        upsample_initial_channel=hp.vocoder_channels,
        resblock_kernel_sizes=tuple(hp.vocoder_resblock_kernel_sizes),
        resblock_dilations=tuple(
            tuple(d) for d in hp.vocoder_resblock_dilations),
        upsample_mode=hp.vocoder_upsample_mode,
        dtype=dtype)


def build_discriminator(hp: HParams) -> VocoderDiscriminator:
    # fp32: the GAN losses are the numerically delicate path
    return VocoderDiscriminator(
        periods=tuple(hp.vocoder_periods),
        num_scales=hp.vocoder_num_scales)


def init_vocoder_state(hp: HParams, rng: jax.Array,
                       segment_size: int) -> Tuple[
                           VocoderTrainState, HiFiGANGenerator,
                           VocoderDiscriminator]:
    gen = build_vocoder(hp)
    disc = build_discriminator(hp)
    hop = gen.hop_length
    if segment_size % hop:
        raise ValueError(
            f"segment_size {segment_size} not a multiple of the "
            f"generator hop {hop} (= prod(vocoder_upsample_rates))")
    g_rng, d_rng = jax.random.split(rng)
    mel0 = jnp.zeros((1, segment_size // hop, hp.mel_dim), jnp.float32)
    g_params = gen.init(g_rng, mel0)["params"]
    d_params = disc.init(d_rng, jnp.zeros((1, segment_size),
                                          jnp.float32))["params"]
    sched = optax.exponential_decay(
        hp.vocoder_lr, transition_steps=hp.vocoder_lr_decay_steps,
        decay_rate=hp.vocoder_lr_decay)
    # RecipeTransform: value-equality for the static tx metadata, so a
    # state rebuilt from the same hparams (restore-into-fresh) is the
    # same pytree type as the original (see train/schedule.py)
    from transformer_tts_tpu.train.schedule import RecipeTransform
    recipe = ("vocoder_adamw", hp.vocoder_lr, hp.vocoder_lr_decay_steps,
              hp.vocoder_lr_decay, hp.vocoder_adam_b1, hp.vocoder_adam_b2)
    mk = lambda role: RecipeTransform(
        optax.adamw(sched, b1=hp.vocoder_adam_b1,
                    b2=hp.vocoder_adam_b2, weight_decay=0.0),
        recipe + (role,))
    g_tx, d_tx = mk("g"), mk("d")
    return VocoderTrainState(
        step=jnp.zeros((), jnp.int32), g_params=g_params,
        d_params=d_params, g_opt_state=g_tx.init(g_params),
        d_opt_state=d_tx.init(d_params), g_tx=g_tx, d_tx=d_tx), gen, disc


def _ls_real(logits):
    return jnp.mean((logits.astype(jnp.float32) - 1.0) ** 2)


def _ls_fake(logits):
    return jnp.mean(logits.astype(jnp.float32) ** 2)


def make_vocoder_train_step(gen: HiFiGANGenerator,
                            disc: VocoderDiscriminator, hp: HParams,
                            mel_cfg: Dict[str, Any], *,
                            predicted_mel_inputs: bool = False):
    """Returns ``step(state, audio (B, N) fp32, rng) -> (state, scalars)``.

    ``predicted_mel_inputs=True`` is the fine-tuning mode (the HiFi-GAN
    production recipe): the step signature becomes
    ``step(state, audio, mel, rng)`` where ``mel`` is the *acoustic
    model's* (teacher-forced) prediction for the same segment — the
    generator learns to vocode the distribution it will actually see at
    synthesis time. The reconstruction target stays the ground-truth
    audio's mel either way.
    """
    hop = gen.hop_length
    lam_mel = hp.vocoder_lambda_mel
    lam_fm = hp.vocoder_lambda_fm

    def mel_of(audio):
        m = log_mel_spectrogram(audio, **mel_cfg)
        return m[:, : audio.shape[1] // hop]       # drop the center frame

    def _step(state: VocoderTrainState, audio: jnp.ndarray,
              in_mel, rng: jax.Array):
        mel = mel_of(audio)                        # reconstruction target
        gen_in = in_mel if in_mel is not None else mel
        fake = gen.apply({"params": state.g_params}, gen_in)
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            outs_r = disc.apply({"params": d_params}, audio)
            outs_f = disc.apply({"params": d_params}, fake_sg)
            loss = sum(_ls_real(lr) for lr, _ in outs_r) \
                 + sum(_ls_fake(lf) for lf, _ in outs_f)
            return loss

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
        d_updates, d_opt_state = state.d_tx.update(
            d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        def g_loss_fn(g_params):
            wav = gen.apply({"params": g_params}, gen_in)
            outs_f = disc.apply({"params": d_params}, wav)
            outs_r = disc.apply({"params": d_params}, audio)
            adv = sum(_ls_real(lf) for lf, _ in outs_f)
            fm = sum(
                jnp.mean(jnp.abs(fr.astype(jnp.float32)
                                 - ff.astype(jnp.float32)))
                for (_, fmaps_r), (_, fmaps_f) in zip(outs_r, outs_f)
                for fr, ff in zip(fmaps_r, fmaps_f))
            mel_l1 = jnp.mean(jnp.abs(mel_of(wav) - mel))
            loss = adv + lam_fm * fm + lam_mel * mel_l1
            return loss, (adv, fm, mel_l1)

        (g_loss, (adv, fm, mel_l1)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params)
        g_updates, g_opt_state = state.g_tx.update(
            g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        new_state = state.replace(
            step=state.step + 1, g_params=g_params, d_params=d_params,
            g_opt_state=g_opt_state, d_opt_state=d_opt_state)
        scalars = {"loss_d": d_loss, "loss_g": g_loss, "loss_adv": adv,
                   "loss_fm": fm, "loss_mel": mel_l1}
        return new_state, scalars

    if predicted_mel_inputs:
        def step_ft(state, audio, mel, rng):
            return _step(state, audio, mel, rng)
        return jax.jit(step_ft, donate_argnums=(0,))

    def step_fn(state, audio, rng):
        return _step(state, audio, None, rng)
    return jax.jit(step_fn, donate_argnums=(0,))


# --------------------------------------------------------------------------
# Checkpointing (own payload shape: a GAN state is not a TTS TrainState)

def save_vocoder_checkpoint(save_dir: str, state: VocoderTrainState,
                            tag: int) -> str:
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(save_dir, f"vocoder_{tag}"))
    if os.path.exists(path):
        shutil.rmtree(path)
    payload = {"g_params": state.g_params, "d_params": state.d_params,
               "g_opt_state": state.g_opt_state,
               "d_opt_state": state.d_opt_state, "step": state.step}
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(payload))
    ckptr.wait_until_finished()        # StandardCheckpointer is async
    return path


def restore_vocoder_checkpoint(save_dir: str, state: VocoderTrainState,
                               tag: Optional[int] = None
                               ) -> VocoderTrainState:
    import orbax.checkpoint as ocp
    if tag is None:
        tags = sorted(int(d.split("_")[1]) for d in os.listdir(save_dir)
                      if d.startswith("vocoder_")
                      and d.split("_")[1].isdigit())
        if not tags:
            raise FileNotFoundError(f"no vocoder checkpoints in {save_dir}")
        tag = tags[-1]
    path = os.path.join(save_dir, f"vocoder_{tag}")
    template = {"g_params": state.g_params, "d_params": state.d_params,
                "g_opt_state": state.g_opt_state,
                "d_opt_state": state.d_opt_state, "step": state.step}
    restored = ocp.StandardCheckpointer().restore(path, template)
    return state.replace(**restored)


def restore_generator_params(path: str, template_params=None):
    """Load generator params from either a full vocoder checkpoint dir or
    a generator-only export (the synthesis-side entry point).

    The tree is committed to the default device before returning:
    generator exports are written via ``jax.device_get`` (host numpy, no
    sharding file), and orbax restores them as numpy — a host tree passed
    to a jitted apply re-uploads all ~60 MB of weights on EVERY call
    (measured ~950 ms/call over the device tunnel). ``device_put`` makes
    restore the one-time transfer.
    """
    import orbax.checkpoint as ocp
    full = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    if isinstance(full, dict) and "g_params" in full:
        full = full["g_params"]
    return jax.device_put(full)


def export_generator(save_dir: str, state: VocoderTrainState) -> str:
    """Write a generator-only snapshot (what synthesis/serving load)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(save_dir, "generator"))
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get({"g_params": state.g_params}))
    ckptr.wait_until_finished()        # StandardCheckpointer is async
    return path

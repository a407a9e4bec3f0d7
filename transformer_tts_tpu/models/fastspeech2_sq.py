"""SQ-VAE FastSpeech 2 (unsupervised-duration variant).

Reference: ``Models/fastspeech2_sq.py`` + ``Models/varianceadaptor_sq.py``
+ driver ``train_fastspeech2_sq.py``.

The variance adaptor quantizes the encoder output through an SQEmbedding
codebook BEFORE duration prediction (varianceadaptor_sq.py:67-100):

  z = quantize(x[..., :D])        (stochastic at train, argmin at eval)
  log_d = duration_predictor(z)
  expand x AND z by the *predicted* durations; x = x + z_expanded

Training is duration-unsupervised: the driver forces ``alignment=None``
(train_fastspeech2_sq.py:122) and supervises durations only through
``mean_b |sum_l exp(logd_bl) - mel_len_b|`` (:203-208), with the SQ-VAE
ELBO loss and the temperature anneal ``exp(-1e-5 * step)`` (:136-140).

KNOWN REFERENCE BUG (not replicated): the teacher-forced branch of
``SQFastSpeech2.forward`` unpacks 7 of the adaptor's 9 return values
(fastspeech2_sq.py:105-107) and would crash; our adaptor returns a
uniform structure for both branches.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import flax.linen as nn

from transformer_tts_tpu.models.encoder import Encoder, ConformerEncoder
from transformer_tts_tpu.models.fastspeech2 import (
    FastSpeech2Output, _stack)
from transformer_tts_tpu.models.postnets import PostConvNet
from transformer_tts_tpu.models.sq_vae import SQEmbedding
from transformer_tts_tpu.models.variance_adaptor import VariancePredictor
from transformer_tts_tpu.ops.length_regulator import (
    length_regulate, durations_from_log)


class SQVarianceAdaptor(nn.Module):
    d_model: int
    n_bins: int = 256
    f0_min: float = 71.0
    f0_max: float = 795.8
    energy_min: float = 0.0
    energy_max: float = 315.0
    log_offset: float = 1.0
    pitch_pred: bool = True
    energy_pred: bool = True
    dropout: float = 0.5
    n_embeddings: int = 128      # varianceadaptor_sq.py:42
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, src_mask, max_frames, duration_target=None,
                 pitch_target=None, energy_target=None, mel_mask=None, *,
                 train: bool = True, temperature=None):
        log_var_q = self.param(
            "log_var_q_scalar", lambda _: jnp.log(jnp.full((1,), 10.0)))
        codebook = SQEmbedding(self.n_embeddings, self.d_model,
                               name="codebook")
        z = x[..., : self.d_model]
        if train:
            z, sq_vae_loss, sq_vae_perplexity, _ = codebook(
                z, log_var_q, temperature)
        else:
            z, _ = codebook.encode(z, log_var_q)
            sq_vae_loss = sq_vae_perplexity = None

        log_d = VariancePredictor(
            dropout=self.dropout, dtype=self.dtype,
            name="duration_predictor")(z, src_mask, train=train)

        if duration_target is not None:
            durations = duration_target.astype(jnp.int32)
            x, mel_len, mel_pos = length_regulate(x, durations, max_frames)
        else:
            durations = durations_from_log(
                log_d.astype(jnp.float32), self.log_offset)
            durations = jnp.where(src_mask[:, 0, :], durations, 0)
            x, mel_len, mel_pos = length_regulate(x, durations, max_frames)
            z_exp, _, _ = length_regulate(z, durations, max_frames)
            x = x + z_exp                      # varianceadaptor_sq.py:98
        if mel_mask is None:
            mel_mask = (mel_pos != 0)[:, None, :]

        pitch = energy = None
        pitch_emb = energy_emb = None
        if self.pitch_pred:
            pitch = VariancePredictor(
                dropout=self.dropout, dtype=self.dtype,
                name="pitch_predictor")(x, mel_mask, train=train)
            bins = jnp.exp(jnp.linspace(
                jnp.log(self.f0_min), jnp.log(self.f0_max), self.n_bins - 1))
            src = pitch_target if pitch_target is not None else pitch
            pitch_emb = nn.Embed(self.n_bins, self.d_model, dtype=self.dtype,
                                 name="pitch_embedding")(
                jnp.searchsorted(bins, src))
        if self.energy_pred:
            energy = VariancePredictor(
                dropout=self.dropout, dtype=self.dtype,
                name="energy_predictor")(x, mel_mask, train=train)
            bins = jnp.linspace(self.energy_min, self.energy_max,
                                self.n_bins - 1)
            src = energy_target if energy_target is not None else energy
            energy_emb = nn.Embed(self.n_bins, self.d_model,
                                  dtype=self.dtype,
                                  name="energy_embedding")(
                jnp.searchsorted(bins, src))

        text_dur_predicted = x
        if pitch_emb is not None:
            x = x + pitch_emb
        if energy_emb is not None:
            x = x + energy_emb
        return (x, log_d, pitch, energy, mel_len, mel_pos, mel_mask,
                text_dur_predicted, sq_vae_loss, sq_vae_perplexity)


class SQFastSpeech2(nn.Module):
    """FastSpeech2 with the SQ variance adaptor (fastspeech2_sq.py:18-120)."""
    vocab_size: int = 152
    mel_dim: int = 80
    d_model_encoder: int = 384
    n_layer_encoder: int = 6
    n_head_encoder: int = 4
    ff_conv_kernel_size_encoder: int = 5
    concat_after_encoder: bool = False
    d_model_decoder: int = 384
    n_layer_decoder: int = 6
    n_head_decoder: int = 4
    ff_conv_kernel_size_decoder: int = 1
    concat_after_decoder: bool = False
    encoder_type: str = "transformer"
    decoder_type: str = "transformer"
    reduction_rate: int = 1
    postnet_pred: bool = True
    dropout: float = 0.1
    dropout_postnet: float = 0.5
    dropout_variance_adaptor: float = 0.5
    n_bins: int = 256
    f0_min: float = 71.0
    f0_max: float = 795.8
    energy_min: float = 0.0
    energy_max: float = 315.0
    log_offset: float = 1.0
    pitch_pred: bool = True
    energy_pred: bool = True
    accent_emb: bool = False
    multi_speaker: bool = False
    spk_emb_dim: Optional[int] = None
    spk_emb_architecture: tuple = ()
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text, src_mask, max_frames, d_target=None,
                 p_target=None, e_target=None, mel_mask=None, accent=None,
                 spk_emb=None, temperature=None, *, train: bool = True,
                 collect_attn: bool = False) -> FastSpeech2Output:
        enc_spk = self.spk_emb_dim if "encoder" in self.spk_emb_architecture \
            else None
        encoder = _stack(
            self.encoder_type,
            vocab_size=self.vocab_size, d_model=self.d_model_encoder,
            n_layers=self.n_layer_encoder, heads=self.n_head_encoder,
            ff_kernel_size=self.ff_conv_kernel_size_encoder,
            concat_after=self.concat_after_encoder, dropout=self.dropout,
            spk_emb_dim=enc_spk, embedding=True, accent_emb=self.accent_emb,
            use_flash=self.use_flash, dtype=self.dtype, name="encoder")
        e_outputs, attn_enc = encoder(
            text, src_mask, spk_emb if enc_spk else None, accent,
            train=train, collect_attn=collect_attn)

        va = SQVarianceAdaptor(
            d_model=self.d_model_encoder, n_bins=self.n_bins,
            f0_min=self.f0_min, f0_max=self.f0_max,
            energy_min=self.energy_min, energy_max=self.energy_max,
            log_offset=self.log_offset, pitch_pred=self.pitch_pred,
            energy_pred=self.energy_pred,
            dropout=self.dropout_variance_adaptor, dtype=self.dtype,
            name="variance_adaptor")
        (va_x, log_d, pitch, energy, mel_len, mel_pos, mel_mask,
         text_dur_predicted, sq_vae_loss, sq_vae_perplexity) = va(
            e_outputs, src_mask, max_frames, d_target, p_target, e_target,
            mel_mask, train=train, temperature=temperature)

        dec_spk = self.spk_emb_dim if "decoder" in self.spk_emb_architecture \
            else None
        decoder = _stack(
            self.decoder_type,
            vocab_size=self.d_model_encoder, d_model=self.d_model_decoder,
            n_layers=self.n_layer_decoder, heads=self.n_head_decoder,
            ff_kernel_size=self.ff_conv_kernel_size_decoder,
            concat_after=self.concat_after_decoder, dropout=self.dropout,
            spk_emb_dim=dec_spk, embedding=False, accent_emb=False,
            use_flash=self.use_flash, dtype=self.dtype, name="decoder")
        d_output, attn_dec = decoder(
            va_x, mel_mask, spk_emb if dec_spk else None, None,
            train=train, collect_attn=collect_attn)

        if self.postnet_pred:
            mel_pre, mel_post = PostConvNet(
                num_hidden=self.d_model_decoder, mel_dim=self.mel_dim,
                reduction_rate=self.reduction_rate,
                dropout=self.dropout_postnet, prev_version=True,
                dtype=self.dtype, name="postnet")(d_output, train=train)
        else:
            mel_pre = nn.Dense(self.mel_dim * self.reduction_rate,
                               dtype=self.dtype, name="out")(d_output)
            mel_post = None

        return FastSpeech2Output(
            mel_pre=mel_pre, mel_post=mel_post, log_duration=log_d,
            pitch=pitch, energy=energy, mel_len=mel_len, mel_pos=mel_pos,
            mel_mask=mel_mask, variance_adaptor_output=va_x,
            text_dur_predicted=text_dur_predicted, attn_enc=attn_enc,
            attn_dec=attn_dec, post_output=None, mask_frames=None,
            sq_vae_loss=sq_vae_loss, sq_vae_perplexity=sq_vae_perplexity)

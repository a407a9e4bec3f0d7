"""FastSpeech 2 (non-autoregressive text -> mel).

Reference: ``Models/fastspeech2.py:19-260``.

Pipeline: Encoder (transformer/conformer) -> [middle speaker add / SQ-VAE
bottleneck / hop-size embedding] -> VarianceAdaptor -> "decoder" (a second
Encoder/ConformerEncoder stack with Dense input) -> PostConvNet (pre, post)
or a plain Dense output head.

``post_model`` (PostLowEnergyv2) is attached when ``enable_post_model``
(reference ``debug=True``) for the text-mel-mel integrate-training line,
including the semantic span-masking of ``_semantic_mask``
(fastspeech2.py:243-260) — implemented here as a vectorized interval
overlap instead of the reference's per-span Python loop.

Everything is static-shaped: the caller supplies ``max_frames`` (the mel
bucket length); the variance adaptor masks beyond the realized length.

KNOWN REFERENCE BUG (not replicated): with ``use_sq_vae`` the reference
training path unpacks 4 values from ``codebook.encode`` which returns 2
(fastspeech2.py:158) and would crash; we call the proper stochastic
quantizer at train and ``encode`` at eval.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from transformer_tts_tpu.models.encoder import Encoder, ConformerEncoder
from transformer_tts_tpu.models.postnets import PostConvNet, PostLowEnergyv2
from transformer_tts_tpu.models.sq_vae import SQEmbedding
from transformer_tts_tpu.models.variance_adaptor import VarianceAdaptor


class FastSpeech2Output(NamedTuple):
    mel_pre: jnp.ndarray                    # (B, T, mel)
    mel_post: Optional[jnp.ndarray]         # (B, T, mel) or None
    log_duration: jnp.ndarray               # (B, L)
    pitch: Optional[jnp.ndarray]            # (B, T)
    energy: Optional[jnp.ndarray]           # (B, T)
    mel_len: jnp.ndarray                    # (B,)
    mel_pos: jnp.ndarray                    # (B, T)
    mel_mask: jnp.ndarray                   # (B, 1, T)
    variance_adaptor_output: jnp.ndarray    # (B, T, D)
    text_dur_predicted: jnp.ndarray         # (B, T, D)
    attn_enc: Optional[jnp.ndarray]
    attn_dec: Optional[jnp.ndarray]
    post_output: Optional[Any]              # mel-to-mel refinement output(s)
    mask_frames: Optional[jnp.ndarray]      # semantic-mask frame mask
    sq_vae_loss: Optional[jnp.ndarray]
    sq_vae_perplexity: Optional[jnp.ndarray]
    # CTC aux tap at mel frame rate (hp.CTC_training; train_Fastspeech2.py
    # :220-224 — the reference's wiring is broken, ``ctc_outputs`` is
    # undefined in that trainer; this defines the working contract: a
    # mid-decoder Linear(d, vocab) tap, CTC'd against the text ids)
    ctc_logits: Optional[jnp.ndarray] = None


def _stack(encoder_type: str, **kw):
    if encoder_type.lower() == "conformer":
        kw.pop("concat_after", None)
        return ConformerEncoder(**kw)
    return Encoder(**kw)


class FastSpeech2(nn.Module):
    # model dims (defaults: utils/default.yaml:49-69)
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
    # dropouts
    dropout: float = 0.1
    dropout_postnet: float = 0.5
    dropout_variance_adaptor: float = 0.5
    # variance adaptor
    n_bins: int = 256
    f0_min: float = 71.0
    f0_max: float = 795.8
    energy_min: float = 0.0
    energy_max: float = 315.0
    log_offset: float = 1.0
    pitch_pred: bool = True
    energy_pred: bool = True
    # optional (mean, std) predictor standardization — see
    # VarianceAdaptor.f0_stats (config.py f0_mean/f0_std contract)
    f0_stats: Optional[tuple] = None
    energy_stats: Optional[tuple] = None
    use_pos: bool = False
    use_rnn_length: bool = False
    p_scheduled_sampling: float = 0.0
    # conditioning
    accent_emb: bool = False
    multi_speaker: bool = False
    spk_emb_dim: Optional[int] = None
    spk_emb_architecture: tuple = ()        # subset of encoder/middle/decoder
    use_hop: bool = False
    # SQ-VAE bottleneck (fastspeech2.py:62-72)
    use_sq_vae: bool = False
    sq_n_embeddings: int = 128
    # post-processing model (integrate training, reference debug=True)
    enable_post_model: bool = False
    post_model_cfg: Optional[dict] = None
    version: Optional[int] = None
    semantic_mask: bool = False
    semantic_mask_phone: bool = False
    mask_probability: float = 0.06
    # CTC auxiliary tap on the decoder stack (hp.CTC_training)
    ctc_training: bool = False
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        text: jnp.ndarray,                    # (B, L) int32 token ids
        src_mask: jnp.ndarray,                # (B, 1, L) bool
        max_frames: int,                      # static mel bucket length
        d_target: Optional[jnp.ndarray] = None,
        p_target: Optional[jnp.ndarray] = None,
        e_target: Optional[jnp.ndarray] = None,
        mel_mask: Optional[jnp.ndarray] = None,
        accent: Optional[jnp.ndarray] = None,
        spk_emb: Optional[jnp.ndarray] = None,
        spk_emb_post: Optional[jnp.ndarray] = None,
        hop_size: Optional[jnp.ndarray] = None,
        temperature: Optional[jnp.ndarray] = None,
        *,
        train: bool = True,
        collect_attn: bool = False,
        pitch_scale: float = 1.0,
        duration_scale: float = 1.0,
    ) -> FastSpeech2Output:
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

        if "middle" in self.spk_emb_architecture:
            # fastspeech2.py:139-141: L2-normalized x-vector projection
            norm = spk_emb / jnp.linalg.norm(
                spk_emb, axis=-1, keepdims=True).clip(1e-12)
            e_outputs = e_outputs + nn.Dense(
                self.d_model_decoder, dtype=self.dtype,
                name="spk_proj")(norm)[:, None, :]

        sq_vae_loss = sq_vae_perplexity = None
        if self.use_sq_vae:
            log_var_q_scalar = self.param(
                "log_var_q_scalar",
                lambda _: jnp.log(jnp.full((1,), 10.0)))
            codebook = SQEmbedding(
                self.sq_n_embeddings, self.d_model_encoder, name="codebook")
            if train:
                z, sq_vae_loss, sq_vae_perplexity, _ = codebook(
                    e_outputs, log_var_q_scalar, temperature)
            else:
                z, _ = codebook.encode(e_outputs, log_var_q_scalar)
            e_outputs = z + e_outputs   # fastspeech2.py:165

        if self.use_hop:
            e_outputs = e_outputs + nn.Embed(
                3, self.d_model_encoder, dtype=self.dtype,
                name="hop_emb")(hop_size)[:, None, :]

        va = VarianceAdaptor(
            d_model=self.d_model_encoder, n_bins=self.n_bins,
            f0_min=self.f0_min, f0_max=self.f0_max,
            energy_min=self.energy_min, energy_max=self.energy_max,
            log_offset=self.log_offset, pitch_pred=self.pitch_pred,
            energy_pred=self.energy_pred,
            f0_stats=self.f0_stats, energy_stats=self.energy_stats,
            dropout=self.dropout_variance_adaptor, use_pos=self.use_pos,
            use_rnn_length=self.use_rnn_length, dtype=self.dtype,
            name="variance_adaptor")
        va_out = va(
            e_outputs, src_mask, max_frames,
            duration_target=d_target, pitch_target=p_target,
            energy_target=e_target, mel_mask=mel_mask, train=train,
            p_scheduled_sampling=self.p_scheduled_sampling if train else 0.0,
            pitch_scale=pitch_scale, duration_scale=duration_scale)

        dec_spk = self.spk_emb_dim if "decoder" in self.spk_emb_architecture \
            else None
        decoder = _stack(
            self.decoder_type,
            vocab_size=self.d_model_encoder, d_model=self.d_model_decoder,
            n_layers=self.n_layer_decoder, heads=self.n_head_decoder,
            ff_kernel_size=self.ff_conv_kernel_size_decoder,
            concat_after=self.concat_after_decoder, dropout=self.dropout,
            spk_emb_dim=dec_spk, embedding=False, accent_emb=False,
            ctc_out=self.ctc_training, ctc_classes=self.vocab_size,
            use_flash=self.use_flash, dtype=self.dtype, name="decoder")
        dec_res = decoder(
            va_out.x, va_out.mel_mask, spk_emb if dec_spk else None, None,
            train=train, collect_attn=collect_attn)
        if self.ctc_training:
            d_output, attn_dec, ctc_logits = dec_res
        else:
            d_output, attn_dec = dec_res
            ctc_logits = None

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

        post_output = None
        mask_frames = None
        if self.enable_post_model:
            post_output, mask_frames = self._run_post_model(
                mel_pre, mel_post, va_out, d_target, spk_emb_post,
                train=train)

        return FastSpeech2Output(
            mel_pre=mel_pre, mel_post=mel_post,
            log_duration=va_out.log_duration, pitch=va_out.pitch,
            energy=va_out.energy, mel_len=va_out.mel_len,
            mel_pos=va_out.mel_pos, mel_mask=va_out.mel_mask,
            variance_adaptor_output=va_out.x,
            text_dur_predicted=va_out.text_dur_predicted,
            attn_enc=attn_enc, attn_dec=attn_dec,
            post_output=post_output, mask_frames=mask_frames,
            sq_vae_loss=sq_vae_loss, sq_vae_perplexity=sq_vae_perplexity,
            ctc_logits=ctc_logits)

    # -- text-mel-mel integrate-training path -------------------------------
    def _run_post_model(self, mel_pre, mel_post, va_out, d_target,
                        spk_emb_post, *, train: bool):
        """Attach PostLowEnergyv2 (fastspeech2.py:202-239)."""
        cfg = dict(self.post_model_cfg or {})
        post_model = PostLowEnergyv2(
            in_dim=self.mel_dim, dtype=self.dtype, name="post_model", **cfg)

        input_meltomel = mel_post if self.postnet_pred else mel_pre
        phone_feature = va_out.x
        mask_frames = None
        if self.semantic_mask and train and d_target is not None:
            masked_mel, masked_phone, mask_frames = semantic_mask(
                input_meltomel,
                va_out.x if self.semantic_mask_phone else None,
                d_target, self.mask_probability,
                self.make_rng("dropout"))
            input_meltomel = masked_mel
            if masked_phone is not None:
                phone_feature = masked_phone

        if self.version in (8, 9):
            post_model_replace = PostLowEnergyv2(
                in_dim=self.mel_dim, dtype=self.dtype,
                name="post_model_replace_mask", **cfg)
            first_in = (mel_pre if self.version == 8 else input_meltomel)
            first_phone = (va_out.x if self.version == 8 else phone_feature)
            out_a, _, _ = post_model(
                first_in, va_out.mel_mask, first_phone, spk_emb_post,
                train=train)
            out_b, _, _ = post_model_replace(
                input_meltomel, va_out.mel_mask, phone_feature, spk_emb_post,
                train=train)
            return (out_a, out_b), mask_frames

        out, intermediate, _ = post_model(
            input_meltomel, va_out.mel_mask, phone_feature, spk_emb_post,
            train=train)
        if self.version == 10 and intermediate:
            return (out, intermediate[0]), mask_frames
        return out, mask_frames


def semantic_mask(mel, phone_feature, d_target, p, rng, eps=1e-4):
    """Vectorized phone-span masking (fastspeech2.py:243-260).

    Each interior phone (not first/last) is masked with probability ``p``;
    all frames in its duration span are filled with ``eps``. The reference
    iterates spans in Python; here: sample a per-phone Bernoulli, expand to
    frames via interval membership (frame t is masked iff its phone is).
    """
    b, n_frames = mel.shape[0], mel.shape[1]
    n_phones = d_target.shape[1]
    sample = jax.random.uniform(rng, (b, n_phones)) < p
    # never mask first/last phone (skip sos/eos, fastspeech2.py:250-251)
    keep = jnp.zeros((n_phones,), bool).at[0].set(True).at[-1].set(True)
    sample = sample & ~keep[None, :]

    ends = jnp.cumsum(d_target.astype(jnp.int32), axis=1)
    t = jnp.arange(n_frames, dtype=jnp.int32)
    phone_idx = jax.vmap(
        lambda e: jnp.searchsorted(e, t, side="right"))(ends)
    phone_idx = jnp.minimum(phone_idx, n_phones - 1)
    mask_frames = jnp.take_along_axis(sample, phone_idx, axis=1)
    mask_frames = mask_frames & (t[None, :] < ends[:, -1:])

    mel = jnp.where(mask_frames[:, :, None], eps, mel)
    if phone_feature is not None:
        phone_feature = jnp.where(mask_frames[:, :, None], eps,
                                  phone_feature)
    return mel, phone_feature, mask_frames[:, :, None]

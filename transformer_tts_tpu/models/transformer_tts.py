"""Autoregressive Transformer-TTS (encoder-decoder with stop token).

Reference: ``Models/transformer.py:15-118`` + drivers ``train.py`` /
``test.py``.

Training (teacher forcing, train.py:184-217):
  decoder input  = mel[:, :-r:r]  (go-frame + every r-th frame)
  prediction i   = mel frames [(i+1)*r, (i+2)*r)   (one group ahead)
  outputs reshape (B, t, mel*r) -> (B, t*r, mel) vs mel[:, r:]
  stop logits    (B, t, r)      -> (B, t*r)       vs stop[:, r:]

Synthesis: the reference re-forwards the ENTIRE prefix every step with no
KV cache (test.py:158-184 — O(T^2) per step, O(T^3) total). Here decoding
is an incremental ``decode_step`` with per-layer static-shape KV caches,
driven by ``infer/synthesize.py`` through ``lax.while_loop`` — the
north-star replacement called out in BASELINE.json.

Postnet: the reference constructs ``PostConvNet(prev_version=False)``
whose forward *returns its input* (Models/postnets.py:76-79) — the AR
postnet is accidentally a no-op, so train-time "post" loss duplicates the
pre loss and synthesis feeds back what is really the prenet output. We
wire a WORKING causal postnet (residual conv stack) and feed back the
prenet frames — identical feedback behavior to the reference, but with a
real postnet refinement on top. Set ``postnet_identity_compat=True`` for
bit-level reference parity.

NOTE on causality: the decoder conv-FFN is SAME-padded in the reference,
so the AR decoder is only strictly causal when
``ff_conv_kernel_size_decoder == 1`` (the published default,
utils/default.yaml:63). Incremental decoding asserts this.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax.numpy as jnp
import flax.linen as nn

from transformer_tts_tpu.models.decoder import Decoder
from transformer_tts_tpu.models.encoder import Encoder, ConformerEncoder
from transformer_tts_tpu.models.gst import StyleEmbedding
from transformer_tts_tpu.models.postnets import PostConvNet


class TransformerTTSOutput(NamedTuple):
    mel_pre: jnp.ndarray        # (B, t, mel*r)
    mel_post: jnp.ndarray       # (B, t, mel*r)
    stop_token: jnp.ndarray     # (B, t, r) logits
    attn_enc: Optional[jnp.ndarray]
    attn_dec_dec: Optional[jnp.ndarray]
    attn_dec_enc: Optional[jnp.ndarray]


class TransformerTTS(nn.Module):
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
    decoder_type: str = "transformer"   # transformer | tacotron2
    reduction_rate: int = 2
    dropout: float = 0.1
    dropout_prenet: float = 0.5
    dropout_postnet: float = 0.5
    gst: bool = False
    multi_speaker: bool = False
    spk_emb_dim: Optional[int] = None
    spk_emb_architecture: tuple = ()
    spk_emb_vers: int = 1        # transformer.py:44
    output_type: bool = False
    postnet_identity_compat: bool = False
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        enc_spk = (self.spk_emb_dim
                   if ("encoder" in self.spk_emb_architecture
                       and self.spk_emb_vers == 1) else None)
        common = dict(
            vocab_size=self.vocab_size, d_model=self.d_model_encoder,
            n_layers=self.n_layer_encoder, heads=self.n_head_encoder,
            ff_kernel_size=self.ff_conv_kernel_size_encoder,
            dropout=self.dropout, spk_emb_dim=enc_spk, embedding=True,
            dtype=self.dtype)
        if self.encoder_type.lower() == "conformer":
            self.encoder = ConformerEncoder(use_flash=self.use_flash,
                                            **common)
        else:
            self.encoder = Encoder(concat_after=self.concat_after_encoder,
                                   use_flash=self.use_flash, **common)
        if self.d_model_encoder != self.d_model_decoder:
            self.linear = nn.Dense(self.d_model_decoder, dtype=self.dtype)
        else:
            self.linear = None
        if self.gst:
            self.style_embedding = StyleEmbedding(
                self.mel_dim, self.d_model_decoder, dtype=self.dtype)
        if self.multi_speaker and self.spk_emb_vers == 2:
            self.spk_proj = nn.Dense(self.d_model_decoder, dtype=self.dtype)
        dec_spk = (self.spk_emb_dim
                   if ("decoder" in self.spk_emb_architecture
                       and self.spk_emb_vers == 1) else None)
        if self.decoder_type.lower() == "tacotron2":
            # hparams-selected decoder (Models/transformer.py:86-87);
            # frame/stop heads live inside the Tacotron2 decoder
            # (Models/decoder.py FrameProj/TokenProj), so no out/stop
            # Dense here — matches the reference's else-branch.
            from transformer_tts_tpu.models.tacotron2_decoder import (
                Tacotron2Decoder)
            self.decoder = Tacotron2Decoder(
                mel_dim=self.mel_dim, d_model=self.d_model_decoder,
                d_model_encoder=self.d_model_encoder,
                reduction_rate=self.reduction_rate,
                dropout_prenet=self.dropout_prenet, spk_emb_dim=dec_spk,
                dtype=self.dtype)
            self.out = None
            self.stop_token = None
        else:
            self.decoder = Decoder(
                mel_dim=self.mel_dim, d_model=self.d_model_decoder,
                n_layers=self.n_layer_decoder, heads=self.n_head_decoder,
                ff_kernel_size=self.ff_conv_kernel_size_decoder,
                concat_after=self.concat_after_decoder,
                dropout=self.dropout,
                dropout_prenet=self.dropout_prenet, spk_emb_dim=dec_spk,
                output_type=self.output_type, use_flash=self.use_flash,
                dtype=self.dtype)
            self.out = nn.Dense(self.mel_dim * self.reduction_rate,
                                dtype=self.dtype)
            self.stop_token = nn.Dense(self.reduction_rate,
                                       dtype=self.dtype)
        self.postnet = PostConvNet(
            num_hidden=self.d_model_decoder, mel_dim=self.mel_dim,
            reduction_rate=self.reduction_rate,
            dropout=self.dropout_postnet, prev_version=False,
            identity_compat=self.postnet_identity_compat, dtype=self.dtype)

    # -- pieces (also exposed for incremental decode) -----------------------
    def encode(self, src, src_mask, spk_emb=None, style_mel=None, *,
               train: bool = True, collect_attn: bool = False):
        e_outputs, attn_enc = self.encoder(
            src, src_mask, spk_emb, None, train=train,
            collect_attn=collect_attn)
        if self.linear is not None:
            e_outputs = self.linear(e_outputs)
        if self.gst:
            if style_mel is None:
                raise ValueError("gst=True requires a style/reference mel")
            e_outputs = e_outputs + self.style_embedding(
                style_mel, train=train)
        if self.multi_speaker and self.spk_emb_vers == 2:
            norm = spk_emb / jnp.linalg.norm(
                spk_emb, axis=-1, keepdims=True).clip(1e-12)
            e_outputs = e_outputs + self.spk_proj(norm)[:, None, :]
        return e_outputs, attn_enc

    def precompute_cross_kv(self, e_outputs):
        """Per-decoder-layer cross-attention K/V (constant across steps)."""
        return self.decoder.precompute_cross_kv(e_outputs)

    def decode_step(self, prev_frame, e_outputs, src_mask, caches,
                    cache_index, spk_emb=None, cross_kvs=None):
        """One AR step: (B, 1, mel) prev frame -> frame group + stop.

        ``caches``: per-layer (k, v) of shape (B, H, max_steps, d_k).
        ``cross_kvs``: from ``precompute_cross_kv`` — hoists the dominant
        per-step cost (cross K/V projections) out of the loop.
        Returns (mel_group (B, 1, mel*r), stop (B, 1, r), new_caches).
        """
        max_steps = caches[0][0].shape[2]
        # query attends cache rows <= cache_index
        cols = jnp.arange(max_steps)[None, None, :]
        trg_mask = cols <= cache_index
        trg_mask = jnp.broadcast_to(trg_mask, (prev_frame.shape[0], 1,
                                               max_steps))
        d, _, _, new_caches = self.decoder(
            prev_frame, e_outputs, src_mask, trg_mask, spk_emb,
            train=False, caches=caches, cache_index=cache_index,
            pos_offset=cache_index, cross_kvs=cross_kvs)
        return self.out(d), self.stop_token(d), new_caches

    def apply_postnet(self, mel_pre, *, train: bool = False):
        return self.postnet(mel_pre, train=train)

    # -- training forward ---------------------------------------------------
    def __call__(self, src, trg, src_mask, trg_mask, spk_emb=None,
                 ref_mel=None, *, train: bool = True,
                 collect_attn: bool = False) -> TransformerTTSOutput:
        """Teacher-forced forward (transformer.py:90-118).

        ``trg``: (B, t, mel) reduced decoder input (go-frame + stride-r).
        GST style source: the training target mel at train, a reference
        mel at eval (transformer.py:96-101).
        """
        style_mel = trg if (self.gst and train and ref_mel is None) \
            else ref_mel
        e_outputs, attn_enc = self.encode(
            src, src_mask, spk_emb, style_mel, train=train,
            collect_attn=collect_attn)
        if self.decoder_type.lower() == "tacotron2":
            # transformer.py:113-116 else-branch: decoder emits frames +
            # stop itself; no dec-dec self attention. ``trg`` here is the
            # FULL-RATE teacher mel (B, T, mel), T a multiple of r — the
            # zoneout-LSTM is teacher-forced on the last frame of each
            # group (decoder.py:195).
            frames, stops, attention = self.decoder(
                trg, e_outputs, spk_emb, train=train)
            b, t_full, _ = frames.shape
            t = t_full // self.reduction_rate
            # grouped layout (B, t, mel*r): identical output contract to
            # the transformer branch, so one trainer serves both
            mel_pre = frames.reshape(b, t, self.mel_dim
                                     * self.reduction_rate)
            stop = stops.reshape(b, t, self.reduction_rate)
            mel_post = self.postnet(mel_pre, train=train)
            return TransformerTTSOutput(
                mel_pre=mel_pre, mel_post=mel_post, stop_token=stop,
                attn_enc=attn_enc, attn_dec_dec=None,
                attn_dec_enc=attention)
        d_output, attn_dd, attn_de = self.decoder(
            trg, e_outputs, src_mask, trg_mask, spk_emb, train=train,
            collect_attn=collect_attn)
        mel_pre = self.out(d_output)
        stop = self.stop_token(d_output)
        mel_post = self.postnet(mel_pre, train=train)
        return TransformerTTSOutput(
            mel_pre=mel_pre, mel_post=mel_post, stop_token=stop,
            attn_enc=attn_enc, attn_dec_dec=attn_dd, attn_dec_enc=attn_de)

    # -- tacotron2 synthesis --------------------------------------------------
    def tacotron2_synthesize(self, src, src_mask, text_lengths=None,
                             spk_emb=None, ref_mel=None,
                             max_steps: int = 500):
        """Greedy AR synthesis through the Tacotron2 decoder
        (Models/decoder.py:209-332) + causal postnet.

        Returns (mel (B, max_steps*r, mel) post-postnet fp32,
        lengths (B,) frames).
        """
        if self.decoder_type.lower() != "tacotron2":
            raise ValueError("tacotron2_synthesize requires "
                             "decoder_type='tacotron2'")
        e_outputs, _ = self.encode(src, src_mask, spk_emb, ref_mel,
                                   train=False)
        frames, lengths = self.decoder.synthesize(
            e_outputs, text_lengths=text_lengths, spk_emb=spk_emb,
            max_steps=max_steps)
        b, t_full, _ = frames.shape
        grouped = frames.reshape(b, t_full // self.reduction_rate,
                                 self.mel_dim * self.reduction_rate)
        post = self.postnet(grouped.astype(self.dtype), train=False)
        mel = post.astype(jnp.float32).reshape(b, t_full, self.mel_dim)
        return mel, lengths


def build_transformer_tts(hp, *, train_dtype=None) -> TransformerTTS:
    """Instantiate from the hparams contract."""
    dtype = train_dtype if train_dtype is not None else (
        jnp.bfloat16 if hp.amp else jnp.float32)
    spk_arch = tuple(
        s for s in ("encoder", "middle", "decoder")
        if s in (hp.spk_emb_architecture or ""))
    return TransformerTTS(
        vocab_size=hp.vocab_size, mel_dim=hp.mel_dim,
        d_model_encoder=hp.d_model_encoder,
        n_layer_encoder=hp.n_layer_encoder,
        n_head_encoder=hp.n_head_encoder,
        ff_conv_kernel_size_encoder=hp.ff_conv_kernel_size_encoder,
        concat_after_encoder=hp.concat_after_encoder,
        d_model_decoder=hp.d_model_decoder,
        n_layer_decoder=hp.n_layer_decoder,
        n_head_decoder=hp.n_head_decoder,
        ff_conv_kernel_size_decoder=hp.ff_conv_kernel_size_decoder,
        concat_after_decoder=hp.concat_after_decoder,
        encoder_type=hp.encoder_type, decoder_type=hp.decoder_type,
        reduction_rate=hp.reduction_rate,
        dropout=hp.dropout, dropout_prenet=hp.dropout_prenet,
        dropout_postnet=hp.dropout_postnet, gst=hp.gst,
        multi_speaker=hp.is_multi_speaker, spk_emb_dim=hp.spk_emb_dim,
        spk_emb_architecture=spk_arch, spk_emb_vers=hp.spk_emb_vers,
        output_type=bool(hp.output_type),
        use_flash=hp.use_flash_attention, dtype=dtype)

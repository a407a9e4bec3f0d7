"""Post-networks: causal conv postnet, mel-to-mel models, EMA VQ.

* ``PostConvNet`` (Models/postnets.py:13-79): optional Dense(d -> mel*r)
  producing the "prenet" mel, then 5 CAUSAL Conv1d(k=5) with BatchNorm +
  tanh + dropout and a residual add. The reference pads 4 on both sides and
  trims the right 4 (postnets.py:71-74) — identical to an explicit (4, 0)
  left pad, which is how we express it.

  KNOWN REFERENCE BUG (not replicated): with ``prev_version=False`` the
  reference returns ``mel_pred`` — its own *input* — so the AR
  Transformer's postnet is a no-op at train and synthesis
  (postnets.py:76-79 vs transformer.py:111). We return the residual-
  corrected output; set ``identity_compat=True`` to reproduce the
  reference's exact (buggy) behavior for parity testing.

* ``PostLowEnergyv1/v2`` (postnets.py:82-217): mel-to-mel refinement
  models reusing the Encoder stack, with phone-feature fusion, speaker
  conditioning and optional EMA-VQ code conditioning.

* ``Quantize`` (postnets.py:219-263): VQ-VAE codebook with EMA cluster
  statistics and a straight-through estimator. EMA buffers live in the
  flax ``vq_stats`` variable collection (mutable during training).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from transformer_tts_tpu.models.encoder import Encoder, ConformerEncoder


class PostConvNet(nn.Module):
    num_hidden: int
    mel_dim: int
    reduction_rate: int = 1
    dropout: float = 0.5
    prev_version: bool = True
    identity_compat: bool = False   # replicate postnets.py:76-79 bug
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        out_dim = self.mel_dim * self.reduction_rate
        drop = nn.Dropout(self.dropout, deterministic=not train)
        causal = ((4, 0),)  # left-pad 4 == pad 4 + trim right 4

        if self.prev_version:
            mel_pred = nn.Dense(out_dim, dtype=self.dtype, name="out")(x)
        else:
            mel_pred = x

        h = nn.Conv(self.num_hidden, (5,), padding=causal, dtype=self.dtype,
                    name="conv1")(mel_pred)
        h = drop(jnp.tanh(nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype,
            name="pre_batchnorm")(h)))
        for i in range(3):
            h = nn.Conv(self.num_hidden, (5,), padding=causal,
                        dtype=self.dtype, name=f"conv_list_{i}")(h)
            h = drop(jnp.tanh(nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype,
                name=f"batch_norm_list_{i}")(h)))
        h = nn.Conv(out_dim, (5,), padding=causal, dtype=self.dtype,
                    name="conv2")(h)
        post = mel_pred + h

        if self.prev_version:
            return mel_pred, post
        if self.identity_compat:
            return mel_pred
        return post


class Quantize(nn.Module):
    """EMA VQ-VAE codebook (Models/postnets.py:219-263)."""
    embed_dim: int
    n_embed: int
    decay: float = 0.99
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, *, mean: bool = False, train: bool = True):
        if mean:
            x = x.mean(axis=1)   # (B, T, D) layout: average over time
        flatten = x.reshape(-1, self.embed_dim)

        embed = self.variable(
            "vq_stats", "embed",
            lambda: jax.random.normal(
                self.make_rng("params") if self.has_rng("params")
                else jax.random.PRNGKey(0),
                (self.embed_dim, self.n_embed)))
        cluster_size = self.variable(
            "vq_stats", "cluster_size",
            lambda: jnp.zeros((self.n_embed,), jnp.float32))
        embed_avg = self.variable(
            "vq_stats", "embed_avg", lambda: embed.value)

        dist = (
            (flatten ** 2).sum(-1, keepdims=True)
            - 2.0 * flatten @ embed.value
            + (embed.value ** 2).sum(0, keepdims=True))
        embed_ind = jnp.argmin(dist, axis=1)
        embed_onehot = jax.nn.one_hot(embed_ind, self.n_embed,
                                      dtype=flatten.dtype)
        quantize = embed.value.T[embed_ind].reshape(x.shape)

        if train and not self.is_initializing():
            onehot_sum = embed_onehot.sum(0)
            embed_sum = flatten.T @ embed_onehot
            cluster_size.value = (self.decay * cluster_size.value
                                  + (1 - self.decay) * onehot_sum)
            embed_avg.value = (self.decay * embed_avg.value
                               + (1 - self.decay) * embed_sum)
            n = cluster_size.value.sum()
            cs = ((cluster_size.value + self.eps)
                  / (n + self.n_embed * self.eps) * n)
            embed.value = embed_avg.value / cs[None, :]

        diff = jnp.mean((jax.lax.stop_gradient(quantize) - x) ** 2)
        quantize = x + jax.lax.stop_gradient(quantize - x)
        return quantize, diff, embed_ind


class PostLowEnergyv1(nn.Module):
    """Mel->mel refinement: Encoder stack + output Dense (postnets.py:82-96)."""
    in_dim: int
    out_size: int
    d_model: int
    n_layers: int
    heads: int
    ff_kernel_size: int
    concat_after: bool = False
    dropout: float = 0.1
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, src_mask, spk_emb=None, *, train: bool = True):
        enc = Encoder(
            vocab_size=self.in_dim, d_model=self.d_model,
            n_layers=self.n_layers, heads=self.heads,
            ff_kernel_size=self.ff_kernel_size,
            concat_after=self.concat_after, dropout=self.dropout,
            use_flash=self.use_flash,
            embedding=False, dtype=self.dtype, name="encoder")
        e_outputs, _ = enc(src, src_mask, spk_emb, train=train)
        return nn.Dense(self.out_size, dtype=self.dtype, name="out")(e_outputs)


class PostLowEnergyv2(nn.Module):
    """Mel->mel with phone-feature fusion & conditioning (postnets.py:98-217)."""
    in_dim: int              # mel_dim of the input mel
    out_size: int
    d_model: int
    n_layers: int
    heads: int
    ff_kernel_size: int
    concat_after: bool = False
    dropout: float = 0.1
    phone_embed: bool = False
    concat: bool = False
    spk_emb_postprocess_type: Optional[str] = None   # speaker_id | x_vector
    spk_emb_dim: Optional[int] = None
    num_speakers: Optional[int] = None
    vq_code: bool = False
    post_conformer: bool = False
    intermediate_layers_out: Optional[tuple] = None
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, src_mask, variance_adaptor_output, spk_emb=None,
                 *, train: bool = True):
        if self.concat:
            pieces = [src, variance_adaptor_output]
            if self.spk_emb_postprocess_type is not None:
                rep = jnp.broadcast_to(
                    spk_emb[:, None, :],
                    (src.shape[0], src.shape[1], spk_emb.shape[-1]))
                pieces.append(rep)
            input_ = jnp.concatenate(pieces, axis=-1)
            enc_in_dim = input_.shape[-1]
        else:
            input_ = nn.Dense(self.d_model, dtype=self.dtype,
                              name="linear1")(src)
            if self.phone_embed:
                input_ = input_ + nn.Dense(
                    self.d_model, dtype=self.dtype,
                    name="linear2")(variance_adaptor_output)
            if self.spk_emb_postprocess_type == "speaker_id":
                input_ = input_ + nn.Embed(
                    self.num_speakers, self.d_model, dtype=self.dtype,
                    name="linear_xvector")(spk_emb)[:, None, :]
            elif self.spk_emb_postprocess_type == "x_vector":
                input_ = input_ + nn.Dense(
                    self.d_model, dtype=self.dtype,
                    name="linear_xvector")(spk_emb)[:, None, :]
            enc_in_dim = self.d_model

        diff = None
        if self.vq_code:
            vq_in = nn.Conv(enc_in_dim, (1,), dtype=self.dtype,
                            name="vq_encoder_lmfb")(src)
            quant, diff, _ = Quantize(enc_in_dim, 20, name="quantize_lmfb")(
                vq_in, mean=True, train=train)
            input_ = input_ + quant[:, None, :]

        enc_cls = ConformerEncoder if self.post_conformer else Encoder
        kwargs = dict(
            vocab_size=enc_in_dim, d_model=self.d_model,
            n_layers=self.n_layers, heads=self.heads,
            ff_kernel_size=self.ff_kernel_size, dropout=self.dropout,
            use_flash=self.use_flash,
            embedding=False, dtype=self.dtype, name="encoder")
        if not self.post_conformer:
            kwargs["concat_after"] = self.concat_after
            kwargs["intermediate_layers_out"] = self.intermediate_layers_out
        enc_out = enc_cls(**kwargs)(input_, src_mask, None, train=train)
        if self.intermediate_layers_out and not self.post_conformer:
            e_outputs, _, intermediate_outs = enc_out
        else:
            e_outputs, _ = enc_out
            intermediate_outs = None

        outputs = nn.Dense(self.out_size, dtype=self.dtype, name="out")(
            e_outputs)
        return outputs, intermediate_outs, diff

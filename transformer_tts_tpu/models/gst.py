"""Global Style Tokens (GST).

Reference: ``Models/gst.py``.

* ``ReferenceEncoder`` (gst.py:23-52): six 3x3 stride-2 Conv2d (no bias) +
  BatchNorm + ReLU over the (T, mel) "image", then a GRU whose LAST hidden
  state is the 128-d reference embedding. On TPU the GRU runs as a
  ``flax.linen.RNN`` (lax.scan); the conv stack is plain NHWC conv.
  REFERENCE QUIRK replicated: gst.py:50 reshapes the conv output
  ``(B, C, T, H) -> (B, T, H*C)`` WITHOUT permuting, interleaving
  channels and time steps in the GRU input (the idiomatic version would
  be ``permute(0,2,3,1)`` first). We reproduce the exact memory-order
  semantics so reference-trained GST checkpoints migrate bit-true
  (compat/torch_import.convert_style_embedding).
* ``StyleTokenLayer`` (gst.py:54-73): 10 learnable 384-d tokens,
  tanh-squashed, attended by a 4-head MHA with a 128-d query.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from transformer_tts_tpu.ops.attention import MultiHeadAttention

_CNN_DIMS = (32, 32, 64, 64, 128, 128)   # gst.py:30


class ReferenceEncoder(nn.Module):
    mel_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel, *, train: bool = True):
        # mel: (B, T, mel) -> NHWC (B, T, mel, 1)
        x = mel[..., None]
        for i, ch in enumerate(_CNN_DIMS):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=self.dtype,
                        name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype, name=f"norm_{i}")(x)
            x = nn.relu(x)
        b, t, h, c = x.shape
        # reference-exact GRU input: NCHW memory order reshaped
        # (B, C, T, H) -> (B, T, H*C) with NO permute (gst.py:49-50) —
        # see the module docstring
        x = x.transpose(0, 3, 1, 2).reshape(b, t, h * c)
        # GRU; take last hidden state (gst.py:50-51)
        rnn = nn.RNN(nn.GRUCell(128, dtype=self.dtype, name="gru_cell"),
                     name="gru")
        out = rnn(x)
        return out[:, -1, :]


class StyleTokenLayer(nn.Module):
    d_model: int = 384
    n_tokens: int = 10
    heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ref_embedding, *, train: bool = True):
        tokens = self.param(
            "embeddings", nn.initializers.xavier_uniform(),
            (self.n_tokens, self.d_model))
        b = ref_embedding.shape[0]
        emb = jnp.tanh(tokens)[None].repeat(b, axis=0)
        x, attn = MultiHeadAttention(
            heads=self.heads, d_model=self.d_model, dropout=0.1,
            dtype=self.dtype, name="attention",
        )(ref_embedding[:, None, :], emb, emb, None, train=train,
          collect_attn=True)
        return x, attn


class StyleEmbedding(nn.Module):
    """(B, T, mel) reference mel -> (B, 1, d_model) style vector."""
    mel_dim: int
    d_model: int = 384
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel, mel_mask=None, *, train: bool = True):
        ref = ReferenceEncoder(self.mel_dim, dtype=self.dtype,
                               name="reference_encoder")(mel, train=train)
        style, _ = StyleTokenLayer(self.d_model, dtype=self.dtype,
                                   name="style_token_layer")(
            ref, train=train)
        return style
